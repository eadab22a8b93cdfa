"""Fused Pallas TPU pair kernels for the blocked backend.

Two kernels per physics step (SURVEY.md §3.3's three gather-reduce CUDA kernels,
restructured):

* ``moments``: per-tile A_pq and Y moment matrices.  SPH coefficients (w, gfac)
  are recomputed from STATIC rest geometry in VMEM; dynamic positions enter only
  as the RHS of MXU matmuls in their natural (slab, 3) layout — no gathers, no
  transposes, no atomics inside the kernel.
* ``forces``: pair force contraction against the G = V R F S slab (Taichi
  separable mode) or R/S slabs + local F (Warp mode, sim.py:233).

Performance structure (measured on v5e): per-tile grid overhead and the pair
coefficient computation are negligible; what matters is issuing FEW LARGE MXU
dots.  Each kernel therefore concatenates its per-component pair tensors along
the sublane axis and performs ONE dot per stage:

  moments:        [C0;C1;C2;D0;D1;D2] (6 rows, slab) @ pos_slab (slab, 3)
  forces (sep.):  [NW0;NW1;NW2]       (3 rows, slab) @ G_slab   (slab, 9)
  forces (warp):  [u'0;u'1;u'2]       (3 rows, slab) @ R_slab   (slab, 9)

The warp kernels chunk the slab (``_WARP_CHUNKS``) to bound live VMEM.

All kernels are linear (moments/separable-forces) or bilinear (warp-forces) in
their dynamic inputs, with custom VJPs implemented as Pallas kernels of the
same shape (row-axis contractions); the slab gather/scatter around them stays
in XLA and differentiates automatically.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_WARP_CHUNKS = 3
# tiles per kernel invocation.  MEASURED at 100k on v5e (sparse layout, merged
# static slab): rows=32 TB=1 1.36e7, TB=2 1.475e7, TB=4 1.40e7 particle-
# steps/s; rows=64 and rows=16 lose at any TB (tools/sweep_staging.sh).
# Batching 2 tiles halves the per-tile staging stalls without blowing VMEM.
# (The varcol-era measurement where batching hurt predates the lane-major
# fused operands.)
import os as _os

_TILE_BATCH = int(_os.environ.get("SOFTBODY_TILE_BATCH", "2"))
# K1 forward staging: "1" -> manual double-buffered DMA of the 2D-flattened
# slab operands; "0" -> BlockSpec.  Interpret mode always uses BlockSpec.
# MEASURED (round 3, full-step bench at 100k): the isolated-probe win of the
# manual path (-21%/tile, tools/stage_probe.py) INVERTS at step level — its
# memory_space=ANY static2 operand makes XLA's memory-space assignment stream
# the whole duplicated (t*5, slab) array into VMEM every scan iteration
# (48 MB/step of S(1) slice-copies in the trace).  BlockSpec: 1.575e7 vs
# manual 1.388e7 particle-steps/s.  Default OFF.
_K1_MANUAL = _os.environ.get("SOFTBODY_K1_MANUAL", "0") == "1"
_TBM = 8  # tiles per manual-DMA grid step (TBM * K % 8 == 0 for K in {3, 5})


class _Sub:
    """Ref adapter presenting batched block element i as leading index 0, so the
    single-tile kernel bodies run unchanged inside a batched invocation."""

    def __init__(self, ref, i):
        self._ref = ref
        self._i = i

    @property
    def shape(self):
        return (1,) + self._ref.shape[1:]

    def _tr(self, idx):
        if isinstance(idx, tuple):
            assert idx[0] == 0
            return (self._i,) + idx[1:]
        assert idx == 0
        return self._i

    def __getitem__(self, idx):
        return self._ref[self._tr(idx)]

    def __setitem__(self, idx, val):
        self._ref[self._tr(idx)] = val


class _SubFlat:
    """Present rows [bi*K, (bi+1)*K) of a 2D (TBM*K, slab) VMEM buffer as a
    (1, K, slab)-leading ref, so the single-tile kernel bodies (which index
    ``ref[0, r, c]`` / ``ref[0, r0:r1, c0:c1]``) run unchanged over a
    manually-DMA'd flattened slab block."""

    def __init__(self, ref, bi, K):
        self._ref = ref
        self._o = bi * K
        self._K = K

    @property
    def shape(self):
        return (1, self._K) + tuple(self._ref.shape[1:])

    def _tr_row(self, r):
        if isinstance(r, slice):
            r0 = 0 if r.start is None else r.start
            r1 = self._K if r.stop is None else r.stop
            return slice(self._o + r0, self._o + r1)
        return self._o + r

    def __getitem__(self, idx):
        if isinstance(idx, tuple):
            assert idx[0] == 0
            return self._ref[(self._tr_row(idx[1]),) + tuple(idx[2:])]
        assert idx == 0
        return self._ref[self._tr_row(slice(None))]


def _batched(body, n_refs):
    """Wrap a single-tile kernel body to loop over a _TILE_BATCH block."""

    def kernel(*refs, **kw):
        for i in range(_TILE_BATCH):
            body(*[_Sub(r, i) for r in refs], **kw)

    return kernel


def _pad_tiles(arrs, t):
    """Zero-pad per-tile arrays so t is a _TILE_BATCH multiple (zero rest
    coordinates make every pair coefficient vanish -> inert tiles)."""
    pad = (-t) % _TILE_BATCH
    if pad == 0:
        return arrs, t
    out = []
    for a in arrs:
        padding = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        out.append(jnp.pad(a, padding))
    return out, t + pad


def _interpret_default():
    return jax.default_backend() != "tpu"


def _pair_coeffs(restT_rows, restT_slab, h):
    """Per-pair dx components, kernel value w and gradient factor gfac.

    restT_rows: (3, rows); restT_slab: (3, S) ->
    dx: 3 x (rows, S); w, gfac: (rows, S).  Self-pairs (r == 0) -> 0.
    grad_W(x_ij) = gfac * dx with x_ij = X_i - X_j = dx.
    """
    dx = [restT_rows[b][:, None] - restT_slab[b][None, :] for b in range(3)]
    r2 = dx[0] * dx[0] + dx[1] * dx[1] + dx[2] * dx[2]
    dtype = r2.dtype
    h = jnp.asarray(h, dtype)
    inv_h = 1.0 / h
    c4 = 0.25 / (jnp.pi * h**3)
    # branchless cubic-spline identity:  W = c/4 [ (2-q)+^3 - 4 (1-q)+^3 ]
    # and  grad_W = gfac dx with gfac = c/(4 h) [ 12 (1-q)+^2 - 3 (2-q)+^2 ] / r.
    # sqrt/div/select-free: q = r2 * rsqrt(r2 + tiny) / h, and the gradient
    # polynomial is EXACTLY zero at q = 0 (12*1 - 3*4), so the self-pair needs
    # no mask - the tiny keeps rsqrt finite there (tiny/r2 ~ 1e-24 otherwise).
    rs = jax.lax.rsqrt(r2 + 1e-30)
    q = r2 * rs * inv_h
    tq = jnp.maximum(2.0 - q, 0.0)
    oq = jnp.maximum(1.0 - q, 0.0)
    tq2 = tq * tq
    oq2 = oq * oq
    w = c4 * (tq2 * tq - 4.0 * oq2 * oq)
    gfac = (c4 * inv_h) * (12.0 * oq2 - 3.0 * tq2) * rs
    return dx, w, gfac


def _pair_coeffs_g(restT_rows, restT_slab, h):
    """Like :func:`_pair_coeffs` but gradient factor only (no W) — the force
    kernels never use W, and dropping it saves ~6 VPU ops per pair."""
    dx = [restT_rows[b][:, None] - restT_slab[b][None, :] for b in range(3)]
    r2 = dx[0] * dx[0] + dx[1] * dx[1] + dx[2] * dx[2]
    dtype = r2.dtype
    h = jnp.asarray(h, dtype)
    inv_h = 1.0 / h
    c4 = 0.25 / (jnp.pi * h**3)
    # see _pair_coeffs: rsqrt form, no sqrt/div/select (poly zero at q = 0)
    rs = jax.lax.rsqrt(r2 + 1e-30)
    q = r2 * rs * inv_h
    tq = jnp.maximum(2.0 - q, 0.0)
    oq = jnp.maximum(1.0 - q, 0.0)
    gfac = (c4 * inv_h) * (12.0 * oq * oq - 3.0 * tq * tq) * rs
    return dx, gfac


# In-kernel matmul precision.  The TPU MXU computes f32 dot_generals at
# Precision.DEFAULT as a SINGLE bf16 pass (~0.4% relative error).  Measured
# consequence (tools/probe_stability.py, round 4): the moment dots contract
# ABSOLUTE positions (~35x the centered pair magnitude), so bf16 dot noise
# put ~10% relative error on A_pq; through the 100x inflation stiffness scale
# that made a QUIESCENT 20k body blow up to ~40 m/s rattle within 3000 steps
# and turned the inverse-design landscape into +-1% noise (the round-3 L-BFGS
# stall).  HIGHEST (true f32, 6 bf16 passes) measured 50x lower quiet-state
# noise growth; the pair kernels are VPU/staging-bound so the extra MXU
# passes are cheap (see PERF_NOTES round-4).
def _prec(name: str, default: str):
    val = _os.environ.get(name, _os.environ.get("SOFTBODY_DOT_PRECISION",
                                                default))
    if val == "bf16x3":
        return "bf16x3"
    return {
        "default": jax.lax.Precision.DEFAULT,
        "high": jax.lax.Precision.HIGH,
        "highest": jax.lax.Precision.HIGHEST,
    }[val]


def _split_bf16(a):
    """f32 -> (hi, lo) bf16 pair with hi + lo ~= a (lo = rounding residual)."""
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(a.dtype)).astype(jnp.bfloat16)
    return hi, lo


def _dot3(a, b, dims):
    """Manual 3-pass bf16 emulation of an f32 dot (~2^-22 relative error):
    a@b ~= a_hi@b_hi + a_lo@b_hi + a_hi@b_lo (the lo@lo term is below f32
    ulp).  Mosaic implements only DEFAULT (1 bf16 pass, ~4e-3) and HIGHEST
    (true f32, 6 passes); this is the missing middle tier — half the MXU
    passes of HIGHEST at ~10x the error, still far inside the stability
    envelope measured for the centered kernels."""
    a_hi, a_lo = _split_bf16(a)
    b_hi, b_lo = _split_bf16(b)
    d = lambda x, y: jax.lax.dot_general(
        x, y, dims, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)
    return d(a_hi, b_hi) + d(a_lo, b_hi) + d(a_hi, b_lo)


# K1 (moments) contracts ABSOLUTE positions whose magnitude is ~35x the
# centered pair scale, so dot rounding is amplified 35x relative to the
# result; K2 (forces) contracts O(pair-scale) factors.  HIGHEST = true f32
# (6 bf16 MXU passes), HIGH = 3 passes (~5e-7 relative), DEFAULT = 1 bf16
# pass (~4e-3 relative — measured to destabilize the episode, see module
# note above _DOT_PREC_K1).
_DOT_PREC_K1 = _prec("SOFTBODY_DOT_PRECISION_K1", "highest")
_DOT_PREC_K2 = _prec("SOFTBODY_DOT_PRECISION_K2", "highest")


def _dot(a, b, precision=None):
    """(m, S) @ (S, n)."""
    precision = precision or _DOT_PREC_K1
    dims = (((1,), (0,)), ((), ()))
    if precision == "bf16x3":
        if a.dtype == jnp.float32:
            return _dot3(a, b, dims)
        precision = jax.lax.Precision.HIGHEST  # non-f32: exact path
    return jax.lax.dot_general(
        a, b, dims, preferred_element_type=a.dtype, precision=precision,
    )


def _dot_t(a, bT, precision=None):
    """(m, S) @ (n, S)^T -> (m, n): transposed-RHS matmul (contract lanes of
    both).  Mosaic lowers this natively — it lets slab operands stay
    lane-major (minor dim = slab), avoiding the 8-16x HBM retiling that
    (slab, n<128)-shaped pallas operands pay."""
    precision = precision or _DOT_PREC_K1
    dims = (((1,), (1,)), ((), ()))
    if precision == "bf16x3":
        if a.dtype == jnp.float32:
            return _dot3(a, bT, dims)
        precision = jax.lax.Precision.HIGHEST  # non-f32: exact path
    return jax.lax.dot_general(
        a, bT, dims, preferred_element_type=a.dtype, precision=precision,
    )


def _dot_rows(a, b, precision=None):
    """Contract the ROWS axis: (rows, S) x (rows, F) -> (S, F)."""
    precision = precision or _DOT_PREC_K1
    dims = (((0,), (0,)), ((), ()))
    if precision == "bf16x3":
        if a.dtype == jnp.float32:
            return _dot3(a, b, dims)
        precision = jax.lax.Precision.HIGHEST  # non-f32: exact path
    return jax.lax.dot_general(
        a, b, dims, preferred_element_type=a.dtype, precision=precision,
    )


def _tile_specs(shapes):
    """BlockSpec per operand: block = _TILE_BATCH tiles along axis 0."""
    return [
        pl.BlockSpec((_TILE_BATCH,) + s, lambda t: (t,) + (0,) * len(s),
                     memory_space=pltpu.VMEM)
        for s in shapes
    ]


def _cols(mat9, b):
    """(rows, 9) -> (rows, 3): columns [3a+b for a in 0..2]."""
    return jnp.stack([mat9[:, 3 * a + b] for a in range(3)], axis=1)


# ============================================================ moments (K1)
# Static slab layout: ALL per-slab static operands travel as ONE (5, slab)
# block — rows 0:3 restT, row 3 mass, row 4 volume.  Three separate blocks
# ((3, slab) + (1, slab) + (1, slab)) each pad their sublane dim to 8 in VMEM
# and issue their own per-tile DMA; the merged block is one contiguous
# 5*slab-float HBM read per tile (pads to 8 sublanes ONCE).
def _moments_kernel(restT_rows_ref, static_slab_ref, pos_slabT_ref, ay_ref, *, h):
    """RAW moment dots, fused output ay (rows, 18) = [A-part 9 | Y-part 9] in
    the transposed [3b+a] trailing layout.

    The -pos_i * rowsum correction term uses STATIC (rest-only) row sums, so
    it lives in XLA (see moments_packed): the kernel needs no pos_rows operand
    — every (rows, k<128) pallas operand is retiled by XLA with the minor dim
    padded to 128 lanes (14-42x HBM bloat, staged per scan iteration).
    """
    rr = restT_rows_ref[0]          # (3, rows)
    st = static_slab_ref[0]         # (5, slab): [restT_3 | mass | vol]
    rs = st[0:3]
    dx, w, gfac = _pair_coeffs(rr, rs, h)
    cA = w * st[3:4]                # (rows, slab)
    gv = gfac * st[4:5]
    pos_slabT = pos_slabT_ref[0]    # (pw, slab) LANE-MAJOR dynamic positions
    rows = rr.shape[1]

    # one big LHS: [C0; C1; C2; D0; D1; D2] (6 rows, slab)
    lhs = jnp.concatenate(
        [cA * (-dx[b]) for b in range(3)] + [gv * dx[b] for b in range(3)], axis=0
    )
    dots = _dot_t(lhs, pos_slabT)                    # (6 rows, pw)
    ay_ref[0] = jnp.concatenate(
        [dots[b * rows:(b + 1) * rows, :3] for b in range(6)], axis=1,
    )


def _moments_bwd_kernel(restT_rows_ref, static_slab_ref, day_ref, dpsT_ref, *, h):
    rr = restT_rows_ref[0]
    st = static_slab_ref[0]
    rs = st[0:3]
    dx, w, gfac = _pair_coeffs(rr, rs, h)
    cA = w * st[3:4]
    gv = gfac * st[4:5]
    day = day_ref[0]                # (rows, 18), fused [dA | dY], cols 3b+a
    rows = rr.shape[1]
    lhs = jnp.concatenate(
        [cA * (-dx[b]) for b in range(3)] + [gv * dx[b] for b in range(3)], axis=0
    )
    # cotangent blocks re-laid out per column (concatenating strided slices
    # directly leaves lane offsets Mosaic's concat rejects on real TPU)
    cts = jnp.concatenate(
        [jnp.stack([day[:, 3 * blk + a] for a in range(3)], axis=1)
         for blk in range(6)], axis=0
    )                                                # (6 rows, 3)
    # d pos_slabT = ct^T @ LHS summed over the 6 stacked blocks (lane-major
    # (3, slab) output: a (slab, 3) pallas output would be retiled 42x)
    dpsT_ref[0] = _dot_rows(cts, lhs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def moments_pallas(restT_rows, static_slab, pos_slabT, h, interpret=None):
    """Raw moment dots ay: (t, rows, 18) = [A | Y], columns 3*b + a (transposed
    trailing layout).  static_slab: (t, 5, slab) = [restT_3 | mass | vol].
    Callers subtract the static-rowsum correction in XLA and relabel with
    mat3.transpose3."""
    return _moments_fwd_impl(restT_rows, static_slab, pos_slabT, h, interpret)


def _moments_fwd_impl(restT_rows, static_slab, pos_slabT, h, interpret):
    """pos_slabT: (t, pw, slab) lane-major dynamic positions."""
    t, _, rows = restT_rows.shape
    slab = static_slab.shape[2]
    pw = pos_slabT.shape[1]
    interpret = _interpret_default() if interpret is None else interpret
    kernel = _batched(functools.partial(_moments_kernel, h=h), 4)
    args, t_pad = _pad_tiles([restT_rows, static_slab, pos_slabT], t)
    out = pl.pallas_call(
        kernel,
        grid=(t_pad // _TILE_BATCH,),
        in_specs=_tile_specs([
            (3, rows), (5, slab), (pw, slab),
        ]),
        out_specs=_tile_specs([(rows, 18)])[0],
        out_shape=jax.ShapeDtypeStruct((t_pad, rows, 18), restT_rows.dtype),
        interpret=interpret,
    )(*args)
    return out[:t]


def _moments_fwd_manual(restT_rows, static2, pos2, h):
    """K1 forward with MANUAL double-buffered DMA of the slab operands.

    static2: (t*5, slab) 2D-flattened [restT_3 | mass | vol] (Mosaic cannot
    slice a (t, 5, slab) memref at all — internal 5->8 sublane padding — so
    manual-DMA slabs are flattened and sliced in 8-row multiples; TBM=8 tiles
    per grid step makes both 5- and 3-row operands 8-aligned).
    pos2: (t*3, slab) lane-major dynamic positions (gather_packed_T flat=True).
    Requires t % _TBM == 0 (layout tile_align pads buckets at build time).

    Measured on v5e (tools/stage_probe.py, t=3760 slab=640 rows=32): 0.524
    us/tile vs 0.661 BlockSpec — the automatic pipeline pays per-block latency
    serially; issuing a whole grid step's copies together hides them behind
    compute.  Output is bitwise-identical to the BlockSpec path.
    """
    t, _, rows = restT_rows.shape
    slab = static2.shape[1]
    assert t % _TBM == 0, f"manual K1 needs t % {_TBM} == 0, got {t}"

    def kernel(rr_ref, st2_ref, ps2_ref, ay_ref, st_b0, st_b1, ps_b0, ps_b1,
               sems):
        st_b = (st_b0, st_b1)
        ps_b = (ps_b0, ps_b1)
        i = pl.program_id(0)
        nt = pl.num_programs(0)

        def copies(blk, par):
            return [
                pltpu.make_async_copy(
                    st2_ref.at[pl.ds(blk * _TBM * 5, _TBM * 5)],
                    st_b[par], sems.at[par, 0]),
                pltpu.make_async_copy(
                    ps2_ref.at[pl.ds(blk * _TBM * 3, _TBM * 3)],
                    ps_b[par], sems.at[par, 1]),
            ]

        @pl.when(i == 0)
        def _():
            for c in copies(0, 0):
                c.start()

        @pl.when(i + 1 < nt)
        def _():
            for par in (0, 1):
                @pl.when((i + 1) % 2 == par)
                def _(par=par):
                    for c in copies(i + 1, par):
                        c.start()

        for par in (0, 1):
            @pl.when(i % 2 == par)
            def _(par=par):
                for c in copies(i, par):
                    c.wait()
                for bi in range(_TBM):
                    _moments_kernel(
                        _Sub(rr_ref, bi), _SubFlat(st_b[par], bi, 5),
                        _SubFlat(ps_b[par], bi, 3), _Sub(ay_ref, bi), h=h)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(t // _TBM,),
        in_specs=[
            pl.BlockSpec((_TBM, 3, rows), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((_TBM, rows, 18), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((_TBM * 5, slab), static2.dtype),
            pltpu.VMEM((_TBM * 5, slab), static2.dtype),
            pltpu.VMEM((_TBM * 3, slab), pos2.dtype),
            pltpu.VMEM((_TBM * 3, slab), pos2.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t, rows, 18), restT_rows.dtype),
    )(restT_rows, static2, pos2)


def _moments_vjp_fwd(restT_rows, static_slab, pos_slabT, h, interpret):
    out = _moments_fwd_impl(restT_rows, static_slab, pos_slabT, h, interpret)
    return out, (restT_rows, static_slab, pos_slabT.shape[1])


def _moments_vjp_bwd(h, interpret, res, day):
    restT_rows, static_slab, pw = res
    t, _, rows = restT_rows.shape
    slab = static_slab.shape[2]
    interpret = _interpret_default() if interpret is None else interpret
    kernel = _batched(functools.partial(_moments_bwd_kernel, h=h), 4)
    args, t_pad = _pad_tiles([restT_rows, static_slab, day], t)
    dps = pl.pallas_call(
        kernel,
        grid=(t_pad // _TILE_BATCH,),
        in_specs=_tile_specs([
            (3, rows), (5, slab), (rows, 18),
        ]),
        out_specs=_tile_specs([(3, slab)])[0],
        out_shape=jax.ShapeDtypeStruct((t_pad, 3, slab), day.dtype),
        interpret=interpret,
    )(*args)
    dps = dps[:t]
    if pw > 3:   # cotangent wrt the (t, pw, slab) lane-major operand
        dps = jnp.concatenate(
            [dps, jnp.zeros((t, pw - 3, slab), dps.dtype)], axis=1)
    return (None, None, dps)


moments_pallas.defvjp(_moments_vjp_fwd, _moments_vjp_bwd)


# ------------------------------------------------- moments (K1, v4 lane-major)
def _moments_kernel_v4(restT_rows_ref, static_slab_ref, pos_slabT_ref,
                       posT_rows_ref, ayT_ref, *, h, tb):
    """K1 with a LANE-MAJOR (18, tb*rows) output, CENTERED in-kernel.

    The MXU contraction runs transposed — dotsT = [pos - c; 1] @ lhs^T gives
    (4, 6*rows) — and the output row 3*blk + a is the (1, rows) lane slice of
    the CENTERED moment  dots[a] - (pos_i[a] - c_a) * rowsum_blk, with the
    rowsum riding as the free 4th RHS row of the SAME dot.  The rowsum must
    be CONSISTENT with the in-kernel f32 coefficients: substituting the
    static host-f64 rs6 here was measured to re-destabilize the quiet body
    (mismatch noise ~ eps * sum|lhs| * tile-extent — the NON-cancelled
    coefficient sum is large), so the static rs6T_rows feeds ONLY the
    backward kernel (gradient-side use, ~1e-7 relative, harmless) and is not
    an operand here at all (staging it was pure waste — ADVICE r4).

    Centering rationale (round 4, tools/probe_stability.py): raw dots
    contract ABSOLUTE positions — ~35x the centered pair magnitude — so dot
    rounding lands on A_pq amplified 35x; with the XLA-side -pos_i*rowsum
    correction this destabilized the episode.  Shifting by c = the tile's
    first rest coordinate (any per-tile constant works — the subtraction is
    mathematically exact) brings the contracted magnitudes down to tile
    extent + reach (~3x pair scale).

    Output relabeling: ayT row 3b+a is the FINAL [A | Y] component — the
    callers' -pos_i * rs6 correction is gone.
    """
    rows = restT_rows_ref.shape[2]
    for i in range(tb):
        rr = restT_rows_ref[i]          # (3, rows)
        st = static_slab_ref[i]         # (5, slab)
        rs = st[0:3]
        dx, w, gfac = _pair_coeffs(rr, rs, h)
        cA = w * st[3:4]
        gv = gfac * st[4:5]
        pos_slabT = pos_slabT_ref[i]    # (pw, slab)
        lhs = jnp.concatenate(
            [cA * (-dx[b]) for b in range(3)] + [gv * dx[b] for b in range(3)],
            axis=0)
        slab = pos_slabT.shape[1]
        # per-tile shift: first REST row coordinate (static; padded tiles are
        # inert so a far-grid c only forgoes the precision win, never breaks)
        c = [rr[b:b + 1, 0:1] for b in range(3)]            # 3 x (1, 1)
        shifted = jnp.concatenate(
            [pos_slabT[b:b + 1] - c[b] for b in range(3)]
            + [jnp.ones((1, slab), lhs.dtype)], axis=0)     # (4, slab)
        dotsT = _dot_t(shifted, lhs)                        # (4, 6*rows)
        prow = posT_rows_ref[:, i * rows:(i + 1) * rows]    # (3, rows)
        # direct ref stores: tpu.concatenate rejects pieces whose lane
        # offsets differ ("offset mismatch on non-concat dimension"); masked
        # stores at static sub-tile offsets relayout fine (cf. the v2 bwd
        # kernel's drT_ref[0, 3c:3c+3, ...] stores)
        prow_sh = jnp.concatenate(
            [prow[b:b + 1] - c[b] for b in range(3)], axis=0)  # (3, rows)
        for blk in range(6):
            sl = slice(blk * rows, (blk + 1) * rows)
            ayT_ref[3 * blk:3 * blk + 3, i * rows:(i + 1) * rows] = (
                dotsT[:3, sl] - prow_sh * dotsT[3:4, sl])


def _moments_bwd_kernel_v4(restT_rows_ref, static_slab_ref, dayT_ref,
                           rs6T_rows_ref, dpsT_ref, dprowT_ref, ct_ref,
                           *, h, tb):
    """Backward of the CENTERED :func:`_moments_kernel_v4`.

    dayT (18, tb*rows) lane-major ->
      dpsT (tb, 3, slab):   d/d pos_slab — CT @ lhs as before (centering adds
                            only pos_slab-independent terms);
      dprowT (3, tb*rows):  d/d pos_rows — the centering term's gradient,
                            dprow[a, r] = -sum_blk dayT[3blk+a, r] * rs6_blk[r]
                            (the static per-block rowsums, matching the
                            forward's correction operand).

    CT is assembled through a VMEM scratch: value-level concat of
    offset-mismatched pieces is unimplemented in Mosaic, masked sub-tile ref
    stores are not."""
    rows = restT_rows_ref.shape[2]
    for i in range(tb):
        rr = restT_rows_ref[i]
        st = static_slab_ref[i]
        rs = st[0:3]
        dx, w, gfac = _pair_coeffs(rr, rs, h)
        cA = w * st[3:4]
        gv = gfac * st[4:5]
        lhs = jnp.concatenate(
            [cA * (-dx[b]) for b in range(3)] + [gv * dx[b] for b in range(3)],
            axis=0)
        for blk in range(6):
            ct_ref[:, blk * rows:(blk + 1) * rows] = (
                dayT_ref[3 * blk:3 * blk + 3, i * rows:(i + 1) * rows])
        dpsT_ref[i] = _dot(ct_ref[...], lhs)            # (3, slab)
        rs6 = rs6T_rows_ref[:, i * rows:(i + 1) * rows]  # (6, rows)
        dprowT_ref[:, i * rows:(i + 1) * rows] = -sum(
            ct_ref[:, blk * rows:(blk + 1) * rows] * rs6[blk:blk + 1]
            for blk in range(6))


# ============================================================ fused K1 + mid-section
def _moments_mid_kernel(restT_rows_ref, static_slab_ref, pos_slabT_ref,
                        stat_ref, dyn_ref,
                        fm_ref, sr_ref, ay_ref=None, *, h, corotated, sweeps):
    """K1 moment dots + the whole per-slot mid-section (correction, polar
    rotation, deformation gradient, StVK stress, M = R F S) fused into one
    kernel.  Emits the two K2 operand records directly:

      fm (rows, 19) = [F_9 row-major | M_9 row-major | V_i]
      sr (rows, 16) = [S_6 | R^T_9 (cols [3c+a] = R[a][c]) | pad]

    so the XLA between the kernels collapses to two free reshapes (the sr
    packed gather source is a row-major reshape of this output).

    stat_ref (1, rows, 18): [rs6_A(3) | rs6_Y(3) | mu | lam | vol | rest_corr_9
    row-major].  dyn_ref (1, rows, 4): [pos_i x y z | stiffness scale].
    ay_ref: optional raw-dots output (the custom-VJP residual — the backward
    reconstructs the mid-section in XLA from it, see packed.fused_k1mid).

    The mid math runs on (rows, 1) component columns via mat3's component
    helpers — pure elementwise VPU chains, exactly the lane-packed XLA
    formulation, so results match the unfused path to f32 rounding.
    """
    from .. import mat3

    rr = restT_rows_ref[0]          # (3, rows)
    stc = static_slab_ref[0]        # (5, slab): [restT_3 | mass | vol]
    dx, w, gfac = _pair_coeffs(rr, stc[0:3], h)
    cA = w * stc[3:4]
    gv = gfac * stc[4:5]
    pos_slabT = pos_slabT_ref[0]    # (pw, slab)
    rows = rr.shape[1]
    stat = stat_ref[0]              # (rows, 18)
    dyn = dyn_ref[0]                # (rows, 4)

    lhs = jnp.concatenate(
        [cA * (-dx[b]) for b in range(3)] + [gv * dx[b] for b in range(3)], axis=0
    )
    dots = _dot_t(lhs, pos_slabT)                    # (6 rows, pw)
    if ay_ref is not None:
        ay_ref[0] = jnp.concatenate(
            [dots[b * rows:(b + 1) * rows, :3] for b in range(6)], axis=1,
        )

    def comp(block, a):
        return dots[block * rows:(block + 1) * rows, a:a + 1]   # (rows, 1)

    def stat_col(c):
        return stat[:, c:c + 1]

    pos_i = [dyn[:, a:a + 1] for a in range(3)]
    scale = dyn[:, 3:4]
    A = [[comp(b, a) - pos_i[a] * stat_col(b) for b in range(3)]
         for a in range(3)]
    Y = [[comp(3 + b, a) - pos_i[a] * stat_col(3 + b) for b in range(3)]
         for a in range(3)]
    mu = stat_col(6)
    lam = stat_col(7)
    vol = stat_col(8)
    rc = [[stat_col(9 + 3 * a + b) for b in range(3)] for a in range(3)]

    one = jnp.ones_like(scale)
    zero = jnp.zeros_like(scale)
    eye = [[one if i == j else zero for j in range(3)] for i in range(3)]
    if corotated:
        U, _, V = mat3._svd3_components(A, sweeps)
        R = mat3._mmt(U, V)
        RtY = mat3._mtm(R, Y)
        nab = [[RtY[a][b] - rc[a][b] for b in range(3)] for a in range(3)]
    else:
        R = eye
        nab = [[Y[a][b] - rc[a][b] for b in range(3)] for a in range(3)]
    F = [[eye[a][b] + nab[b][a] for b in range(3)] for a in range(3)]
    FtF = mat3._mtm(F, F)
    E = [[0.5 * (FtF[a][b] - eye[a][b]) for b in range(3)] for a in range(3)]
    tr = E[0][0] + E[1][1] + E[2][2]
    S = [[(2.0 * mu * E[a][b] + (lam * tr if a == b else zero)) * scale
          for b in range(3)] for a in range(3)]
    M = mat3._mm(R, mat3._mm(F, S))

    fm_ref[0] = jnp.concatenate(
        [F[a][b] for a in range(3) for b in range(3)]
        + [M[a][b] for a in range(3) for b in range(3)] + [vol], axis=1)
    sr_ref[0] = jnp.concatenate(
        [S[0][0], S[0][1], S[0][2], S[1][1], S[1][2], S[2][2]]
        + [R[a][c] for c in range(3) for a in range(3)] + [zero], axis=1)


# ============================================================ forces (K2, separable)
def _forces_kernel(restT_rows_ref, static_slab_ref, g_rows_ref,
                   g_slab_ref, vol_rows_ref, f_ref, *, h):
    rr = restT_rows_ref[0]
    st = static_slab_ref[0]         # (5, slab): [restT_3 | mass | vol]
    dx, w, gfac = _pair_coeffs(rr, st[0:3], h)
    g_rows = g_rows_ref[0]          # (rows, 9) — G_i = V_i M_i
    vol_rows = vol_rows_ref[0]      # (rows, 1)
    rows = rr.shape[1]

    nw_stack = jnp.concatenate([gfac * dx[b] for b in range(3)], axis=0)  # (3 rows, slab)
    dots = _dot(nw_stack, g_slab_ref[0], _DOT_PREC_K2)  # (3 rows, 9)
    term = None
    for b in range(3):
        col = _cols(dots[b * rows:(b + 1) * rows], b)
        term = col if term is None else term + col
    gv_stack = nw_stack * st[4:5]                   # (3 rows, slab): V_j nw_b stacked
    svnw = jnp.sum(gv_stack, axis=1, keepdims=True)  # (3 rows, 1)
    vol_safe = jnp.where(vol_rows > 0, vol_rows, 1.0)
    m_rows = g_rows / vol_safe
    term_i = jnp.concatenate(
        [sum(m_rows[:, 3 * a + b: 3 * a + b + 1] * svnw[b * rows:(b + 1) * rows]
             for b in range(3)) for a in range(3)], axis=1,
    )
    f_ref[0] = 0.5 * vol_rows * (term + term_i)


def _forces_bwd_kernel(restT_rows_ref, static_slab_ref, vol_rows_ref,
                       df_ref, dgr_ref, dgs_ref, *, h):
    rr = restT_rows_ref[0]
    st = static_slab_ref[0]
    dx, w, gfac = _pair_coeffs(rr, st[0:3], h)
    vol_rows = vol_rows_ref[0]
    df = df_ref[0] * (0.5 * vol_rows)          # (rows, 3) scaled cotangent
    vol_safe = jnp.where(vol_rows > 0, vol_rows, 1.0)
    df_over_v = df / vol_safe
    rows = rr.shape[1]

    nw_stack = jnp.concatenate([gfac * dx[b] for b in range(3)], axis=0)
    # dG_slab[s, 3a+b] = sum_r NWb[r, s] df[r, a]: one rows-contraction with the
    # cotangent tiled per b-block, then unstack columns.
    dgs_cols = [None] * 9
    for b in range(3):
        cb = _dot_rows(nw_stack[b * rows:(b + 1) * rows], df,
                       _DOT_PREC_K2)                           # (slab, 3)
        for a in range(3):
            dgs_cols[3 * a + b] = cb[:, a: a + 1]
    dgs_ref[0] = jnp.concatenate(dgs_cols, axis=1)
    gv_stack = nw_stack * st[4:5]
    svnw = jnp.sum(gv_stack, axis=1, keepdims=True)
    dgr_cols = [None] * 9
    for b in range(3):
        for a in range(3):
            # dG_rows[r, 3a+b] = (df[r, a] / V_i) * svnw_b[r] (the term_i path)
            dgr_cols[3 * a + b] = df_over_v[:, a: a + 1] * svnw[b * rows:(b + 1) * rows]
    dgr_ref[0] = jnp.concatenate(dgr_cols, axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def forces_pallas(restT_rows, static_slab, g_rows, g_slab, vol_rows,
                  h, interpret=None):
    """Separable (pair_def_grad="j") elastic forces: (t, rows, 3).
    static_slab: (t, 5, slab) = [restT_3 | mass | vol] (mass row unused)."""
    return _forces_fwd_impl(restT_rows, static_slab, g_rows, g_slab,
                            vol_rows, h, interpret)


def _forces_fwd_impl(restT_rows, static_slab, g_rows, g_slab, vol_rows,
                     h, interpret):
    t, _, rows = restT_rows.shape
    slab = static_slab.shape[2]
    gw = g_slab.shape[-1]     # 9, or 16 when packed-row gathered
    interpret = _interpret_default() if interpret is None else interpret
    kernel = _batched(functools.partial(_forces_kernel, h=h), 6)
    args, t_pad = _pad_tiles(
        [restT_rows, static_slab, g_rows, g_slab, vol_rows[:, :, None]], t)
    out = pl.pallas_call(
        kernel,
        grid=(t_pad // _TILE_BATCH,),
        in_specs=_tile_specs([
            (3, rows), (5, slab), (rows, 9), (slab, gw), (rows, 1),
        ]),
        out_specs=_tile_specs([(rows, 3)])[0],
        out_shape=jax.ShapeDtypeStruct((t_pad, rows, 3), g_rows.dtype),
        interpret=interpret,
    )(*args)
    return out[:t]


def _forces_vjp_fwd(restT_rows, static_slab, g_rows, g_slab, vol_rows,
                    h, interpret):
    out = _forces_fwd_impl(restT_rows, static_slab, g_rows, g_slab,
                           vol_rows, h, interpret)
    return out, (restT_rows, static_slab, vol_rows)


def _forces_vjp_bwd(h, interpret, res, df):
    restT_rows, static_slab, vol_rows = res
    t, _, rows = restT_rows.shape
    slab = static_slab.shape[2]
    interpret = _interpret_default() if interpret is None else interpret
    kernel = _batched(functools.partial(_forces_bwd_kernel, h=h), 6)
    args, t_pad = _pad_tiles(
        [restT_rows, static_slab, vol_rows[:, :, None], df], t)
    dgr, dgs = pl.pallas_call(
        kernel,
        grid=(t_pad // _TILE_BATCH,),
        in_specs=_tile_specs([
            (3, rows), (5, slab), (rows, 1), (rows, 3),
        ]),
        out_specs=_tile_specs([(rows, 9), (slab, 9)]),
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, rows, 9), df.dtype),
            jax.ShapeDtypeStruct((t_pad, slab, 9), df.dtype),
        ],
        interpret=interpret,
    )(*args)
    return (None, None, dgr[:t], dgs[:t], None)


forces_pallas.defvjp(_forces_vjp_fwd, _forces_vjp_bwd)


# ============================================================ forces (K2, Warp mode)
# S is SYMMETRIC (StVK: S = (2 mu E + lambda tr(E) I) * scale with E = E^T), so
# it travels as 6 unique components [s00 s01 s02 s11 s12 s22]; the kernels remap
# (d, b) -> _SYM6[3d+b].  Fused per-slot record: [S_6 | R_9^T | pad] = 16 floats
# -> ONE packed (n_slots/8, 128) gather source for the whole K2 stage (every
# separate gather source costs a full per-iteration staging copy inside the
# scan — measured ~0.7 ms per 7.7MB source at 100k).
_SYM6 = (0, 1, 2, 1, 3, 4, 2, 4, 5)


def _forces_warp_kernel_v2(restT_rows_ref, static_slab_ref,
                           fm_ref, srT_ref, f_ref, *, h, chunks):
    """Warp pairing (sim.py:227-234): f_i = V_i/2 (sum_j R_j f_ij + M_i sum_j V_j nw).

    srT_ref (1, 16, slab): the fused [S_6 | R_9^T | pad] slab LANE-MAJOR
    (transposed outside the kernel by XLA): rows 0..5 are the S lane vectors,
    rows 6..14 R^T.  It is the ONLY dynamic slab operand — the matmul runs as
    a transposed-RHS dot against the same array (per c-block the output
    columns 6+3c..8+3c are the contiguous slice sum_s u_c V_j R_j[a, c]).
    A (slab, 16)-shaped operand would be retiled by XLA with the minor dim
    padded to 128 lanes — an 8x HBM bloat staged every scan iteration.
    Volume V_j is folded into gfac once (nw carries it through z/u/svnw).
    fm_ref (1, rows, 19) fuses [F_9 | M_9 | V_i] into one operand (each
    separate (rows, k<128) operand pays its own 128-lane retiling + staging).
    """
    rr = restT_rows_ref[0]
    fm = fm_ref[0]
    f9 = fm[:, 0:9]
    m9 = fm[:, 9:18]
    vol_rows = fm[:, 18:19]
    rows = rr.shape[1]
    slab = static_slab_ref.shape[2]
    L = slab // chunks

    f32 = rr.dtype
    # (measured: deferring the F_i contraction past the MXU dot and applying
    # it in a per-row (rows, 1) epilogue LOSES ~12% — narrow column math pays
    # full Mosaic relayout/instruction cost, same lesson as cfg.fused_mid)
    termj = jnp.zeros((rows, 3), f32)
    svnw = [jnp.zeros_like(vol_rows) for _ in range(3)]
    for k in range(chunks):
        rs = static_slab_ref[0, 0:3, k * L:(k + 1) * L]
        dx, gfac = _pair_coeffs_g(rr, rs, h)
        gv = gfac * static_slab_ref[0, 4:5, k * L:(k + 1) * L]  # (rows, L), V_j folded
        # bf16 (cfg.pair_dtype) is STORAGE-ONLY: the slab travels HBM->VMEM at
        # half the bytes and upcasts once here; all pair math stays f32
        sT = srT_ref[0, :, k * L:(k + 1) * L].astype(f32)   # (16, L)
        nw = [gv * dx[b] for b in range(3)]
        z = [sum(nw[b] * sT[_SYM6[3 * d + b]:_SYM6[3 * d + b] + 1, :]
                 for b in range(3)) for d in range(3)]
        u_stack = jnp.concatenate(
            [sum(f9[:, 3 * c + d: 3 * c + d + 1] * z[d]
                 for d in range(3)) for c in range(3)], axis=0,
        )                                                   # (3 rows, L)
        dots = jax.lax.dot_general(                          # f32 accumulate
            u_stack, sT, (((1,), (1,)), ((), ())), preferred_element_type=f32)
        for c in range(3):
            termj = termj + dots[c * rows:(c + 1) * rows, 6 + 3 * c:9 + 3 * c]
        for b in range(3):
            svnw[b] = svnw[b] + jnp.sum(nw[b], axis=1, keepdims=True)
    term_i = jnp.concatenate(
        [sum(m9[:, 3 * a + b: 3 * a + b + 1] * svnw[b] for b in range(3))
         for a in range(3)], axis=1,
    )
    f_ref[0] = 0.5 * vol_rows * (termj + term_i)


def _forces_warp_kernel_v4(restT_rows_ref, static_slab_ref,
                           f9T_ref, srT_ref, fT_ref, *, h, chunks, tb):
    """Warp pairing, LANE-MAJOR row operands (round-3 redesign).

    Differences vs :func:`_forces_warp_kernel_v2` (both measured on v5e):

    * fm (rows, 19) -> f9T (9, tb*rows) lane-major: the (rows, k<128) operand
      was T(8,128)-padded 6.7x in HBM and staged padded per tile; (9, 128)
      blocks pad only 9->16 sublanes.  M/V_i are gone entirely:
    * term_i = M_i (sum_j V_j grad W) uses a REST-STATIC row sum (the same
      quantity as rs6[:, 3:6]) — it moves to the XLA mid-section, computed
      once per step on lane-packed components instead of per pair here.
    * The F_i contraction moves PAST the MXU dot into a lane-major epilogue:
      D = sT @ Z^T with Z = [z_0; z_1; z_2], then
      termj[r, a] = sum_{c,d} F[c,d](r) * D[6+3c+a, d*rows+r] on (1, rows)
      lane rows (measured 0.269 vs 0.385 us/tile for row-math vs padded
      column-math, tools/lanemajor_probe.py).  This also deletes the per-pair
      u_c = F z mults (~15 VPU ops/pair).
    * Output fT (3, tb*rows) lane-major ((rows, 3) was 42x lane-padded).

    The kernel is natively batched over ``tb`` tiles (row-side blocks must
    span tb*rows = 128 lanes).
    """
    rows = restT_rows_ref.shape[2]
    slab = static_slab_ref.shape[2]
    L = slab // chunks
    f9T = f9T_ref[...]                   # (9, tb*rows)
    f32 = f9T.dtype
    out_cols = []
    for i in range(tb):
        rr = restT_rows_ref[i]           # (3, rows)
        dots = jnp.zeros((16, 3 * rows), f32)
        for k in range(chunks):
            rs = static_slab_ref[i, 0:3, k * L:(k + 1) * L]
            dx, gfac = _pair_coeffs_g(rr, rs, h)
            gv = gfac * static_slab_ref[i, 4:5, k * L:(k + 1) * L]
            sT = srT_ref[i, :, k * L:(k + 1) * L].astype(f32)   # (16, L)
            nw = [gv * dx[b] for b in range(3)]
            Z = jnp.concatenate(
                [sum(nw[b] * sT[_SYM6[3 * d + b]:_SYM6[3 * d + b] + 1, :]
                     for b in range(3)) for d in range(3)], axis=0)  # (3 rows, L)
            dots = dots + _dot_t(sT, Z, _DOT_PREC_K2)                # (16, 3 rows)
        fi = f9T[:, i * rows:(i + 1) * rows]                         # (9, rows)
        t_rows = []
        for a in range(3):
            acc = None
            for c in range(3):
                row = dots[6 + 3 * c + a:7 + 3 * c + a, :]           # (1, 3 rows)
                for d in range(3):
                    term = (fi[3 * c + d:3 * c + d + 1, :]
                            * row[:, d * rows:(d + 1) * rows])
                    acc = term if acc is None else acc + term
            t_rows.append(acc)
        out_cols.append(jnp.concatenate(t_rows, axis=0))             # (3, rows)
    fT_ref[...] = jnp.concatenate(out_cols, axis=1)                  # (3, tb*rows)


def _forces_warp_bwd_kernel_v2(restT_rows_ref, static_slab_ref,
                               fm_ref, srT_ref, df_ref,
                               dfm_ref, dsT6_ref, drT_ref, *, h, chunks):
    """Backward of :func:`_forces_warp_kernel_v2`.

    srT (1, 16, slab) as in the forward.  Outputs (both LANE-MAJOR — small-
    minor pallas outputs pay the same retiling bloat as inputs): dsT6
    (1, 6, slab) — the S cotangent (off-diagonals accumulate both (d, b) and
    (b, d) uses of the symmetric parameterization); drT (1, 9, slab) — the
    R^T cotangent in the forward's row order.  The caller assembles the fused
    [S_6 | R_9^T] record in XLA (transposes there run at HBM speed).
    """
    rr = restT_rows_ref[0]
    fm = fm_ref[0]
    f9 = fm[:, 0:9]
    vol_rows = fm[:, 18:19]
    df = df_ref[0] * (0.5 * vol_rows)          # (rows, 3)
    rows = rr.shape[1]
    slab = static_slab_ref.shape[2]
    L = slab // chunks
    svnw = [jnp.zeros_like(vol_rows) for _ in range(3)]
    df9_acc = [jnp.zeros_like(vol_rows) for _ in range(9)]
    for k in range(chunks):
        rs = static_slab_ref[0, 0:3, k * L:(k + 1) * L]
        dx, gfac = _pair_coeffs_g(rr, rs, h)
        gv = gfac * static_slab_ref[0, 4:5, k * L:(k + 1) * L]
        # backward runs f32 throughout (cast the possibly-bf16 slab once)
        sT = srT_ref[0, :, k * L:(k + 1) * L].astype(rr.dtype)  # (16, L)
        nw = [gv * dx[b] for b in range(3)]                 # V_j folded
        z = [sum(nw[b] * sT[_SYM6[3 * d + b]:_SYM6[3 * d + b] + 1, :]
                 for b in range(3)) for d in range(3)]
        for b in range(3):
            svnw[b] = svnw[b] + jnp.sum(nw[b], axis=1, keepdims=True)

        u_stack = jnp.concatenate(
            [sum(f9[:, 3 * c + d: 3 * c + d + 1] * z[d] for d in range(3))
             for c in range(3)], axis=0,
        )
        wprime = []
        for c in range(3):
            # dR^T[3c+a][s] = sum_r df[r, a] u_c[r, s] (u carries V_j)
            contrib = _dot_rows(df, u_stack[c * rows:(c + 1) * rows],
                                _DOT_PREC_K2)                   # (3, L)
            drT_ref[0, 3 * c:3 * c + 3, k * L:(k + 1) * L] = contrib
            # w'_c[r, s] = sum_a df[r, a] R_j[a, c][s]; srT rows 6+3c+a
            wprime.append(
                sum(df[:, a: a + 1] * sT[6 + 3 * c + a:7 + 3 * c + a, :]
                    for a in range(3))
            )

        y = []
        for d in range(3):
            for c in range(3):
                df9_acc[3 * c + d] = df9_acc[3 * c + d] + jnp.sum(
                    z[d] * wprime[c], axis=1, keepdims=True
                )
            y.append(sum(f9[:, 3 * c + d: 3 * c + d + 1] * wprime[c] for c in range(3)))
        ds6 = [None] * 6
        for d in range(3):
            for b in range(3):
                k6 = _SYM6[3 * d + b]
                term = jnp.sum(nw[b] * y[d], axis=0, keepdims=True)  # (1, L)
                ds6[k6] = term if ds6[k6] is None else ds6[k6] + term
        dsT6_ref[0, :, k * L:(k + 1) * L] = jnp.concatenate(ds6, axis=0)

    dm_cols = [None] * 9
    for a in range(3):
        for b in range(3):
            dm_cols[3 * a + b] = df[:, a: a + 1] * svnw[b]
    # fused [dF_9 | dM_9 | 0] cotangent (V_i is a material constant)
    dfm_ref[0] = jnp.concatenate(
        df9_acc + dm_cols + [jnp.zeros_like(vol_rows)], axis=1)


def _forces_warp_bwd_impl(restT_rows, static_slab, fm_rows, srT_slab,
                          df, h, interpret, chunks):
    """pallas_call wrapper for the v2 warp backward (used by packed.py)."""
    t, _, rows = restT_rows.shape
    slab = static_slab.shape[2]
    interpret = _interpret_default() if interpret is None else interpret
    kernel = _batched(
        functools.partial(_forces_warp_bwd_kernel_v2, h=h, chunks=chunks), 8)
    args, t_pad = _pad_tiles(
        [restT_rows, static_slab, fm_rows, srT_slab, df], t)
    dfm, dsT6, drT = pl.pallas_call(
        kernel,
        grid=(t_pad // _TILE_BATCH,),
        in_specs=_tile_specs([
            (3, rows), (5, slab), (rows, 19),
            (16, slab), (rows, 3),
        ]),
        out_specs=_tile_specs([(rows, 19), (6, slab), (9, slab)]),
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, rows, 19), df.dtype),
            jax.ShapeDtypeStruct((t_pad, 6, slab), df.dtype),
            jax.ShapeDtypeStruct((t_pad, 9, slab), df.dtype),
        ],
        interpret=interpret,
    )(*args)
    return dfm[:t], dsT6[:t], drT[:t]


def _forces_warp_bwd_kernel_v4(restT_rows_ref, static_slab_ref,
                               f9T_ref, srT_ref, dfT_ref,
                               df9T_ref, dsrT_ref, *, h, chunks, tb):
    """Backward of :func:`_forces_warp_kernel_v4`, LANE-MAJOR end to end.

    The v2 backward consumed fm (rows, 19) / df (rows, 3) row-major operands
    and emitted dfm (rows, 19) — each T(8,128)-padded ~7x in HBM and staged
    padded per tile, plus XLA-side transposes on both sides of the call
    (packed.py round-2 wiring).  Here every row-side tensor moves as the same
    compact lane-major stacks the forward already uses — f9T (9, tb*rows),
    dfT (3, tb*rows) in; df9T (9, tb*rows) out — and the per-tile row views
    the math needs come from three small in-register transposes per tile
    ((3, rows) / (9, rows) / (rows, 9)) instead of per-step HBM round trips.

    dfT is the cotangent of the RAW termj output (the 0.5*V_i scale and the
    static term_i path live in the XLA mid-section, as in the forward).
    dsrT (tb, 15, slab) = [dS_6 | dR^T_9] lane-major per tile; the caller
    scatter-adds it into the packed [S|R] source layout.
    """
    rows = restT_rows_ref.shape[2]
    slab = static_slab_ref.shape[2]
    L = slab // chunks
    f9T = f9T_ref[...]                    # (9, tb*rows)
    dfT = dfT_ref[...]                    # (3, tb*rows)
    f32 = dfT.dtype
    df9_cols = []
    for i in range(tb):
        rr = restT_rows_ref[i]                                   # (3, rows)
        dfc = jnp.transpose(dfT[:, i * rows:(i + 1) * rows])     # (rows, 3)
        f9c = jnp.transpose(f9T[:, i * rows:(i + 1) * rows])     # (rows, 9)
        df9_acc = [jnp.zeros((rows, 1), f32) for _ in range(9)]
        for k in range(chunks):
            rs = static_slab_ref[i, 0:3, k * L:(k + 1) * L]
            dx, gfac = _pair_coeffs_g(rr, rs, h)
            gv = gfac * static_slab_ref[i, 4:5, k * L:(k + 1) * L]
            sT = srT_ref[i, :, k * L:(k + 1) * L].astype(f32)    # (16, L)
            nw = [gv * dx[b] for b in range(3)]                  # V_j folded
            z = [sum(nw[b] * sT[_SYM6[3 * d + b]:_SYM6[3 * d + b] + 1, :]
                     for b in range(3)) for d in range(3)]
            wprime = []
            for c in range(3):
                u_c = sum(f9c[:, 3 * c + d:3 * c + d + 1] * z[d]
                          for d in range(3))                     # (rows, L)
                # dR^T[3c+a][s] = sum_r df[r, a] u_c[r, s]
                dsrT_ref[i, 6 + 3 * c:9 + 3 * c, k * L:(k + 1) * L] = (
                    _dot_rows(dfc, u_c, _DOT_PREC_K2))
                # w'_c[r, s] = sum_a df[r, a] R_j[a, c][s]
                wprime.append(
                    sum(dfc[:, a:a + 1] * sT[6 + 3 * c + a:7 + 3 * c + a, :]
                        for a in range(3)))
            y = []
            for d in range(3):
                for c in range(3):
                    df9_acc[3 * c + d] = df9_acc[3 * c + d] + jnp.sum(
                        z[d] * wprime[c], axis=1, keepdims=True)
                y.append(sum(f9c[:, 3 * c + d:3 * c + d + 1] * wprime[c]
                             for c in range(3)))
            ds6 = [None] * 6
            for d in range(3):
                for b in range(3):
                    k6 = _SYM6[3 * d + b]
                    term = jnp.sum(nw[b] * y[d], axis=0, keepdims=True)
                    ds6[k6] = term if ds6[k6] is None else ds6[k6] + term
            dsrT_ref[i, 0:6, k * L:(k + 1) * L] = jnp.concatenate(ds6, axis=0)
        df9_cols.append(jnp.transpose(jnp.concatenate(df9_acc, axis=1)))
    df9T_ref[...] = jnp.concatenate(df9_cols, axis=1)            # (9, tb*rows)


def _forces_warp_bwd_v4_impl(restT_rows, static_slab, f9T, srT_slab, dfT,
                             h, interpret, chunks):
    """pallas_call wrapper for the v4 warp backward (used by packed.py).

    Tile count t must already be a tb multiple (caller pads).  Returns
    df9T (9, t*rows) and dsrT (t, 15, slab) = [dS_6 | dR^T_9].
    """
    t, _, rows = restT_rows.shape
    slab = static_slab.shape[2]
    tb = 128 // rows
    interpret = _interpret_default() if interpret is None else interpret
    kernel = functools.partial(
        _forces_warp_bwd_kernel_v4, h=h, chunks=chunks, tb=tb)
    df9T, dsrT = pl.pallas_call(
        kernel,
        grid=(t // tb,),
        in_specs=[
            pl.BlockSpec((tb, 3, rows), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 5, slab), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, tb * rows), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 16, slab), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tb * rows), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((9, tb * rows), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 15, slab), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((9, t * rows), dfT.dtype),
            jax.ShapeDtypeStruct((t, 15, slab), dfT.dtype),
        ],
        interpret=interpret,
    )(restT_rows, static_slab, f9T, srT_slab, dfT)
    return df9T, dsrT
