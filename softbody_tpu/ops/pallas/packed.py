"""Packed-row slab movement for the pair kernels.

Measured on v5e: XLA gather and Pallas DMA both move data at a fixed ~3.5ns per
ROW unless rows are 128 floats wide, where they reach memory bandwidth.  So all
dynamic slab traffic here is packed into (n_groups, 128) arrays:

  positions: 8 floats/slot  ->  8 slots/row, 64-float rows
  G (9f):    16 floats/slot ->  8 slots/row
  [S6|R9^T]: 16 floats/slot ->  8 slots/row   (Warp mode, fused record)

Packing/unpacking is free in XLA (row-major reshapes); the per-tile group-row
index tables are static (Blocked.gidx32/gidx8/gidx4).  Backward passes scatter
per-tile slab cotangents back with the same packed rows (.at[].add).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import pair_kernels as pk

# Backward passes are chunked over tiles: their (chunk, slab, F<128) cotangent
# temps are lane-padded by XLA (F -> 128, e.g. 14.2x for F=9), so full-size
# temps blow HBM at production scale.  Chunks run SEQUENTIALLY via lax.scan
# (a Python loop's chunks coexist in XLA's buffer schedule — measured: 9
# concurrent chunks still OOM'd).  The v3 kernels emit LANE-MAJOR cotangents
# ((t, F, slab) — no 128-lane padding), so much larger chunks fit now; the
# env knob exists for measurement.
import os as _os

# Component stacks ((k, m) jnp.stack before packing/transposing) used to be
# pinned behind an optimization_barrier: in the round-2 layouts XLA's layout
# assignment propagated the consumer's layout into the stack and relayouted
# one strided pass PER COMPONENT (measured 19 x 0.18 ms).  Re-measured round 5
# under the v4 lane-major consumers: the barrier is now neutral-to-NEGATIVE
# (fwd 1.604e7 -> 1.613e7, fwd+bwd 4.549e6 -> 4.595e6 at 100k with it OFF) —
# the pathology it guarded against no longer exists, and the grad program
# stages the barriered stacks as twelve ~0.43 ms T(1,128) VMEM copies per
# iteration.  Default OFF; the knob remains for regression hunting.
_STACK_BARRIER = _os.environ.get("SOFTBODY_STACK_BARRIER", "0") == "1"


def _maybe_barrier(x):
    return jax.lax.optimization_barrier(x) if _STACK_BARRIER else x


# MEASURED at 100k on v5e: 512 -> 3.33e6, 2048 -> 3.90e6 fwd+bwd
# particle-steps/s (fewer sequential chunks pipeline better); 4096 (= one
# chunk) blew past the compile budget.
_BWD_TILE_CHUNK = int(_os.environ.get("SOFTBODY_BWD_TILE_CHUNK", "2048"))


def _scan_chunks(body, per_tile_args, t, acc_init):
    """Run ``body(chunk_args) -> (scatter_add, stacked_outs)`` sequentially over
    equal 512-tile chunks (tail zero-padded: zero rest positions make every
    pair coefficient vanish, so padded tiles contribute nothing).

    Returns (acc, outs) with outs leaves shaped (t, ...) (tail trimmed).
    """
    ch = min(_BWD_TILE_CHUNK, t)
    n_chunks = -(-t // ch)
    t_pad = n_chunks * ch

    def prep(a):
        if t_pad > t:
            padding = [(0, t_pad - t)] + [(0, 0)] * (a.ndim - 1)
            a = jnp.pad(a, padding)
        return a.reshape((n_chunks, ch) + a.shape[1:])

    stacked = jax.tree.map(prep, per_tile_args)

    def scan_body(acc, chunk_args):
        add, outs = body(chunk_args)
        return acc + add, outs

    acc, outs = jax.lax.scan(scan_body, acc_init, stacked)
    outs = jax.tree.map(
        lambda o: o.reshape((t_pad,) + o.shape[2:])[:t], outs
    )
    return acc, outs


def pack(arr, width, pad_width, group):
    """(n_slots, width) -> (n_slots/group, group*pad_width) rows, zero-padded
    to pad_width floats per slot."""
    n = arr.shape[0]
    padded = jnp.concatenate(
        [arr, jnp.zeros((n, pad_width - width), arr.dtype)], axis=1
    ) if pad_width > width else arr
    return padded.reshape(n // group, group * pad_width)


def pack_components(comps, pad_width, group, n_total=None):
    """Build a packed (n/group, group*pad_width) gather source directly from
    per-field (n,) component arrays.  Rows are FIELD-MAJOR:
    ``row[gid] = [f0 of slots 0..group-1 | f1 of slots 0..group-1 | ...]`` —
    so the lane-major re-layout after the gather (:func:`gather_packed_T`)
    permutes contiguous ``group``-float runs instead of single floats
    (element-granularity transposes were ~0.5 ms/step of the 100k profile).

    jnp.stack(comps, -1) -> pack() writes the (n, pad_width) intermediate with
    its minor dim padded to 128 lanes, one strided pass per component
    (measured ~1.6 ms for 19 components at m=120k).  Stacking along axis 0
    keeps every write compact; one transpose then emits the packed rows in a
    single bandwidth-bound pass."""
    return pack_components_with_stack(comps, pad_width, group, n_total)[0]


def pack_components_with_stack(comps, pad_width, group, n_total=None):
    """:func:`pack_components` that ALSO returns the compact (pad_width, n)
    component stack it builds en route.  Callers that need a lane-major view
    of the same components (e.g. the K1 centering rows, sim/sparse.py)
    slice this instead of re-stacking — the duplicate strided stack was a
    measured per-iteration copy in the round-5 step trace."""
    n = comps[0].shape[0]
    dtype = comps[0].dtype
    zero = jnp.zeros((n,), dtype)
    full = list(comps) + [zero] * (pad_width - len(comps))
    x = jnp.stack(full, axis=0)                  # (pad_width, n) compact
    x = _maybe_barrier(x)
    if n_total is not None and n_total > n:
        x = jnp.pad(x, ((0, 0), (0, n_total - n)))
        n = n_total
    y = x.reshape(pad_width, n // group, group)
    packed = jnp.transpose(y, (1, 0, 2)).reshape(n // group, group * pad_width)
    return packed, x


def rows_from_components(comps, t, rows):
    """(m,) component arrays -> (t, rows, k) pallas operand via ONE transpose
    pass (jnp.stack(comps, -1).reshape(...) concatenates into the 128-lane-
    padded layout one strided pass per component)."""
    x = jnp.stack(comps, axis=0)                 # (k, m) compact
    # barrier pins the compact row-major stack: without it XLA's layout
    # assignment propagates the consumer's layout into the stack and turns
    # this into one strided relayout PER COMPONENT (measured 19 x 0.18 ms)
    x = _maybe_barrier(x)
    return jnp.transpose(x.reshape(len(comps), t, rows), (1, 2, 0))


def gather_packed(packed, gidx, slab, pad_width):
    """(rows, 128) packed source + (t, slab/group) group rows -> (t, slab, pad_width)."""
    t = gidx.shape[0]
    rows = jnp.take(packed, gidx.reshape(-1), axis=0)
    return rows.reshape(t, slab, pad_width)


def gather_packed_sm(packed, gidx, slab, pad_width):
    """FIELD-MAJOR packed rows (:func:`pack_components`) -> SLOT-MAJOR
    (t, slab, pad_width) slab, for kernels consuming (slab, k) operands
    (separable forces in the SPMD path)."""
    t, G = gidx.shape
    group = slab // G
    rows = jnp.take(packed, gidx.reshape(-1), axis=0)
    x = rows.reshape(t, G, pad_width, group)
    return jnp.transpose(x, (0, 1, 3, 2)).reshape(t, slab, pad_width)


def gather_packed_T(packed, gidx, slab, pad_width, take=None, flat=False):
    """Gather FIELD-MAJOR packed rows (:func:`pack_components`) into the
    LANE-MAJOR (t, take or pad_width, slab) slab the kernels stage.

    Goes through (t, G, fields, slots) -> permute (0, 2, 1, 3): the permuted
    minor unit is a contiguous ``group``-float run, so the re-layout moves
    32-byte chunks, not single floats.  (Reshaping the gather output to
    (t, slab, pad_width) and transposing materializes a 128-lane-padded
    intermediate — measured 5x slower.)

    ``take``: keep only the first ``take`` field rows (sliced BEFORE the
    transpose, so padding fields are never materialized in the lane-major
    buffer the kernel stages — e.g. positions use 3 of their 8 packed
    floats; shipping all 8 staged 2.7x the necessary bytes).

    ``flat``: emit (t*take, slab) 2D instead (same data order — the reshape
    fuses into the transpose) for manual-DMA kernels, which cannot slice a
    3D memref with internal sublane padding (Mosaic rule) and which also
    skip the (t, 3, slab) T(4,128) sublane-padding bytes."""
    t, G = gidx.shape
    group = slab // G
    rows = jnp.take(packed, gidx.reshape(-1), axis=0)
    x = rows.reshape(t, G, pad_width, group)
    if take is not None and take < pad_width:
        x = x[:, :, :take, :]
        pad_width = take
    out = jnp.transpose(x, (0, 2, 1, 3))
    if flat:
        return out.reshape(t * pad_width, slab)
    return out.reshape(t, pad_width, slab)


def scatter_packed_add_T(cotT, gidx, n_slots, width, pad_width, group):
    """Transpose of gather_packed_T: (t, width, slab) lane-major cotangent ->
    (n_slots, width), avoiding the 128-lane-padded (t, slab, width) form."""
    t, _, slab = cotT.shape
    G = slab // group
    if pad_width > width:
        cotT = jnp.concatenate(
            [cotT, jnp.zeros((t, pad_width - width, slab), cotT.dtype)], axis=1)
    x = cotT.reshape(t, pad_width, G, group)
    rows = jnp.transpose(x, (0, 2, 1, 3)).reshape(t * G, group * pad_width)
    out = jnp.zeros((n_slots // group, group * pad_width), cotT.dtype)
    out = out.at[gidx.reshape(-1)].add(rows)
    # field-major rows -> (n_slots, pad_width) slot-major view
    out = jnp.transpose(out.reshape(n_slots // group, pad_width, group),
                        (0, 2, 1))
    return out.reshape(n_slots, pad_width)[:, :width]


def scatter_packed_raw_T(cotT, gidx, n_rows_src, pad_width, group):
    """Like scatter_packed_add_T but returns the PACKED field-major
    (n_rows_src, group*pad_width) cotangent directly (for packed-source
    operands)."""
    t, width, slab = cotT.shape
    G = slab // group
    if pad_width > width:
        cotT = jnp.concatenate(
            [cotT, jnp.zeros((t, pad_width - width, slab), cotT.dtype)], axis=1)
    x = cotT.reshape(t, pad_width, G, group)
    rows = jnp.transpose(x, (0, 2, 1, 3)).reshape(t * G, group * pad_width)
    out = jnp.zeros((n_rows_src, group * pad_width), cotT.dtype)
    return out.at[gidx.reshape(-1)].add(rows)


def scatter_packed_add(cot, gidx, n_slots, width, pad_width, group):
    """Transpose of gather_packed: (t, slab, width) cotangent -> (n_slots, width)."""
    t, slab = cot.shape[0], cot.shape[1]
    if pad_width > width:
        cot = jnp.concatenate(
            [cot, jnp.zeros(cot.shape[:2] + (pad_width - width,), cot.dtype)], axis=2
        )
    rows = cot.reshape(t * slab // group, group * pad_width)
    out = jnp.zeros((n_slots // group, group * pad_width), cot.dtype)
    out = out.at[gidx.reshape(-1)].add(rows)
    return out.reshape(n_slots, pad_width)[:, :width]


# --------------------------------------------------------------------- moments
def _k1_dispatch(restT_rows, static_slab, static2, pos_packed, gidx8, h,
                 interpret, take=3):
    """Gather the packed position source and run K1 — via the manual-DMA
    kernel when a 2D static slab is available (TPU only), else BlockSpec."""
    slab = static_slab.shape[2]
    t = restT_rows.shape[0]
    # Mosaic DMA rules: 8-sublane-aligned row blocks (t % TBM) and a
    # 128-aligned lane extent (slab % 128; layout pad_groups=16 guarantees it)
    if (static2 is not None and not interpret and pk._K1_MANUAL
            and t % pk._TBM == 0 and slab % 128 == 0):
        pos2 = gather_packed_T(pos_packed, gidx8, slab, 8, take=take, flat=True)
        return pk._moments_fwd_manual(restT_rows, static2, pos2, h)
    pos_slabT = gather_packed_T(pos_packed, gidx8, slab, 8, take=take)
    return pk._moments_fwd_impl(restT_rows, static_slab, pos_slabT, h, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def moments_packed(restT_rows, static_slab, static2, pos_slots, gidx8, h,
                   interpret=False):
    """Raw A/Y moment dots with packed-row slab gather: (t, rows, 18) fused
    [A | Y] in the transposed [3b+a] layout.  pos_slots: (n_slots, 3);
    static_slab: (t, 5, slab) = [restT_3 | mass | vol]; static2: its 2D
    (t*5, slab) flattening (or None), enabling the manual-DMA K1 forward.
    Callers subtract the static-rowsum correction (pos_i x rest row sums) in
    XLA — see elastic_forces_sparse."""
    return _moments_packed_fwd(restT_rows, static_slab, static2,
                               pos_slots, gidx8, h, interpret)[0]


def _moments_packed_fwd(restT_rows, static_slab, static2, pos_slots, gidx8,
                        h, interpret):
    # 8 f/slot (64-float rows): gather cost is per-ROW, so narrower rows halve
    # staged source bytes; the slab then ships LANE-MAJOR (t, 8, slab) — a
    # (slab, 8) pallas operand would be retiled with the minor dim padded to
    # 128 lanes (16x HBM bloat, staged every scan iteration)
    pos_packed = pack_components(
        [pos_slots[:, 0], pos_slots[:, 1], pos_slots[:, 2]], 8, 8)
    out = _k1_dispatch(restT_rows, static_slab, static2, pos_packed, gidx8,
                       h, interpret)
    return out, None


def _moments_packed_vjp_fwd(restT_rows, static_slab, static2, pos_slots,
                            gidx8, h, interpret):
    out, _ = _moments_packed_fwd(restT_rows, static_slab, static2,
                                 pos_slots, gidx8, h, interpret)
    return out, (restT_rows, static_slab, gidx8, pos_slots.shape[0])


def _moments_packed_vjp_bwd(h, interpret, res, day):
    restT_rows, static_slab, gidx8, n_slots = res
    t = restT_rows.shape[0]

    def body(args):
        rr, st, gi, day_c = args
        dpsT_c = pk._moments_vjp_bwd(h, interpret, (rr, st, 3), day_c)[2]
        # outs leaves need a leading chunk dim for _scan_chunks' restacking
        return (scatter_packed_add_T(dpsT_c, gi, n_slots, 3, 8,
                                     dpsT_c.shape[2] // gi.shape[1]),
                jnp.zeros((day_c.shape[0],), day_c.dtype))

    dpos, _ = _scan_chunks(
        body, (restT_rows, static_slab, gidx8, day), t,
        jnp.zeros((n_slots, 3), day.dtype),
    )
    return (None, None, None, dpos, None)


moments_packed.defvjp(_moments_packed_vjp_fwd, _moments_packed_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def moments_packed_src(restT_rows, static_slab, static2, pos_packed, gidx8, h,
                       interpret=False):
    """Like :func:`moments_packed` but takes the PRE-PACKED (n_rows, 64)
    position source (8 f/slot, build with ``pack_components``) directly.

    Used by SPMD shards (parallel/sparse_shard.py) that pack locally and
    all-gather ONE shared source per step; the VJP returns the PACKED source
    cotangent, whose all-gather transpose (psum_scatter) routes each shard's
    contribution home."""
    return _moments_src_fwd(restT_rows, static_slab, static2, pos_packed,
                            gidx8, h, interpret)


def _moments_src_fwd(restT_rows, static_slab, static2, pos_packed, gidx8,
                     h, interpret):
    return _k1_dispatch(restT_rows, static_slab, static2, pos_packed, gidx8,
                        h, interpret)


def _moments_src_vjp_fwd(restT_rows, static_slab, static2, pos_packed, gidx8,
                         h, interpret):
    out = _moments_src_fwd(restT_rows, static_slab, static2, pos_packed,
                           gidx8, h, interpret)
    return out, (restT_rows, static_slab, gidx8, pos_packed.shape[0])


def _moments_src_vjp_bwd(h, interpret, res, day):
    restT_rows, static_slab, gidx8, n_rows_src = res
    t = restT_rows.shape[0]

    def body(args):
        rr, st, gi, day_c = args
        dpsT_c = pk._moments_vjp_bwd(h, interpret, (rr, st, 3), day_c)[2]
        return (scatter_packed_raw_T(dpsT_c, gi, n_rows_src, 8,
                                     dpsT_c.shape[2] // gi.shape[1]),
                jnp.zeros((day_c.shape[0],), day_c.dtype))

    dsrc, _ = _scan_chunks(
        body, (restT_rows, static_slab, gidx8, day), t,
        jnp.zeros((n_rows_src, 64), day.dtype),
    )
    return (None, None, None, dsrc, None)


moments_packed_src.defvjp(_moments_src_vjp_fwd, _moments_src_vjp_bwd)


# ---------------------------------------------- moments (K1, v4 lane-major)
@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def moments_packed_v4(restT_rows, static_slab, pos_packed, posT_rows,
                      rs6T_rows, gidx8, h, interpret=False):
    """CENTERED A/Y moments, LANE-MAJOR output ayT (18, t*rows): row 3b+a is
    the FINAL [A | Y] component in the transposed layout (no -pos_i * rowsum
    correction left for the caller — it happens in-kernel against a per-tile
    shift; see pair_kernels._moments_kernel_v4).

    pos_packed: the (n_rows, 64) packed position source (pack_components,
    8 f/slot).  posT_rows: (3, t*rows) lane-major positions of the tile rows
    (the compact component stack — pack_components' intermediate).
    rs6T_rows: (6, t*rows) lane-major STATIC per-block coefficient rowsums
    (the host-f64 rs6T slice for these tiles) — consumed ONLY by the backward
    kernel's centering-gradient term, never staged on the forward path.

    Gradient-consistency note (ADVICE r4): the custom VJP's centering term
    uses these STATIC rowsums while the forward centers against the in-kernel
    f32 coefficient rowsum, so the backward is the exact gradient of a
    function differing from the forward by ~1e-7 relative (measured; the
    static-rowsum substitution in the FORWARD was what destabilized the quiet
    body, not this).  Finite-difference checks against this op therefore
    bottom out at ~1e-6 relative, not machine epsilon — set gradcheck
    tolerances accordingly."""
    return _moments_v4_fwd(restT_rows, static_slab, pos_packed, posT_rows,
                           rs6T_rows, gidx8, h, interpret)


def _moments_v4_fwd(restT_rows, static_slab, pos_packed, posT_rows,
                    rs6T_rows, gidx8, h, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t, _, rows = restT_rows.shape
    slab = static_slab.shape[2]
    tb = _v4_tb(rows)
    pos_slabT = gather_packed_T(pos_packed, gidx8, slab, 8, take=3)
    extra = (-t) % tb
    t_pad = t + extra
    if extra:
        pad = lambda a: jnp.pad(a, [(0, extra)] + [(0, 0)] * (a.ndim - 1))
        restT_p, static_p, pos_p = (
            pad(restT_rows), pad(static_slab), pad(pos_slabT))
        prow_p = jnp.pad(posT_rows, ((0, 0), (0, extra * rows)))
    else:
        restT_p, static_p, pos_p, prow_p = (
            restT_rows, static_slab, pos_slabT, posT_rows)
    kernel = functools.partial(pk._moments_kernel_v4, h=h, tb=tb)
    out = pl.pallas_call(
        kernel,
        grid=(t_pad // tb,),
        in_specs=[
            pl.BlockSpec((tb, 3, rows), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 5, slab), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 3, slab), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tb * rows), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((18, tb * rows), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((18, t_pad * rows), restT_rows.dtype),
        interpret=pk._interpret_default() if interpret is None else interpret,
    )(restT_p, static_p, pos_p, prow_p)
    return out[:, :t * rows]


def _moments_v4_vjp_fwd(restT_rows, static_slab, pos_packed, posT_rows,
                        rs6T_rows, gidx8, h, interpret):
    out = _moments_v4_fwd(restT_rows, static_slab, pos_packed, posT_rows,
                          rs6T_rows, gidx8, h, interpret)
    return out, (restT_rows, static_slab, rs6T_rows, gidx8,
                 pos_packed.shape[0])


def _moments_v4_bwd_impl(restT_rows, static_slab, dayT, rs6T_rows, h,
                         interpret):
    """dayT (18, chunk*rows) -> (dpsT (chunk, 3, slab), dprowT (3, chunk*rows))
    via the v4 bwd kernel."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t, _, rows = restT_rows.shape
    slab = static_slab.shape[2]
    tb = _v4_tb(rows)
    extra = (-t) % tb
    t_pad = t + extra
    if extra:
        pad = lambda a: jnp.pad(a, [(0, extra)] + [(0, 0)] * (a.ndim - 1))
        restT_p, static_p = pad(restT_rows), pad(static_slab)
        dayT_p = jnp.pad(dayT, ((0, 0), (0, extra * rows)))
        rs6_p = jnp.pad(rs6T_rows, ((0, 0), (0, extra * rows)))
    else:
        restT_p, static_p, dayT_p, rs6_p = (restT_rows, static_slab, dayT,
                                            rs6T_rows)
    kernel = functools.partial(pk._moments_bwd_kernel_v4, h=h, tb=tb)
    dps, dprowT = pl.pallas_call(
        kernel,
        grid=(t_pad // tb,),
        in_specs=[
            pl.BlockSpec((tb, 3, rows), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 5, slab), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((18, tb * rows), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, tb * rows), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tb, 3, slab), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tb * rows), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, 3, slab), dayT.dtype),
            jax.ShapeDtypeStruct((3, t_pad * rows), dayT.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((3, 6 * rows), dayT.dtype)],
        interpret=pk._interpret_default() if interpret is None else interpret,
    )(restT_p, static_p, dayT_p, rs6_p)
    return dps[:t], dprowT[:, :t * rows]


def _moments_v4_vjp_bwd(h, interpret, res, dayT):
    restT_rows, static_slab, rs6T_rows, gidx8, n_rows_src = res
    t, _, rows = restT_rows.shape

    # chunk over tiles: slice dayT's lane axis per chunk (backward-only
    # relayout of the compact (18, m) array)
    ch = min(_BWD_TILE_CHUNK, t)
    n_chunks = -(-t // ch)
    t_pad = n_chunks * ch

    def prep(a):
        if t_pad > t:
            a = jnp.pad(a, [(0, t_pad - t)] + [(0, 0)] * (a.ndim - 1))
        return a.reshape((n_chunks, ch) + a.shape[1:])

    def prep_T(a):
        if t_pad > t:
            a = jnp.pad(a, ((0, 0), (0, (t_pad - t) * rows)))
        return jnp.transpose(
            a.reshape(a.shape[0], n_chunks, ch * rows), (1, 0, 2))

    stacked = (prep(restT_rows), prep(static_slab), prep(gidx8),
               prep_T(dayT), prep_T(rs6T_rows))

    def scan_body(acc, args):
        rr, st, gi, day_c, rs6_c = args
        dpsT_c, dprowT_c = _moments_v4_bwd_impl(rr, st, day_c, rs6_c, h,
                                                interpret)
        return (acc + scatter_packed_raw_T(dpsT_c, gi, n_rows_src, 8,
                                           dpsT_c.shape[2] // gi.shape[1]),
                dprowT_c)

    # packed-source row width follows the layout group (8 f/slot positions):
    # group 8 -> 64-float rows, group 16 -> 128
    gsz = static_slab.shape[2] // gidx8.shape[1]
    acc, dprow_st = jax.lax.scan(
        scan_body, jnp.zeros((n_rows_src, gsz * 8), dayT.dtype), stacked)
    m = t * rows
    dprowT = jnp.transpose(dprow_st, (1, 0, 2)).reshape(3, t_pad * rows)[:, :m]
    return (None, None, acc, dprowT, None, None)


moments_packed_v4.defvjp(_moments_v4_vjp_fwd, _moments_v4_vjp_bwd)


# ------------------------------------------------------- fused K1 + mid-section
def _mid_xla(ay, dyn, stat, corotated, sweeps):
    """XLA reference of the fused kernel's epilogue: (t, rows, {18, 4, 18}) ->
    (fm (t, rows, 19), sr (t, rows, 16)).  Used by the fused kernel's VJP (the
    backward differentiates THIS, with the kernel's raw dots as residual) and
    by parity tests."""
    from .. import mat3
    from ...sim.blocked import stvk_stress_m3

    t, rows, _ = ay.shape
    m = t * rows
    ay2 = ay.reshape(m, 18)
    dyn2 = dyn.reshape(m, 4)
    st2 = stat.reshape(m, 18)
    pos = [dyn2[:, a] for a in range(3)]
    scale = dyn2[:, 3]
    A = mat3.pack([[ay2[:, 3 * b + a] - pos[a] * st2[:, b] for b in range(3)]
                   for a in range(3)])
    Y = mat3.pack([[ay2[:, 3 * (3 + b) + a] - pos[a] * st2[:, 3 + b]
                    for b in range(3)] for a in range(3)])
    mu, lam, vol = st2[:, 6], st2[:, 7], st2[:, 8]
    rc = mat3.pack([[st2[:, 9 + 3 * a + b] for b in range(3)] for a in range(3)])
    if corotated:
        R = mat3.polar3(A, sweeps)
        nab = mat3.matTmul3(R, Y) - rc
    else:
        R = mat3.eye3(A)
        nab = Y - rc
    F = mat3.eye3(A) + mat3.transpose3(nab)
    S = stvk_stress_m3(F, mu, lam, scale)
    M = mat3.matmul3(R, mat3.matmul3(F, S))
    fm = jnp.stack(
        [F[a, b] for a in range(3) for b in range(3)]
        + [M[a, b] for a in range(3) for b in range(3)] + [vol], axis=-1)
    zero = jnp.zeros_like(vol)
    sr = jnp.stack(
        [S[0, 0], S[0, 1], S[0, 2], S[1, 1], S[1, 2], S[2, 2]]
        + [R[a, c] for c in range(3) for a in range(3)] + [zero], axis=-1)
    return fm.reshape(t, rows, 19), sr.reshape(t, rows, 16)


def _fused_call(restT_rows, static_slab, pos_packed, gidx8,
                stat_rows, dyn_rows, h, corotated, sweeps, interpret, emit_ay):
    from jax.experimental import pallas as pl

    t, _, rows = restT_rows.shape
    slab = static_slab.shape[2]
    pos_slabT = gather_packed_T(pos_packed, gidx8, slab, 8, take=3)
    kernel = pk._batched(
        functools.partial(pk._moments_mid_kernel, h=h, corotated=corotated,
                          sweeps=sweeps), 7 + emit_ay)
    args, t_pad = pk._pad_tiles(
        [restT_rows, static_slab, pos_slabT, stat_rows, dyn_rows], t)
    out_shapes = [
        jax.ShapeDtypeStruct((t_pad, rows, 19), restT_rows.dtype),
        jax.ShapeDtypeStruct((t_pad, rows, 16), restT_rows.dtype),
    ]
    out_specs = pk._tile_specs([(rows, 19), (rows, 16)])
    if emit_ay:
        out_shapes.append(jax.ShapeDtypeStruct((t_pad, rows, 18), restT_rows.dtype))
        out_specs = pk._tile_specs([(rows, 19), (rows, 16), (rows, 18)])
    outs = pl.pallas_call(
        kernel,
        grid=(t_pad // pk._TILE_BATCH,),
        in_specs=pk._tile_specs([
            (3, rows), (5, slab), (3, slab),
            (rows, 18), (rows, 4),
        ]),
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(*args)
    return tuple(o[:t] for o in outs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def fused_k1mid(restT_rows, static_slab, pos_packed, gidx8,
                stat_rows, dyn_rows, h, corotated=True, sweeps=8,
                interpret=False):
    """Fused K1 + mid-section (ops/pallas/pair_kernels._moments_mid_kernel).

    Differentiable wrt ``pos_packed`` (neighbor slab side) and ``dyn_rows``
    ([pos_i | stiffness scale] — the row side and the design variable's
    path).  The VJP reconstructs the mid-section in XLA from the kernel's raw
    moment dots (residual ``ay``), differentiates that, then routes ``day``
    through the linear moments-backward kernel."""
    fm, sr = _fused_call(restT_rows, static_slab,
                         pos_packed, gidx8, stat_rows, dyn_rows,
                         h, corotated, sweeps, interpret, emit_ay=False)
    return fm, sr


def _fused_vjp_fwd(restT_rows, static_slab, pos_packed,
                   gidx8, stat_rows, dyn_rows, h, corotated, sweeps, interpret):
    fm, sr, ay = _fused_call(restT_rows, static_slab,
                             pos_packed, gidx8, stat_rows, dyn_rows,
                             h, corotated, sweeps, interpret, emit_ay=True)
    res = (restT_rows, static_slab, gidx8,
           pos_packed.shape[0], stat_rows, dyn_rows, ay)
    return (fm, sr), res


def _fused_vjp_bwd(h, corotated, sweeps, interpret, res, cots):
    (restT_rows, static_slab, gidx8, n_rows_src,
     stat_rows, dyn_rows, ay) = res
    dfm, dsr = cots

    def g(ay_, dyn_):
        return _mid_xla(ay_, dyn_, stat_rows, corotated, sweeps)

    _, vjp = jax.vjp(g, ay, dyn_rows)
    day, ddyn = vjp((dfm, dsr))

    t = restT_rows.shape[0]

    def body(args):
        rr, st, gi, day_c = args
        dpsT_c = pk._moments_vjp_bwd(h, interpret, (rr, st, 3), day_c)[2]
        return (scatter_packed_raw_T(dpsT_c, gi, n_rows_src, 8,
                                     dpsT_c.shape[2] // gi.shape[1]),
                jnp.zeros((day_c.shape[0],), day_c.dtype))

    dpos_packed, _ = _scan_chunks(
        body, (restT_rows, static_slab, gidx8, day), t,
        jnp.zeros((n_rows_src, 64), day.dtype),
    )
    return (None, None, dpos_packed, None, None, ddyn)


fused_k1mid.defvjp(_fused_vjp_fwd, _fused_vjp_bwd)


# --------------------------------------------------------------------- forces (separable)
@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def forces_packed(restT_rows, static_slab, g_rows, g_slots, vol_rows,
                  gidx8, h, interpret=False):
    """Separable forces with packed-row G gather.  g_slots: (n_slots, 9);
    static_slab: (t, 5, slab) = [restT_3 | mass | vol]."""
    return _forces_packed_fwd(restT_rows, static_slab, g_rows, g_slots,
                              vol_rows, gidx8, h, interpret)


def _forces_packed_fwd(restT_rows, static_slab, g_rows, g_slots,
                       vol_rows, gidx8, h, interpret):
    slab = static_slab.shape[2]
    g_slab16 = gather_packed(pack(g_slots, 9, 16, 8), gidx8, slab, 16)
    return pk._forces_fwd_impl(restT_rows, static_slab, g_rows,
                               g_slab16, vol_rows, h, interpret)


def _forces_packed_vjp_fwd(restT_rows, static_slab, g_rows, g_slots,
                           vol_rows, gidx8, h, interpret):
    out = _forces_packed_fwd(restT_rows, static_slab, g_rows, g_slots,
                             vol_rows, gidx8, h, interpret)
    return out, (restT_rows, static_slab, vol_rows, gidx8,
                 g_slots.shape[0])


def _forces_packed_vjp_bwd(h, interpret, res, df):
    restT_rows, static_slab, vol_rows, gidx8, n_slots = res
    t = restT_rows.shape[0]

    def body(args):
        rr, st, vr, gi, df_c = args
        dgr_c, dgs_c = pk._forces_vjp_bwd(h, interpret, (rr, st, vr), df_c)[2:4]
        return scatter_packed_add(dgs_c, gi, n_slots, 9, 16, 8), dgr_c

    dg_slots, dgr = _scan_chunks(
        body, (restT_rows, static_slab, vol_rows, gidx8, df), t,
        jnp.zeros((n_slots, 9), df.dtype),
    )
    return (None, None, dgr, dg_slots, None, None)


forces_packed.defvjp(_forces_packed_vjp_fwd, _forces_packed_vjp_bwd)


# --------------------------------------------------------------------- forces (warp)
@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def forces_warp_packed(restT_rows, static_slab, fm_rows,
                       sr_packed, gidx8, h, interpret=False, chunks=None):
    """Warp-mode forces.

    static_slab (t, 5, slab): [restT_3 | mass | vol] (mass row unused here).
    fm_rows (t, rows, 19): fused per-row operand [F_9 | M_9 | V_i] (each
    separate (rows, k<128) pallas operand pays its own 128-lane retiling +
    per-iteration staging).
    sr_packed (n_slots/8, 128): 16f/slot packed gather source of the fused
    per-slot record [S_6 | R_9^T | pad] (build with pack_components):
      S symmetric as [s00 s01 s02 s11 s12 s22] (kernels remap via _SYM6);
      R transposed ([3c+a] = R[a, c]) so matmul extraction is contiguous.
    ONE gather via gidx8; the slab ships pre-transposed by XLA and the
    in-kernel matmul runs against it directly.
    """
    return _forces_warp_packed_fwd(restT_rows, static_slab, fm_rows,
                                   sr_packed, gidx8, h, interpret, chunks)


def _forces_warp_packed_fwd(restT_rows, static_slab, fm_rows,
                            sr_packed, gidx8, h, interpret, chunks=None):
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    t, _, rows = restT_rows.shape
    slab = static_slab.shape[2]
    srT_slab = gather_packed_T(sr_packed, gidx8, slab, 16)
    kernel = pk._batched(
        functools.partial(pk._forces_warp_kernel_v2, h=h,
                          chunks=chunks or pk._WARP_CHUNKS), 5)
    args, t_pad = pk._pad_tiles(
        [restT_rows, static_slab, fm_rows, srT_slab], t)
    out = pl.pallas_call(
        kernel,
        grid=(t_pad // pk._TILE_BATCH,),
        in_specs=pk._tile_specs([
            (3, rows), (5, slab), (rows, 19), (16, slab),
        ]),
        out_specs=pk._tile_specs([(rows, 3)])[0],
        out_shape=jax.ShapeDtypeStruct((t_pad, rows, 3), fm_rows.dtype),
        interpret=interpret,
    )(*args)
    return out[:t]


def _forces_warp_packed_vjp_fwd(restT_rows, static_slab, fm_rows,
                                sr_packed, gidx8, h, interpret, chunks=None):
    out = _forces_warp_packed_fwd(restT_rows, static_slab, fm_rows,
                                  sr_packed, gidx8, h, interpret, chunks)
    return out, (restT_rows, static_slab, fm_rows, sr_packed, gidx8)


def _forces_warp_packed_vjp_bwd(h, interpret, chunks, res, df):
    restT_rows, static_slab, fm_rows, sr_packed, gidx8 = res
    t, _, rows = restT_rows.shape
    slab = static_slab.shape[2]
    n_rows_src = sr_packed.shape[0]

    def body(args):
        rr, st, fm_c, gi, df_c = args
        # the backward kernel needs the lane-major slab: regather (packed,
        # chunked) + XLA transpose — backward pays the relayout, forward
        # stays bandwidth-fast
        srT = gather_packed_T(sr_packed, gi, slab, 16)
        dfm_c, dsT6_c, drT_c = pk._forces_warp_bwd_impl(
            rr, st, fm_c, srT, df_c, h, interpret,
            chunks or pk._WARP_CHUNKS,
        )
        dsrT_c = jnp.concatenate([dsT6_c, drT_c], axis=1)   # (chunk, 15, slab)
        return (scatter_packed_raw_T(dsrT_c, gi, n_rows_src, 16,
                                    dsrT_c.shape[2] // gi.shape[1]), dfm_c)

    dsr_packed, dfm = _scan_chunks(
        body, (restT_rows, static_slab, fm_rows, gidx8, df), t,
        jnp.zeros((n_rows_src, 128), df.dtype),
    )
    # cotangent dtype must match the (possibly bf16) primal source
    return (None, None, dfm, dsr_packed.astype(sr_packed.dtype), None)


forces_warp_packed.defvjp(_forces_warp_packed_vjp_fwd, _forces_warp_packed_vjp_bwd)


# ----------------------------------------------- forces (warp, v4 lane-major)
def _v4_tb(rows: int) -> int:
    """v4 row-side blocks must span tb*rows = 128 lanes."""
    assert 128 % rows == 0, f"v4 needs rows dividing 128, got {rows}"
    return 128 // rows


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def forces_warp_packed_v4(restT_rows, static_slab, f9T, sr_packed, gidx8,
                          h, interpret=False, chunks=None):
    """Warp-mode termj with LANE-MAJOR row operands (pair_kernels v4).

    f9T: (9, t*rows) lane-major deformation gradient (row 3c+d = F_i[c, d]).
    Returns fT (3, t*rows) — the 0.5*V_i scale and the term_i
    (M_i sum_j V_j grad W, a REST-STATIC row sum) are applied by the caller
    in XLA.
    """
    return _forces_warp_v4_fwd(restT_rows, static_slab, f9T, sr_packed,
                               gidx8, h, interpret, chunks)


def _forces_warp_v4_fwd(restT_rows, static_slab, f9T, sr_packed, gidx8,
                        h, interpret, chunks=None):
    slab = static_slab.shape[2]
    srT_slab = gather_packed_T(sr_packed, gidx8, slab, 16)
    return _forces_warp_v4_fwd_srT(restT_rows, static_slab, f9T, srT_slab,
                                   h, interpret, chunks)


def _forces_warp_v4_fwd_srT(restT_rows, static_slab, f9T, srT_slab,
                            h, interpret, chunks=None):
    """v4 forward on a PRE-GATHERED lane-major srT slab (t, 16, slab)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t, _, rows = restT_rows.shape
    slab = static_slab.shape[2]
    tb = _v4_tb(rows)
    # pad the tile count to a tb multiple (zero rest coords -> inert tiles)
    extra = (-t) % tb
    t_pad = t + extra
    if extra:
        pad = lambda a: jnp.pad(a, [(0, extra)] + [(0, 0)] * (a.ndim - 1))
        restT_p, static_p, srT_p = (
            pad(restT_rows), pad(static_slab), pad(srT_slab))
        f9T_p = jnp.pad(f9T, ((0, 0), (0, extra * rows)))
    else:
        restT_p, static_p, srT_p, f9T_p = (
            restT_rows, static_slab, srT_slab, f9T)
    kernel = functools.partial(
        pk._forces_warp_kernel_v4, h=h,
        chunks=chunks or pk._WARP_CHUNKS, tb=tb)
    out = pl.pallas_call(
        kernel,
        grid=(t_pad // tb,),
        in_specs=[
            pl.BlockSpec((tb, 3, rows), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 5, slab), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, tb * rows), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 16, slab), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, tb * rows), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, t_pad * rows), f9T.dtype),
        interpret=pk._interpret_default() if interpret is None else interpret,
    )(restT_p, static_p, f9T_p, srT_p)
    return out[:, :t * rows]


def _forces_warp_v4_vjp_fwd(restT_rows, static_slab, f9T, sr_packed, gidx8,
                            h, interpret, chunks=None):
    # gather ONCE and keep the lane-major slab as a residual: the backward
    # kernel consumes exactly this array, and re-gathering it there (the
    # round-3/4 wiring) re-paid the full packed gather + transpose per step on
    # the gradient path (the dominant dynamic operand — (t, 16, slab), ~141 MB
    # at 100k).  Under per-step remat the residual's lifetime is only
    # recompute -> K2-backward, so peak HBM is unchanged.
    slab = static_slab.shape[2]
    srT_slab = gather_packed_T(sr_packed, gidx8, slab, 16)
    out = _forces_warp_v4_fwd_srT(restT_rows, static_slab, f9T, srT_slab,
                                  h, interpret, chunks)
    return out, (restT_rows, static_slab, f9T, srT_slab, gidx8,
                 sr_packed.shape[0])


def _forces_warp_v4_vjp_bwd(h, interpret, chunks, res, dfT):
    """v4 backward: lane-major end to end via the v4-native backward kernel
    (pair_kernels._forces_warp_bwd_kernel_v4).  No (t, rows, 19)-class HBM
    operands, no XLA-side row relayouts — dfT/f9T slice along lanes per tile
    chunk and df9T assembles by lane-axis concat."""
    restT_rows, static_slab, f9T, srT_slab, gidx8, n_rows_src = res
    sr_dtype = srT_slab.dtype
    t, _, rows = restT_rows.shape
    slab = static_slab.shape[2]
    m = t * rows
    dtype = dfT.dtype
    tb = _v4_tb(rows)

    # chunk over tiles (VMEM-bounded backward); chunk must be a tb multiple
    ch = min(_BWD_TILE_CHUNK, t)
    ch += (-ch) % tb
    n_chunks = -(-t // ch)
    t_pad = n_chunks * ch

    def prep(a):
        if t_pad > t:
            a = jnp.pad(a, [(0, t_pad - t)] + [(0, 0)] * (a.ndim - 1))
        return a.reshape((n_chunks, ch) + a.shape[1:])

    def prep_T(a):
        if t_pad > t:
            a = jnp.pad(a, ((0, 0), (0, (t_pad - t) * rows)))
        return jnp.transpose(
            a.reshape(a.shape[0], n_chunks, ch * rows), (1, 0, 2))

    stacked = (prep(restT_rows), prep(static_slab), prep(gidx8),
               prep(srT_slab), prep_T(f9T), prep_T(dfT))

    def scan_body(acc, args):
        rr, st, gi, srT, f9T_c, dfT_c = args
        df9T_c, dsrT_c = pk._forces_warp_bwd_v4_impl(
            rr, st, f9T_c, srT, dfT_c, h, interpret,
            chunks or pk._WARP_CHUNKS,
        )
        return (acc + scatter_packed_raw_T(dsrT_c, gi, n_rows_src, 16,
                                           dsrT_c.shape[2] // gi.shape[1]),
                df9T_c)

    # 16 f/slot S|R records: group 8 -> 128-float rows, group 16 -> 256
    gsz = slab // gidx8.shape[1]
    dsr_packed, df9T_st = jax.lax.scan(
        scan_body, jnp.zeros((n_rows_src, gsz * 16), dtype), stacked)
    df9T = jnp.transpose(df9T_st, (1, 0, 2)).reshape(9, t_pad * rows)[:, :m]
    return (None, None, df9T, dsr_packed.astype(sr_dtype), None)


forces_warp_packed_v4.defvjp(_forces_warp_v4_vjp_fwd, _forces_warp_v4_vjp_bwd)
