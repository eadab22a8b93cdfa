"""v6 window-DMA pair kernels: gather-free slab movement.

The sparse path (ops/pallas/packed.py) moves every dynamic slab byte ~4x:
XLA gather writes packed rows, a lane-major transpose rewrites them, and the
BlockSpec pipeline stages the result (measured 2.6 ms/step of XLA glue at
100k).  These kernels instead DMA, per tile, NINE contiguous per-column slot
windows (topology/windows.py) straight from lane-major (k, n_slots) HBM
sources into VMEM scratch — each dynamic byte moves HBM->VMEM exactly once,
and the gather, the transpose, and the per-tile gidx/static-slab arrays all
disappear.

Source layouts (built per step in sim/windows.py):

  k1src (8, n_slots):  [posT_3 | restT_3 | mass | vol]
  k2src (20, n_slots): [S_6 | R^T_9 | restT_3 | mass | vol]

Window offsets are scalar-prefetched (t_b, 9) int32 slot positions, 8-aligned,
with STATIC per-bucket lengths (layout.windows).  Out-of-window slots inside
the same column are exactly inert: the cubic-spline support ends at 2h = the
layout reach, so any real particle beyond reach contributes zero (see the
inertness argument in topology/windows.py).

Backward: the forward's window reads transpose into OVERLAPPING scatter-adds,
which a per-tile kernel cannot express race-free; the VJPs run a window-DMA
backward kernel (same staging as forward) and scatter the per-tile cotangent
slabs in XLA as packed 8-slot group rows (indices static per bucket).

Replaces reference kernels sim.py:170-235 (compute_A_pq / compute_nabla_u /
compute_elastic_forces) on the TPU window path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pair_kernels as pk

K1_ROWS = 8    # posT_3 | restT_3 | mass | vol
K2_ROWS = 20   # S_6 | R^T_9 | restT_3 | mass | vol
_SYM6 = pk._SYM6


def _win_dsts(windows):
    d, out = 0, []
    for w in windows:
        out.append(d)
        d += w
    return tuple(out), d


def _copies(offs_ref, i, src_ref, buf, sems, windows, dsts):
    return [
        pltpu.make_async_copy(
            src_ref.at[:, pl.ds(offs_ref[i, k], w)],
            buf.at[:, pl.ds(d, w)],
            sems.at[k],
        )
        for k, (w, d) in enumerate(zip(windows, dsts))
    ]


def _dma_windows(offs_ref, i, src_ref, buf, sems, windows, dsts):
    for c in _copies(offs_ref, i, src_ref, buf, sems, windows, dsts):
        c.start()
    for c in _copies(offs_ref, i, src_ref, buf, sems, windows, dsts):
        c.wait()


def _double_buffered(offs_ref, src_ref, buf, sems, windows, dsts, body):
    """Classic two-slot DMA pipeline: tile i+1's windows stream in while tile
    i computes.  buf: (2, k, SL) scratch; sems: (2, 9).  The body runs twice
    under parity predicates so every buffer index stays STATIC (Mosaic has no
    dynamic-sublane compute reads)."""
    i = pl.program_id(0)
    nt = pl.num_programs(0)

    @pl.when(i == 0)
    def _prologue():
        for c in _copies(offs_ref, i, src_ref, buf.at[0], sems.at[0],
                         windows, dsts):
            c.start()

    @pl.when(i + 1 < nt)
    def _prefetch():
        for par in (0, 1):
            @pl.when((i + 1) % 2 == par)
            def _(par=par):
                for c in _copies(offs_ref, i + 1, src_ref, buf.at[par],
                                 sems.at[par], windows, dsts):
                    c.start()

    for par in (0, 1):
        @pl.when(i % 2 == par)
        def _(par=par):
            for c in _copies(offs_ref, i, src_ref, buf.at[par], sems.at[par],
                             windows, dsts):
                c.wait()
            body(buf[par])


# ============================================================ K1 (moments)
def _moments_win_kernel(offs_ref, src_any_ref, own_ref, ay_ref, buf, sems,
                        *, h, windows, dsts):
    own = own_ref[0]                 # (8, rows)
    rr = own[3:6]                    # (3, rows) restT of the tile's own rows
    rows = rr.shape[1]

    def body(bufp):
        dx, w, gfac = pk._pair_coeffs(rr, bufp[3:6], h)
        cA = w * bufp[6:7]           # (rows, SL)
        gv = gfac * bufp[7:8]
        lhs = jnp.concatenate(
            [cA * (-dx[b]) for b in range(3)] + [gv * dx[b] for b in range(3)],
            axis=0)
        dots = pk._dot_t(lhs, bufp[0:3])  # (6 rows, 3)
        ay_ref[0] = jnp.concatenate(
            [dots[b * rows:(b + 1) * rows, :3] for b in range(6)], axis=1)

    _double_buffered(offs_ref, src_any_ref, buf, sems, windows, dsts, body)


def _moments_win_bwd_kernel(offs_ref, src_any_ref, own_ref, day_ref,
                            dpsT_ref, buf, sems, *, h, windows, dsts):
    """d pos window slab (3, SL) from day (rows, 18) — window-DMA version of
    pair_kernels._moments_bwd_kernel (stages the static rows by DMA too)."""
    own = own_ref[0]
    rr = own[3:6]
    rows = rr.shape[1]
    day = day_ref[0]                 # (rows, 18)

    def body(bufp):
        dx, w, gfac = pk._pair_coeffs(rr, bufp[3:6], h)
        cA = w * bufp[6:7]
        gv = gfac * bufp[7:8]
        lhs = jnp.concatenate(
            [cA * (-dx[b]) for b in range(3)] + [gv * dx[b] for b in range(3)],
            axis=0)
        cts = jnp.concatenate(
            [jnp.stack([day[:, 3 * blk + a] for a in range(3)], axis=1)
             for blk in range(6)], axis=0)                # (6 rows, 3)
        dpsT_ref[0] = pk._dot_rows(cts, lhs)              # (3, SL)

    _double_buffered(offs_ref, src_any_ref, buf, sems, windows, dsts, body)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def moments_win(k1src, own_rows, offs, tile_start, windows, h, interpret=False):
    """Raw moment dots over window slabs: (t_b, rows, 18) = [A | Y] in the
    transposed [3b+a] layout (correction subtracted in XLA by the caller).

    k1src: (8, n_slots) lane-major source (differentiable rows 0:3 = posT).
    own_rows: (t_all, 11, rows) static per-tile own-block (posT rows unused —
    carried zero; restT rows used for dx).  offs: (t_b, 9) int32.
    """
    return _moments_win_fwd(k1src, own_rows, offs, tile_start, windows, h,
                            interpret)


def _moments_win_fwd(k1src, own_rows, offs, tile_start, windows, h, interpret):
    t_b = offs.shape[0]
    rows = own_rows.shape[2]
    dsts, SL = _win_dsts(windows)
    kernel = functools.partial(_moments_win_kernel, h=h, windows=windows,
                               dsts=dsts)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t_b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, K1_ROWS, rows),
                         lambda i, offs: (tile_start + i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows, 18), lambda i, offs: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, K1_ROWS, SL), k1src.dtype),
            pltpu.SemaphoreType.DMA((2, len(windows))),
        ],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t_b, rows, 18), k1src.dtype),
        interpret=interpret,
    )(offs, k1src, own_rows)


def _moments_win_vjp_fwd(k1src, own_rows, offs, tile_start, windows, h,
                         interpret):
    out = _moments_win_fwd(k1src, own_rows, offs, tile_start, windows, h,
                           interpret)
    return out, (k1src, own_rows, offs)


def _moments_win_vjp_bwd(tile_start, windows, h, interpret, res, day):
    k1src, own_rows, offs = res
    t_b = offs.shape[0]
    rows = own_rows.shape[2]
    dsts, SL = _win_dsts(windows)
    kernel = functools.partial(_moments_win_bwd_kernel, h=h, windows=windows,
                               dsts=dsts)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t_b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, K1_ROWS, rows),
                         lambda i, offs: (tile_start + i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, 18), lambda i, offs: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, SL), lambda i, offs: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, K1_ROWS, SL), k1src.dtype),
            pltpu.SemaphoreType.DMA((2, len(windows))),
        ],
    )
    dpsT = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t_b, 3, SL), day.dtype),
        interpret=interpret,
    )(offs, k1src, own_rows, day)
    dsrc = scatter_windows_add(dpsT, offs, windows, k1src.shape[1], K1_ROWS,
                               take=3)
    return (dsrc, None, None)


moments_win.defvjp(_moments_win_vjp_fwd, _moments_win_vjp_bwd)


def scatter_windows_add(cotT, offs, windows, n_slots, src_rows, take):
    """(t_b, take, SL) lane-major window cotangents -> (src_rows, n_slots)
    source cotangent (zero outside rows [0, take)).

    Scatters as packed 8-slot GROUP rows: window offsets are 8-aligned and
    lengths are 8-multiples, so every window is a whole number of groups;
    rows of take*8 floats keep the XLA scatter at row (not element)
    granularity."""
    t_b, _, SL = cotT.shape
    G = SL // 8
    # group ids per window position (t_b, G)
    parts = [offs[:, k:k + 1] // 8 + jnp.arange(w // 8, dtype=offs.dtype)[None]
             for k, w in enumerate(windows)]
    gids = jnp.concatenate(parts, axis=1)                     # (t_b, G)
    # (t_b, take, G, 8) -> rows (t_b*G, take*8)
    x = cotT.reshape(t_b, take, G, 8)
    rows_ = jnp.transpose(x, (0, 2, 1, 3)).reshape(t_b * G, take * 8)
    out = jnp.zeros((n_slots // 8, take * 8), cotT.dtype)
    out = out.at[gids.reshape(-1)].add(rows_)
    # field-major group rows -> (take, n_slots)
    out = jnp.transpose(out.reshape(n_slots // 8, take, 8), (1, 0, 2))
    out = out.reshape(take, n_slots)
    if src_rows > take:
        out = jnp.concatenate(
            [out, jnp.zeros((src_rows - take, n_slots), cotT.dtype)], axis=0)
    return out


# ============================================================ K2 (warp forces)
def _forces_win_kernel(offs_ref, src_any_ref, own_ref, fm_ref, f_ref, buf,
                       sems, *, h, windows, dsts):
    """Warp pairing over window slabs (see pair_kernels._forces_warp_kernel_v2;
    buf rows: 0:6 S, 6:15 R^T, 15:18 restT, 18 mass, 19 vol)."""
    own = own_ref[0]
    rr = own[3:6]
    fm = fm_ref[...]                  # (19, rows) LANE-MAJOR [F_9 | M_9 | V_i]
    rows = rr.shape[1]
    f32 = rr.dtype
    vol_rows = fm[18][:, None]

    def body(bufp):
        termj = jnp.zeros((rows, 3), f32)
        svnw = [jnp.zeros_like(vol_rows) for _ in range(3)]
        for k, (w, d) in enumerate(zip(windows, dsts)):
            rs = bufp[15:18, d:d + w]
            dx, gfac = pk._pair_coeffs_g(rr, rs, h)
            gv = gfac * bufp[19:20, d:d + w]             # V_j folded
            sT = bufp[0:15, d:d + w].astype(f32)
            nw = [gv * dx[b] for b in range(3)]
            z = [sum(nw[b] * sT[_SYM6[3 * dd + b]:_SYM6[3 * dd + b] + 1, :]
                     for b in range(3)) for dd in range(3)]
            u_stack = jnp.concatenate(
                [sum(fm[3 * c + dd][:, None] * z[dd]
                     for dd in range(3)) for c in range(3)], axis=0)
            dots = jax.lax.dot_general(
                u_stack, sT[6:15], (((1,), (1,)), ((), ())),
                preferred_element_type=f32)              # (3 rows, 9)
            for c in range(3):
                termj = termj + dots[c * rows:(c + 1) * rows, 3 * c:3 * c + 3]
            for b in range(3):
                svnw[b] = svnw[b] + jnp.sum(nw[b], axis=1, keepdims=True)
        term_i = jnp.concatenate(
            [sum(fm[9 + 3 * a + b][:, None] * svnw[b] for b in range(3))
             for a in range(3)], axis=1)
        f_ref[0] = 0.5 * vol_rows * (termj + term_i)

    _double_buffered(offs_ref, src_any_ref, buf, sems, windows, dsts, body)


def _forces_win_bwd_kernel(offs_ref, src_any_ref, own_ref, fm_ref, df_ref,
                           dfm_ref, dsrT_ref, buf, sems,
                           *, h, windows, dsts):
    """Backward of _forces_win_kernel: dfm (rows, 19) and the fused window
    cotangent dsrT (15, SL) = [dS_6 | dR^T_9]."""
    own = own_ref[0]
    rr = own[3:6]
    fm = fm_ref[...]                  # (19, rows) LANE-MAJOR
    vol_rows = fm[18][:, None]
    df = df_ref[0] * (0.5 * vol_rows)
    rows = rr.shape[1]
    f32 = rr.dtype

    def body(bufp):
        svnw = [jnp.zeros_like(vol_rows) for _ in range(3)]
        df9_acc = [jnp.zeros_like(vol_rows) for _ in range(9)]
        for k, (w, d) in enumerate(zip(windows, dsts)):
            rs = bufp[15:18, d:d + w]
            dx, gfac = pk._pair_coeffs_g(rr, rs, h)
            gv = gfac * bufp[19:20, d:d + w]
            sT = bufp[0:15, d:d + w].astype(f32)
            nw = [gv * dx[b] for b in range(3)]
            z = [sum(nw[b] * sT[_SYM6[3 * dd + b]:_SYM6[3 * dd + b] + 1, :]
                     for b in range(3)) for dd in range(3)]
            for b in range(3):
                svnw[b] = svnw[b] + jnp.sum(nw[b], axis=1, keepdims=True)
            u_stack = jnp.concatenate(
                [sum(fm[3 * c + dd][:, None] * z[dd] for dd in range(3))
                 for c in range(3)], axis=0)
            wprime = []
            for c in range(3):
                contrib = pk._dot_rows(df, u_stack[c * rows:(c + 1) * rows])
                dsrT_ref[0, 6 + 3 * c:9 + 3 * c, d:d + w] = contrib
                wprime.append(
                    sum(df[:, a: a + 1] * sT[6 + 3 * c + a:7 + 3 * c + a, :]
                        for a in range(3)))
            y = []
            for dd in range(3):
                for c in range(3):
                    df9_acc[3 * c + dd] = df9_acc[3 * c + dd] + jnp.sum(
                        z[dd] * wprime[c], axis=1, keepdims=True)
                y.append(sum(fm[3 * c + dd][:, None] * wprime[c]
                             for c in range(3)))
            ds6 = [None] * 6
            for dd in range(3):
                for b in range(3):
                    k6 = _SYM6[3 * dd + b]
                    term = jnp.sum(nw[b] * y[dd], axis=0, keepdims=True)
                    ds6[k6] = term if ds6[k6] is None else ds6[k6] + term
            dsrT_ref[0, 0:6, d:d + w] = jnp.concatenate(ds6, axis=0)
        dm_cols = [None] * 9
        for a in range(3):
            for b in range(3):
                dm_cols[3 * a + b] = df[:, a: a + 1] * svnw[b]
        dfm_ref[0] = jnp.concatenate(
            df9_acc + dm_cols + [jnp.zeros_like(vol_rows)], axis=1)

    _double_buffered(offs_ref, src_any_ref, buf, sems, windows, dsts, body)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def forces_win(k2src, own_rows, fmT_b, offs, tile_start, windows, h,
               interpret=False):
    """Warp-mode forces over window slabs: (t_b, rows, 3).

    k2src: (20, n_slots) [S_6 | R^T_9 | restT_3 | mass | vol]
    (differentiable rows 0:15).  own_rows as in moments_win (restT rows
    used).  fmT_b: (19, t_b*rows) LANE-MAJOR [F_9 | M_9 | V_i]
    (differentiable) — a (rows-major, 19) operand would be 128-lane padded
    7x in HBM and staged 16 KB/tile instead of 3 KB.
    """
    return _forces_win_fwd(k2src, own_rows, fmT_b, offs, tile_start,
                           windows, h, interpret)


def _forces_win_fwd(k2src, own_rows, fmT_b, offs, tile_start, windows, h,
                    interpret):
    t_b = offs.shape[0]
    rows = own_rows.shape[2]
    dsts, SL = _win_dsts(windows)
    kernel = functools.partial(_forces_win_kernel, h=h, windows=windows,
                               dsts=dsts)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t_b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, K1_ROWS, rows),
                         lambda i, offs: (tile_start + i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((19, rows), lambda i, offs: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows, 3), lambda i, offs: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, K2_ROWS, SL), k2src.dtype),
            pltpu.SemaphoreType.DMA((2, len(windows))),
        ],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t_b, rows, 3), fmT_b.dtype),
        interpret=interpret,
    )(offs, k2src, own_rows, fmT_b)


def _forces_win_vjp_fwd(k2src, own_rows, fmT_b, offs, tile_start, windows,
                        h, interpret):
    out = _forces_win_fwd(k2src, own_rows, fmT_b, offs, tile_start,
                          windows, h, interpret)
    return out, (k2src, own_rows, fmT_b, offs)


def _forces_win_vjp_bwd(tile_start, windows, h, interpret, res, df):
    k2src, own_rows, fmT_b, offs = res
    t_b = offs.shape[0]
    rows = own_rows.shape[2]
    dsts, SL = _win_dsts(windows)
    kernel = functools.partial(_forces_win_bwd_kernel, h=h, windows=windows,
                               dsts=dsts)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t_b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, K1_ROWS, rows),
                         lambda i, offs: (tile_start + i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((19, rows), lambda i, offs: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, 3), lambda i, offs: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, rows, 19), lambda i, offs: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 15, SL), lambda i, offs: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, K2_ROWS, SL), k2src.dtype),
            pltpu.SemaphoreType.DMA((2, len(windows))),
        ],
    )
    dfm, dsrT = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((t_b, rows, 19), df.dtype),
            jax.ShapeDtypeStruct((t_b, 15, SL), df.dtype),
        ],
        interpret=interpret,
    )(offs, k2src, own_rows, fmT_b, df)
    dsrc = scatter_windows_add(dsrT, offs, windows, k2src.shape[1], K2_ROWS,
                               take=15).astype(k2src.dtype)
    # cotangent must match the LANE-MAJOR primal: (19, t_b*rows)
    dfmT = jnp.transpose(dfm, (2, 0, 1)).reshape(19, -1)
    return (dsrc, None, dfmT, None)


forces_win.defvjp(_forces_win_vjp_fwd, _forces_win_vjp_bwd)
