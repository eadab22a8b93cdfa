"""DMA-fetching variants of the pair kernels (EXPERIMENTAL, unused).

Superseded by ops/pallas/packed.py (packed-row gathers measured faster than
per-run DMA at current run counts); kept as the starting point for the
double-buffered fetch design in PERF_NOTES.md.

XLA's gather costs ~3.5ns per ROW on TPU regardless of slice shape, which makes
the per-step slab gathers (tiles x 9 runs x run_len rows) the dominant step
cost.  These wrappers move the slab fetch INSIDE the Pallas kernels: the 9
contiguous slot runs are pulled from HBM into a VMEM scratch with 9 async DMAs
per tile (run starts scalar-prefetched), then the existing kernel bodies run
unchanged on the scratch.

Differentiation: the fetch is linear; the VJP reuses the non-fetching backward
kernels (they only need cotangents + static rest data) and performs the
slab-transpose scatter-add in XLA with a precomputed flat row-index table.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pair_kernels as pk


def _fetch_grid_spec(t, tile_shapes, out_shapes, scratch, n_slots, hbm_width):
    """PrefetchScalarGridSpec: scalar arg 0 = (t, 9) run starts; operand 0 is
    the HBM slot array; the rest are VMEM tile blocks."""
    in_specs = [pl.BlockSpec(memory_space=pltpu.ANY)] + [
        pl.BlockSpec((1,) + s, lambda i, sp: (i,) + (0,) * len(s), memory_space=pltpu.VMEM)
        for s in tile_shapes
    ]
    out_specs = [
        pl.BlockSpec((1,) + s, lambda i, sp: (i,) + (0,) * len(s), memory_space=pltpu.VMEM)
        for s in out_shapes
    ]
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t,),
        in_specs=in_specs,
        out_specs=out_specs if len(out_specs) > 1 else out_specs[0],
        scratch_shapes=scratch,
    )


def _start_runs(src_hbm, scratch, sems, starts_ref, tile, run_len, width):
    """Begin 9 async copies src[start_k : start_k + run_len, :width] -> scratch."""
    copies = []
    for k in range(9):
        s = starts_ref[tile, k]
        dma = pltpu.make_async_copy(
            src_hbm.at[pl.ds(s, run_len), :],
            scratch.at[pl.ds(k * run_len, run_len), :],
            sems.at[k],
        )
        dma.start()
        copies.append(dma)
    return copies


def _wait_runs(copies):
    for dma in copies:
        dma.wait()


# ------------------------------------------------------------------- moments
def _moments_fetch_kernel(starts_ref, pos_hbm, restT_rows_ref, restT_slab_ref,
                          mass_slab_ref, vol_slab_ref, pos_rows_ref,
                          a_ref, y_ref, scratch, sems, *, h, run_len):
    tile = pl.program_id(0)
    copies = _start_runs(pos_hbm, scratch, sems, starts_ref, tile, run_len, 3)
    _wait_runs(copies)
    pk._moments_kernel(
        restT_rows_ref, restT_slab_ref, mass_slab_ref, vol_slab_ref,
        pos_rows_ref, _FakeRef(scratch[:]), a_ref, y_ref, h=h,
    )


class _FakeRef:
    """Adapter: kernel bodies index operands as ref[0] or ref[0, ...]; scratch
    has no leading tile axis, so wrap the materialized value."""

    def __init__(self, value):
        self._value = value

    @property
    def shape(self):
        return (1,) + self._value.shape

    def __getitem__(self, idx):
        if isinstance(idx, tuple):
            assert idx[0] == 0
            rest = idx[1:]
            return self._value[rest] if rest else self._value
        assert idx == 0
        return self._value


def moments_fetch_fwd(restT_rows, restT_slab, mass_slab, vol_slab, pos_rows,
                      pos_slots, slab_start, h, interpret=False):
    t, _, rows = restT_rows.shape
    slab = restT_slab.shape[2]
    run_len = slab // 9
    kernel = functools.partial(_moments_fetch_kernel, h=h, run_len=run_len)
    grid_spec = _fetch_grid_spec(
        t,
        [(3, rows), (3, slab), (1, slab), (1, slab), (rows, 3)],
        [(rows, 9), (rows, 9)],
        [pltpu.VMEM((slab, 3), pos_slots.dtype), pltpu.SemaphoreType.DMA((9,))],
        pos_slots.shape[0], 3,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((t, rows, 9), pos_rows.dtype),
            jax.ShapeDtypeStruct((t, rows, 9), pos_rows.dtype),
        ],
        interpret=interpret,
    )(slab_start, pos_slots, restT_rows, restT_slab,
      mass_slab[:, None, :], vol_slab[:, None, :], pos_rows)


# ------------------------------------------------------------------- forces (separable)
def _forces_fetch_kernel(starts_ref, g_hbm, restT_rows_ref, restT_slab_ref,
                         vol_slab_ref, g_rows_ref, vol_rows_ref,
                         f_ref, scratch, sems, *, h, run_len):
    tile = pl.program_id(0)
    copies = _start_runs(g_hbm, scratch, sems, starts_ref, tile, run_len, 9)
    _wait_runs(copies)
    pk._forces_kernel(
        restT_rows_ref, restT_slab_ref, vol_slab_ref, g_rows_ref,
        _FakeRef(scratch[:]), vol_rows_ref, f_ref, h=h,
    )


def forces_fetch_fwd(restT_rows, restT_slab, vol_slab, g_rows, g_slots, vol_rows,
                     slab_start, h, interpret=False):
    t, _, rows = restT_rows.shape
    slab = restT_slab.shape[2]
    run_len = slab // 9
    kernel = functools.partial(_forces_fetch_kernel, h=h, run_len=run_len)
    grid_spec = _fetch_grid_spec(
        t,
        [(3, rows), (3, slab), (1, slab), (rows, 9), (rows, 1)],
        [(rows, 3)],
        [pltpu.VMEM((slab, 9), g_slots.dtype), pltpu.SemaphoreType.DMA((9,))],
        g_slots.shape[0], 9,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t, rows, 3), g_rows.dtype),
        interpret=interpret,
    )(slab_start, g_slots, restT_rows, restT_slab, vol_slab[:, None, :],
      g_rows, vol_rows[:, :, None])


# ------------------------------------------------------------------- forces (warp)
def _forces_warp_fetch_kernel(starts_ref, sr_hbm, restT_rows_ref, restT_slab_ref,
                              vol_slab_ref, f9_ref, m9_ref, vol_rows_ref,
                              f_ref, scratch, sems, *, h, run_len):
    """Fetches the fused (n_slots, 18) [S_9 | R_9] slab, then splits.

    S is consumed as lane vectors (transposed) inside the chunked kernel body;
    to avoid an in-kernel transpose we fetch S and R in natural row layout and
    transpose the small (slab, 9) S block VMEM-side per chunk — Mosaic handles
    (L, 9) -> (9, L) relayouts for these sizes.
    """
    tile = pl.program_id(0)
    copies = _start_runs(sr_hbm, scratch, sems, starts_ref, tile, run_len, 18)
    _wait_runs(copies)
    sr = scratch[:]
    s_slabT = sr[:, :9].T
    r_slab = sr[:, 9:]
    pk._forces_warp_kernel(
        restT_rows_ref, restT_slab_ref, vol_slab_ref, f9_ref, m9_ref,
        _FakeRef(s_slabT), _FakeRef(r_slab), _FakeRef(s_slabT), vol_rows_ref,
        f_ref, h=h, chunks=pk._WARP_CHUNKS,
    )


def forces_warp_fetch_fwd(restT_rows, restT_slab, vol_slab, f9_rows, m9_rows,
                          sr_slots, vol_rows, slab_start, h, interpret=False):
    """sr_slots: (n_slots, 18) concatenated [S (9) | R (9)] per slot."""
    t, _, rows = restT_rows.shape
    slab = restT_slab.shape[2]
    run_len = slab // 9
    kernel = functools.partial(_forces_warp_fetch_kernel, h=h, run_len=run_len)
    grid_spec = _fetch_grid_spec(
        t,
        [(3, rows), (3, slab), (1, slab), (rows, 9), (rows, 9), (rows, 1)],
        [(rows, 3)],
        [pltpu.VMEM((slab, 18), sr_slots.dtype), pltpu.SemaphoreType.DMA((9,))],
        sr_slots.shape[0], 18,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t, rows, 3), f9_rows.dtype),
        interpret=interpret,
    )(slab_start, sr_slots, restT_rows, restT_slab, vol_slab[:, None, :],
      f9_rows, m9_rows, vol_rows[:, :, None])


# ===================================================== differentiable wrappers
def _flat_slab_rows(slab_start, run_len):
    """(t, 9) run starts -> (t * 9 * run_len,) flat slot-row indices in slab order."""
    offs = jnp.arange(run_len, dtype=slab_start.dtype)
    return (slab_start[:, :, None] + offs[None, None, :]).reshape(-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def moments_fetch(restT_rows, restT_slab, mass_slab, vol_slab, pos_rows,
                  pos_slots, slab_start, h, interpret=False):
    """DMA-fetching moments with the same math/VJP as pk.moments_pallas, but
    taking the full slot array + run starts instead of a pregathered slab."""
    return moments_fetch_fwd(restT_rows, restT_slab, mass_slab, vol_slab,
                             pos_rows, pos_slots, slab_start, h, interpret)


def _moments_fetch_vjp_fwd(restT_rows, restT_slab, mass_slab, vol_slab, pos_rows,
                           pos_slots, slab_start, h, interpret):
    out = moments_fetch_fwd(restT_rows, restT_slab, mass_slab, vol_slab,
                            pos_rows, pos_slots, slab_start, h, interpret)
    return out, (restT_rows, restT_slab, mass_slab, vol_slab, slab_start,
                 pos_slots.shape[0])


def _moments_fetch_vjp_bwd(h, interpret, res, cts):
    restT_rows, restT_slab, mass_slab, vol_slab, slab_start, n_slots = res
    # per-tile cotangents from the existing (non-fetch) backward kernel
    dpr, dps = pk._moments_vjp_bwd(
        h, interpret, (restT_rows, restT_slab, mass_slab, vol_slab), cts
    )[4:6]
    run_len = restT_slab.shape[2] // 9
    idx = _flat_slab_rows(slab_start, run_len)
    dpos = jnp.zeros((n_slots, 3), dps.dtype).at[idx].add(dps.reshape(-1, 3))
    return (None, None, None, None, dpr, dpos, None)


moments_fetch.defvjp(_moments_fetch_vjp_fwd, _moments_fetch_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def forces_fetch(restT_rows, restT_slab, vol_slab, g_rows, g_slots, vol_rows,
                 slab_start, h, interpret=False):
    """DMA-fetching separable forces (pair_def_grad="j")."""
    return forces_fetch_fwd(restT_rows, restT_slab, vol_slab, g_rows, g_slots,
                            vol_rows, slab_start, h, interpret)


def _forces_fetch_vjp_fwd(restT_rows, restT_slab, vol_slab, g_rows, g_slots,
                          vol_rows, slab_start, h, interpret):
    out = forces_fetch_fwd(restT_rows, restT_slab, vol_slab, g_rows, g_slots,
                           vol_rows, slab_start, h, interpret)
    return out, (restT_rows, restT_slab, vol_slab, vol_rows, slab_start,
                 g_slots.shape[0])


def _forces_fetch_vjp_bwd(h, interpret, res, df):
    restT_rows, restT_slab, vol_slab, vol_rows, slab_start, n_slots = res
    dgr, dgs = pk._forces_vjp_bwd(
        h, interpret, (restT_rows, restT_slab, vol_slab, vol_rows), df
    )[3:5]
    run_len = restT_slab.shape[2] // 9
    idx = _flat_slab_rows(slab_start, run_len)
    dg_slots = jnp.zeros((n_slots, 9), dgs.dtype).at[idx].add(dgs.reshape(-1, 9))
    return (None, None, None, dgr, dg_slots, None, None)


forces_fetch.defvjp(_forces_fetch_vjp_fwd, _forces_fetch_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def forces_warp_fetch(restT_rows, restT_slab, vol_slab, f9_rows, m9_rows,
                      sr_slots, vol_rows, slab_start, h, interpret=False):
    """DMA-fetching Warp-mode forces; sr_slots = (n_slots, 18) [S_9 | R_9]."""
    return forces_warp_fetch_fwd(restT_rows, restT_slab, vol_slab, f9_rows,
                                 m9_rows, sr_slots, vol_rows, slab_start, h,
                                 interpret)


def _forces_warp_fetch_vjp_fwd(restT_rows, restT_slab, vol_slab, f9_rows, m9_rows,
                               sr_slots, vol_rows, slab_start, h, interpret):
    out = forces_warp_fetch_fwd(restT_rows, restT_slab, vol_slab, f9_rows,
                                m9_rows, sr_slots, vol_rows, slab_start, h,
                                interpret)
    return out, (restT_rows, restT_slab, vol_slab, f9_rows, sr_slots, vol_rows,
                 slab_start)


def _forces_warp_fetch_vjp_bwd(h, interpret, res, df):
    restT_rows, restT_slab, vol_slab, f9_rows, sr_slots, vol_rows, slab_start = res
    t, _, rows = restT_rows.shape
    slab = restT_slab.shape[2]
    run_len = slab // 9
    n_slots = sr_slots.shape[0]
    # regather transposed S/R slabs for the backward kernel (XLA gathers; the
    # forward path stays DMA-fast — backward pays the gather cost)
    idx = _flat_slab_rows(slab_start, run_len)
    sr_slab = jnp.take(sr_slots, idx, axis=0).reshape(t, slab, 18)
    s_slabT = jnp.swapaxes(sr_slab[..., :9], 1, 2)
    r_slabT = jnp.swapaxes(sr_slab[..., 9:], 1, 2)
    df9, dm9, dsT, dr = pk._forces_warp_vjp_bwd(
        h, interpret,
        (restT_rows, restT_slab, vol_slab, f9_rows, s_slabT, r_slabT, vol_rows),
        df,
    )[3:7]
    ds = jnp.swapaxes(dsT, 1, 2)                         # (t, slab, 9)
    dsr = jnp.concatenate([ds, dr], axis=-1)             # (t, slab, 18)
    dsr_slots = jnp.zeros((n_slots, 18), dsr.dtype).at[idx].add(dsr.reshape(-1, 18))
    return (None, None, None, df9, dm9, dsr_slots, None, None)


forces_warp_fetch.defvjp(_forces_warp_fetch_vjp_fwd, _forces_warp_fetch_vjp_bwd)
