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
# concurrent chunks still OOM'd).
_BWD_TILE_CHUNK = 512


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


def gather_packed(packed, gidx, slab, pad_width):
    """(rows, 128) packed source + (t, slab/group) group rows -> (t, slab, pad_width)."""
    t = gidx.shape[0]
    rows = jnp.take(packed, gidx.reshape(-1), axis=0)
    return rows.reshape(t, slab, pad_width)


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
@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def moments_packed(restT_rows, restT_slab, mass_slab, vol_slab, pos_rows,
                   pos_slots, gidx8, h, interpret=False):
    """A_pq, Y moments with packed-row slab gather.  pos_slots: (n_slots, 3)."""
    return _moments_packed_fwd(restT_rows, restT_slab, mass_slab, vol_slab,
                               pos_rows, pos_slots, gidx8, h, interpret)[0]


def _moments_packed_fwd(restT_rows, restT_slab, mass_slab, vol_slab, pos_rows,
                        pos_slots, gidx8, h, interpret):
    slab = restT_slab.shape[2]
    # 8 f/slot (64-float rows): gather cost is per-ROW, so narrower rows halve
    # staged source bytes; the slab then ships LANE-MAJOR (t, 8, slab) — a
    # (slab, 8) pallas operand would be retiled with the minor dim padded to
    # 128 lanes (16x HBM bloat, staged every scan iteration)
    pos_slabT = jnp.swapaxes(
        gather_packed(pack(pos_slots, 3, 8, 8), gidx8, slab, 8), 1, 2)
    pos_rows8 = jnp.concatenate(
        [pos_rows, jnp.zeros(pos_rows.shape[:2] + (5,), pos_rows.dtype)], axis=2
    )
    out = pk._moments_fwd_impl(restT_rows, restT_slab, mass_slab, vol_slab,
                               pos_rows8, pos_slabT, h, interpret)
    return out, None


def _moments_packed_vjp_fwd(restT_rows, restT_slab, mass_slab, vol_slab, pos_rows,
                            pos_slots, gidx8, h, interpret):
    out, _ = _moments_packed_fwd(restT_rows, restT_slab, mass_slab, vol_slab,
                                 pos_rows, pos_slots, gidx8, h, interpret)
    return out, (restT_rows, restT_slab, mass_slab, vol_slab, gidx8,
                 pos_slots.shape[0])


def _moments_packed_vjp_bwd(h, interpret, res, cts):
    restT_rows, restT_slab, mass_slab, vol_slab, gidx8, n_slots = res
    da, dy = cts
    t = restT_rows.shape[0]

    def body(args):
        rr, rs, ms, vs, gi, da_c, dy_c = args
        dpr_c, dpsT_c = pk._moments_vjp_bwd(
            h, interpret, (rr, rs, ms, vs, 3), (da_c, dy_c)
        )[4:6]
        dps_c = jnp.swapaxes(dpsT_c, 1, 2)               # (chunk, slab, 3)
        return scatter_packed_add(dps_c, gi, n_slots, 3, 8, 8), dpr_c

    dpos, dpr = _scan_chunks(
        body, (restT_rows, restT_slab, mass_slab, vol_slab, gidx8, da, dy), t,
        jnp.zeros((n_slots, 3), da.dtype),
    )
    return (None, None, None, None, dpr, dpos, None)


moments_packed.defvjp(_moments_packed_vjp_fwd, _moments_packed_vjp_bwd)


# --------------------------------------------------------------------- forces (separable)
@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def forces_packed(restT_rows, restT_slab, vol_slab, g_rows, g_slots, vol_rows,
                  gidx8, h, interpret=False):
    """Separable forces with packed-row G gather.  g_slots: (n_slots, 9)."""
    return _forces_packed_fwd(restT_rows, restT_slab, vol_slab, g_rows, g_slots,
                              vol_rows, gidx8, h, interpret)


def _forces_packed_fwd(restT_rows, restT_slab, vol_slab, g_rows, g_slots,
                       vol_rows, gidx8, h, interpret):
    slab = restT_slab.shape[2]
    g_slab16 = gather_packed(pack(g_slots, 9, 16, 8), gidx8, slab, 16)
    return pk._forces_fwd_impl(restT_rows, restT_slab, vol_slab, g_rows,
                               g_slab16, vol_rows, h, interpret)


def _forces_packed_vjp_fwd(restT_rows, restT_slab, vol_slab, g_rows, g_slots,
                           vol_rows, gidx8, h, interpret):
    out = _forces_packed_fwd(restT_rows, restT_slab, vol_slab, g_rows, g_slots,
                             vol_rows, gidx8, h, interpret)
    return out, (restT_rows, restT_slab, vol_slab, vol_rows, gidx8,
                 g_slots.shape[0])


def _forces_packed_vjp_bwd(h, interpret, res, df):
    restT_rows, restT_slab, vol_slab, vol_rows, gidx8, n_slots = res
    t = restT_rows.shape[0]

    def body(args):
        rr, rs, vs, vr, gi, df_c = args
        dgr_c, dgs_c = pk._forces_vjp_bwd(h, interpret, (rr, rs, vs, vr), df_c)[3:5]
        return scatter_packed_add(dgs_c, gi, n_slots, 9, 16, 8), dgr_c

    dg_slots, dgr = _scan_chunks(
        body, (restT_rows, restT_slab, vol_slab, vol_rows, gidx8, df), t,
        jnp.zeros((n_slots, 9), df.dtype),
    )
    return (None, None, None, dgr, dg_slots, None, None)


forces_packed.defvjp(_forces_packed_vjp_fwd, _forces_packed_vjp_bwd)


# --------------------------------------------------------------------- forces (warp)
@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def forces_warp_packed(restT_rows, restT_slab, vol_slab, f9_rows, m9_rows,
                       sr_slots, vol_rows, gidx8, h, interpret=False,
                       chunks=None):
    """Warp-mode forces.

    sr_slots (n_slots, 15): fused per-slot record [S_6 | R_9^T]:
      S symmetric as [s00 s01 s02 s11 s12 s22] (kernels remap via _SYM6);
      R transposed ([3c+a] = R[a, c]) so matmul extraction is contiguous.
    One 16f-padded packed source -> ONE gather via gidx8 (each distinct gather
    source costs a full per-iteration staging copy inside the scan: measured
    ~0.7 ms per 7.7MB source at 100k).  The slab also ships pre-transposed by
    XLA (in-kernel Mosaic relayout is ~0.3 us/tile).
    """
    return _forces_warp_packed_fwd(restT_rows, restT_slab, vol_slab, f9_rows,
                                   m9_rows, sr_slots, vol_rows, gidx8, h,
                                   interpret, chunks)


def _forces_warp_packed_fwd(restT_rows, restT_slab, vol_slab, f9_rows, m9_rows,
                            sr_slots, vol_rows, gidx8, h, interpret,
                            chunks=None):
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    t, _, rows = restT_rows.shape
    slab = restT_slab.shape[2]
    srT_slab = jnp.swapaxes(
        gather_packed(pack(sr_slots, 15, 16, 8), gidx8, slab, 16), 1, 2)
    kernel = pk._batched(
        functools.partial(pk._forces_warp_kernel_v2, h=h,
                          chunks=chunks or pk._WARP_CHUNKS), 8)
    args, t_pad = pk._pad_tiles(
        [restT_rows, restT_slab, vol_slab[:, None, :], f9_rows, m9_rows,
         srT_slab, vol_rows[:, :, None]], t)
    out = pl.pallas_call(
        kernel,
        grid=(t_pad // pk._TILE_BATCH,),
        in_specs=pk._tile_specs([
            (3, rows), (3, slab), (1, slab), (rows, 9), (rows, 9),
            (16, slab), (rows, 1),
        ]),
        out_specs=pk._tile_specs([(rows, 3)])[0],
        out_shape=jax.ShapeDtypeStruct((t_pad, rows, 3), f9_rows.dtype),
        interpret=interpret,
    )(*args)
    return out[:t]


def _forces_warp_packed_vjp_fwd(restT_rows, restT_slab, vol_slab, f9_rows,
                                m9_rows, sr_slots, vol_rows, gidx8, h,
                                interpret, chunks=None):
    out = _forces_warp_packed_fwd(restT_rows, restT_slab, vol_slab, f9_rows,
                                  m9_rows, sr_slots, vol_rows, gidx8, h,
                                  interpret, chunks)
    return out, (restT_rows, restT_slab, vol_slab, f9_rows, sr_slots, vol_rows,
                 gidx8)


def _forces_warp_packed_vjp_bwd(h, interpret, chunks, res, df):
    restT_rows, restT_slab, vol_slab, f9_rows, sr_slots, vol_rows, gidx8 = res
    t, _, rows = restT_rows.shape
    slab = restT_slab.shape[2]
    n_slots = sr_slots.shape[0]
    sr_packed = pack(sr_slots, 15, 16, 8)

    def body(args):
        rr, rs, vs, f9_c, vr, gi, df_c = args
        # backward needs the lane-major slab: regather (packed, chunked) + XLA
        # transpose — backward pays the relayout, forward stays bandwidth-fast
        srT = jnp.swapaxes(gather_packed(sr_packed, gi, slab, 16), 1, 2)
        df9_c, dm9_c, dsT6_c, drT_c = pk._forces_warp_bwd_impl(
            rr, rs, vs, f9_c, srT, vr, df_c, h, interpret,
            chunks or pk._WARP_CHUNKS,
        )
        dsr_c = jnp.swapaxes(
            jnp.concatenate([dsT6_c, drT_c], axis=1), 1, 2)  # (chunk, slab, 15)
        return scatter_packed_add(dsr_c, gi, n_slots, 15, 16, 8), (df9_c, dm9_c)

    dsr_slots, (df9, dm9) = _scan_chunks(
        body,
        (restT_rows, restT_slab, vol_slab, f9_rows, vol_rows, gidx8, df), t,
        jnp.zeros((n_slots, 15), df.dtype),
    )
    return (None, None, None, df9, dm9, dsr_slots, None, None)


forces_warp_packed.defvjp(_forces_warp_packed_vjp_fwd, _forces_warp_packed_vjp_bwd)
