"""Sparse-bucketed scene building and elastic forces (flagship perf path).

Built on topology/sparse.py: per-tile candidate GROUP lists (8-slot packed
rows) replace the fixed 9-column x global-L slab of the varcol layout, cutting
candidate-pair waste from ~78x to ~9x at 100k particles.  Tiles are bucketed
by padded slab length; each bucket runs the existing fused Pallas pair kernels
(ops/pallas/pair_kernels.py) with its own static shapes.

The per-step dataflow (pallas backend, warp mode):

  pos_slots -> [per bucket: take rows, packed slab gather, K1 moments]
            -> concat + unpermute -> mid-section (polar3, F, S, M, G; mat3)
            -> [per bucket: take rows, packed S|R gather, K2 forces]
            -> concat + unpermute -> scatter to slots

Reference parity: this is the TPU-native replacement for the per-pair CUDA
kernels at sim.py:170-235 with wp.HashGrid (sim.py:123-127); same static rest
topology contract.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..config import SimConfig
from ..core.types import Materials, Scene
from ..ops import mat3
from ..ops.blocked import far_grid
from ..topology.sparse import GROUP, SparseLayout, build_sparse_layout
from .blocked import _mid_section
from .scene import lame_parameters


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "gidx8", "restT_rows", "static_slab", "static2",
    ],
    meta_fields=["tile_start", "rows", "slab_len"],
)
@dataclasses.dataclass(frozen=True)
class DevBucket:
    """One bucket's static device arrays (t_b tiles, slab_len candidates).

    Tiles are laid out BUCKET-MAJOR (topology/sparse.py permutes the slot
    space), so a bucket's tiles are rows [tile_start, tile_start + t_b) of any
    (n_tiles, ...) array — per-step row gathers are free static slices.

    All per-slab static data travels as ONE (t_b, 5, slab) operand
    [restT_3 | mass | vol]: three separate blocks each pad their sublane dim
    to 8 in VMEM and issue their own per-tile DMA — merged, the kernels stage
    one contiguous block (see ops/pallas/pair_kernels.py).
    """

    gidx8: jnp.ndarray       # (t_b, slab/8) packed-row ids (16 f/slot sources)
    restT_rows: jnp.ndarray  # (t_b, 3, rows)
    static_slab: jnp.ndarray  # (t_b, 5, slab): [restT_3 | mass | vol]
    tile_start: int
    rows: int
    slab_len: int
    # 2D (t_b*5, slab) flattening of static_slab for the manual-DMA K1
    # forward (Mosaic cannot slice the 3D form — internal sublane padding);
    # None when SOFTBODY_K1_MANUAL=0 (saves the duplicate HBM)
    static2: jnp.ndarray | None = None

    @property
    def n_tiles(self) -> int:
        return self.restT_rows.shape[0]

    def rows_of(self, arr):
        """Slice this bucket's tiles out of a tile-major array (free)."""
        return jax.lax.slice_in_dim(arr, self.tile_start,
                                    self.tile_start + self.n_tiles, axis=0)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["buckets", "rs6", "stat_rows", "rs6T"],
    meta_fields=["rows", "n_tiles", "n_slots", "n_shards", "group"],
)
@dataclasses.dataclass(frozen=True)
class SparseBlocked:
    """Device-side sparse-bucketed topology (lives in Scene.blocked).

    Bucket-major tile order: concatenating per-bucket results along axis 0
    directly yields tile order (no unpermute needed).  When n_shards > 1 the
    bucket list is shard-major (n_shards equal-shape runs of len(buckets)/
    n_shards buckets each) — see parallel/sparse_shard.py."""

    buckets: tuple           # tuple[DevBucket, ...]
    rs6: jnp.ndarray         # (n_tiles*rows, 6) static moment row sums
    rows: int
    n_tiles: int
    n_slots: int
    n_shards: int = 1
    group: int = GROUP       # slots per packed gather row (layout.group):
                             # 8 -> 64-float pos rows (per-row-cost regime),
                             # 16 -> 128-float pos rows (bandwidth regime,
                             # half the gather rows, ~+14% candidate pairs)
    # (t, rows, 18) fused static per-row record [rs6 | mu | lam | vol | rc_9]
    # for the fused K1+mid kernel (None -> unfused path)
    stat_rows: jnp.ndarray | None = None
    # (6, n_tiles*rows) LANE-MAJOR static moment row sums (= rs6^T): the v4
    # path's corrections and XLA term_i read whole rows (a per-step strided
    # column extraction of the (m, 6) form would not reliably be hoisted out
    # of the episode scan)
    rs6T: jnp.ndarray | None = None


# MEASURED at 100k on v5e (2026-08-18): chunking the K2 slab is a net LOSS at
# any size tried — each chunk's lane slices pay Mosaic relayouts (stage_probe:
# slab=640 chunks 3 -> 1 is 2.2x; slab=1280 chunks 2 -> 1 is +8.7%); bench
# 768 -> 4096: 1.562e7 -> 1.594e7.  The cap only guards VMEM on pathological
# buckets.
_MAX_CHUNK = int(__import__("os").environ.get("SOFTBODY_K2_MAX_CHUNK", "4096"))


def _chunks_for(slab: int, max_chunk: int | None = None) -> int:
    max_chunk = _MAX_CHUNK if max_chunk is None else max_chunk
    c = 1
    while slab // c > max_chunk or slab % c:
        c += 1
        if c > slab:
            return 1
    return c


def build_sparse_scene(
    points: np.ndarray,
    cfg: SimConfig,
    out_num: int | None = None,
    rows: int = 32,  # round-4 sweep: 1.60e7 (32) vs 1.43e7 (64) vs 1.08e7 (16)
                     # at 100k under the true-f32 kernels (PERF_NOTES)
    max_buckets: int = 8,
    dirichlet_mask: np.ndarray | None = None,
    external_force: np.ndarray | None = None,
    obstacles=None,
    layout: SparseLayout | None = None,
    n_shards: int = 1,
    group: int = GROUP,
):
    """Returns (scene, slot_of_particle) with Scene.blocked a SparseBlocked."""
    rest = np.asarray(points, dtype=np.float64)
    n = rest.shape[0]
    dtype = cfg.dtype
    if layout is None:
        layout = build_sparse_layout(rest, 2.0 * cfg.h, rows=rows,
                                     max_buckets=max_buckets,
                                     n_shards=n_shards, group=group)
    if layout.n_shards > 1 and int(layout.group) != 8:
        raise ValueError(
            "SPMD sparse scenes require group=8: parallel/sparse_shard.py's "
            "all-gathered packed sources and halo plans assume 8-slot rows")
    rows = layout.rows
    ns = layout.n_slots
    sop = layout.slot_of_particle
    n_tiles = layout.n_tiles
    m = n_tiles * rows

    span = float(np.abs(rest).max()) + 1.0
    rest_slots = far_grid(ns, start=span + 100.0 * cfg.h, spacing=4.0 * cfg.h)
    rest_slots[sop] = rest
    real = layout.particle_of_slot >= 0

    mass = np.where(real, cfg.mass, 0.0)
    mass_integ = np.where(real, cfg.mass, 1.0)
    mu0, lam0 = lame_parameters(cfg.youngs_modulus, cfg.poisson_ratio)
    mu = np.where(real, mu0, 0.0)
    lam = np.where(real, lam0, 0.0)
    free = np.zeros((ns, 3))
    free[sop] = 1.0 if dirichlet_mask is None else np.asarray(dirichlet_mask, np.float64)
    ext = np.zeros((ns, 3))
    ext[sop] = (
        np.asarray(cfg.external_force, np.float64)
        if external_force is None
        else np.asarray(external_force, np.float64)
    )

    # ---- per-bucket static pregather (vectorized numpy)
    gsz = int(layout.group)

    def slab_slots(gids):
        # (t_b, G) group ids -> (t_b, G*gsz) slot ids
        return (gids.astype(np.int64)[:, :, None] * gsz
                + np.arange(gsz)[None, None, :]).reshape(gids.shape[0], -1)

    def make_bucket(b, vol_np):
        sl = slab_slots(b.group_ids)                       # (t_b, S)
        rs = rest_slots[sl]                                # (t_b, S, 3)
        tid = b.tile_ids.astype(np.int64)                  # contiguous range
        rr = rest_slots[tid[:, None] * rows + np.arange(rows)[None, :]]
        static = np.concatenate([
            np.swapaxes(rs, 1, 2),                         # (t_b, 3, S)
            mass[sl][:, None, :],
            vol_np[sl][:, None, :],
        ], axis=1)
        from ..ops.pallas import pair_kernels as _pk

        return DevBucket(
            gidx8=jnp.asarray(b.group_ids, jnp.int32),
            restT_rows=jnp.asarray(np.swapaxes(rr, 1, 2), dtype),
            static_slab=jnp.asarray(static, dtype),
            tile_start=int(tid[0]),
            rows=rows,
            slab_len=int(sl.shape[1]),
            static2=(jnp.asarray(static.reshape(-1, static.shape[2]), dtype)
                     if _pk._K1_MANUAL else None),
        )

    # density rho_i = sum_j m_j w_ij and rest correction Y(rest): vectorized
    # over the TRUE pair list (C++ CSR hash grid), O(pairs) with no padding
    # work — the candidate lists would cost ~9x more host flops.
    from ..topology.neighbors import rest_density_and_corr

    rho_p, vol_p, corr_p, scx_p, svnw_p = rest_density_and_corr(
        rest, np.full(n, cfg.mass), cfg, rowsums=True)
    rho = np.zeros(ns)
    rho[sop] = rho_p
    volume = np.zeros(ns)
    volume[sop] = vol_p
    rest_corr9 = np.zeros((m, 9))
    rest_corr9[sop] = corr_p.reshape(n, 9)  # sop < m: every particle slot is in a tile
    rest_corr = mat3.from_trailing(
        jnp.asarray(rest_corr9.reshape(m, 3, 3), dtype)
    )

    buckets = tuple(make_bucket(b, vol_np=volume) for b in layout.buckets)
    # static moment row sums on the HOST (f64 over true pairs) — replaces a
    # build-time ones-RHS Pallas moments call whose 8 bucket-shaped kernel
    # compiles cost ~77 s over the remote-compile tunnel
    rs6_np = np.zeros((m, 6))
    rs6_np[sop, 0:3] = scx_p
    rs6_np[sop, 3:6] = svnw_p
    rs6 = jnp.asarray(rs6_np, dtype)
    stat_rows = jnp.concatenate([
        rs6,
        jnp.asarray(np.stack([mu[:m], lam[:m], volume[:m]], axis=1), dtype),
        jnp.asarray(rest_corr9, dtype),
    ], axis=1).reshape(n_tiles, rows, 18)
    sb = SparseBlocked(
        buckets=buckets,
        rs6=rs6,
        rows=rows,
        n_tiles=n_tiles,
        n_slots=ns,
        n_shards=layout.n_shards,
        stat_rows=stat_rows,
        rs6T=jnp.asarray(rs6_np.T.copy(), dtype),
        group=gsz,
    )

    mats = Materials(
        mass=jnp.asarray(mass_integ, dtype),
        volume=jnp.asarray(volume, dtype),
        mu=jnp.asarray(mu, dtype),
        lam=jnp.asarray(lam, dtype),
        free=jnp.asarray(free, dtype),
        external=jnp.asarray(ext, dtype),
    )
    scene = Scene(
        rest_position=jnp.asarray(rest_slots, dtype),
        materials=mats,
        topology=None,
        out_num=int(out_num if out_num is not None else n),
        blocked=sb,
        rest_corr=rest_corr,
        slot_of_particle=jnp.asarray(sop, jnp.int32),
        obstacles=obstacles,
    )
    return scene, sop


def _static_rowsums(buckets, m, n_slots, cfg, dtype):
    """Static rest row sums rs6 (m, 6): one build-time moments call on an
    all-ones RHS (cols [3b+0] of the raw dots).  Computed ONCE here — a
    per-step ones call would NOT be hoisted out of the episode scan (XLA's
    LICM is conservative about custom-calls)."""
    from ..ops.pallas.packed import moments_packed
    from ..ops.pallas.pair_kernels import _interpret_default

    interpret = _interpret_default()
    ones = jnp.ones((n_slots, 3), dtype)
    parts = [moments_packed(
        b.restT_rows, b.static_slab, b.static2,
        ones, b.gidx8, cfg.h, interpret) for b in buckets]
    return jnp.concatenate(parts, axis=0).reshape(m, 18)[:, 0::3]


def elastic_forces_sparse(pos_slots, ratio_slots, mats: Materials, scene: Scene,
                          cfg: SimConfig, interpret=None):
    """Bucketed Pallas pair kernels + lane-packed XLA mid-section.

    Round-4 v4 contract: the K1 moments kernel CENTERS IN-KERNEL (per-tile
    rest shift, rowsum riding as a free 4th RHS row) and emits the FINAL
    [A | Y] components — no XLA-side ``- pos_i * rowsum`` correction remains.
    The host-built static rs6/rs6T rowsums now feed only (a) the K1 BACKWARD
    kernel (its centering-gradient term) and (b) the K2 term_i epilogue below.
    Round-3 v4 layout: both kernels move their row-side data LANE-MAJOR —
    ayT (18, m) out of K1, f9T (9, m) into K2, termjT (3, m) out of K2 — so
    none of it pays the (rows, k<128) T(8,128) padding, and the mid-section's
    component extraction is contiguous rows.
    """
    from ..ops.pallas.packed import (
        forces_packed, moments_packed_v4, pack_components,
        pack_components_with_stack,
    )
    from ..ops.pallas.pair_kernels import _interpret_default

    interpret = _interpret_default() if interpret is None else interpret
    sb: SparseBlocked = scene.blocked
    t, rows = sb.n_tiles, sb.rows
    m = t * rows
    gsz = getattr(sb, "group", GROUP)
    dtype = pos_slots.dtype

    def moments_all_T(p_slots):
        # ONE component stack feeds both the packed gather source and the
        # lane-major centering rows (a second jnp.stack of the same
        # components was a measured per-iteration strided copy, round 5)
        packed, stack8 = pack_components_with_stack(
            [p_slots[:, 0], p_slots[:, 1], p_slots[:, 2]], 8, gsz)
        posT_m = stack8[:3, :m]
        parts = []
        for b in sb.buckets:
            mb = b.n_tiles * rows
            r0 = b.tile_start * rows
            posT_b = jax.lax.slice_in_dim(posT_m, r0, r0 + mb, axis=1)
            rs6_b = jax.lax.slice_in_dim(sb.rs6T, r0, r0 + mb, axis=1)
            parts.append(moments_packed_v4(
                b.restT_rows, b.static_slab,
                packed, posT_b, rs6_b, b.gidx8, cfg.h, interpret))
        # bucket-major tile order: concat IS tile order
        return jnp.concatenate(parts, axis=1)               # (18, m)

    # fused K1+mid path: one kernel emits the K2 operand records directly;
    # the sr packed gather source is then a FREE row-major reshape
    use_fused = (cfg.fused_mid and cfg.pair_def_grad == "i"
                 and cfg.pair_dtype != "bfloat16" and sb.stat_rows is not None)
    if use_fused:
        from ..ops.pallas.packed import (
            forces_warp_packed, fused_k1mid, rows_from_components,
        )

        pos_m_ = pos_slots[:m]
        scale = cfg.stiffness_scale(ratio_slots[:m])
        dyn_rows = rows_from_components(
            [pos_m_[:, 0], pos_m_[:, 1], pos_m_[:, 2], scale], t, rows)
        pos_packed = pack_components(
            [pos_slots[:, 0], pos_slots[:, 1], pos_slots[:, 2]], 8, gsz)
        fm_parts, sr_parts = [], []
        for b in sb.buckets:
            fm_b, sr_b = fused_k1mid(
                b.restT_rows, b.static_slab,
                pos_packed, b.gidx8, b.rows_of(sb.stat_rows),
                b.rows_of(dyn_rows), cfg.h, cfg.corotated, 8, interpret)
            fm_parts.append(fm_b)
            sr_parts.append(sr_b)
        fm_rows = jnp.concatenate(fm_parts, axis=0)
        sr16 = jnp.concatenate(sr_parts, axis=0).reshape(m, 16)
        sr_pad = jnp.concatenate(
            [sr16, jnp.zeros((sb.n_slots - m, 16), dtype)], axis=0,
        )
        # pack_components rows are FIELD-major: transpose each group's block
        sr_packed = jnp.transpose(
            sr_pad.reshape(sb.n_slots // gsz, gsz, 16), (0, 2, 1),
        ).reshape(sb.n_slots // gsz, gsz * 16)
        f_parts = []
        for b in sb.buckets:
            f_parts.append(forces_warp_packed(
                b.restT_rows, b.static_slab,
                b.rows_of(fm_rows), sr_packed, b.gidx8,
                cfg.h, interpret, chunks=_chunks_for(b.slab_len),
            ))
        f = jnp.concatenate(f_parts, axis=0)
        out = jnp.zeros_like(pos_slots)
        return out.at[:m].set(f.reshape(m, 3))

    ayT = moments_all_T(pos_slots)
    rs6T = sb.rs6T                                             # (6, m), row b
    # v4 kernels center in-kernel (round 4): ayT rows ARE the final [A | Y]
    # components in the transposed [3b+a] order — contiguous-row extraction,
    # no correction pass (rs6T survives only for the K2 term_i epilogue)
    A = mat3.pack([[ayT[3 * b + a] for b in range(3)] for a in range(3)])
    Y = mat3.pack([[ayT[9 + 3 * b + a] for b in range(3)] for a in range(3)])
    R, F, S, M, G, vol_m = _mid_section(A, Y, ratio_slots, mats, scene, cfg, m)
    vol_rows = vol_m.reshape(t, rows)

    def to_slot(X, width):
        out = jnp.zeros((sb.n_slots, width), dtype=dtype)
        return out.at[:m].set(mat3.to_trailing(X).reshape(m, width))

    f_parts = []
    if cfg.pair_def_grad == "j":
        G9_rows = mat3.to_trailing(G).reshape(t, rows, 9)
        g_slots = to_slot(G, 9)
        for b in sb.buckets:
            f_parts.append(forces_packed(
                b.restT_rows, b.static_slab,
                b.rows_of(G9_rows), g_slots, b.rows_of(vol_rows), b.gidx8,
                cfg.h, interpret,
            ))
    else:
        # v4 lane-major warp path (ops/pallas/pair_kernels._forces_warp_kernel_v4):
        # F ships as ONE compact (9, m) lane-major stack (no transpose, no
        # 128-lane padding); the kernel returns termj (3, m) lane-major; the
        # 0.5 V_i scale and term_i = M_i (sum_j V_j grad W) — a REST-STATIC
        # row sum (sb.svnwT) the v2 kernel recomputed every step — apply here
        # on lane-packed components.
        from ..ops.pallas.packed import forces_warp_packed_v4

        from ..ops.pallas.packed import _maybe_barrier

        f9T = _maybe_barrier(jnp.stack(
            [F[0, 0], F[0, 1], F[0, 2], F[1, 0], F[1, 1], F[1, 2],
             F[2, 0], F[2, 1], F[2, 2]], axis=0))                  # (9, m)
        # pair_dtype is an explicit bf16 opt-in; otherwise keep the sim dtype
        pdt = (jnp.dtype("bfloat16") if cfg.pair_dtype == "bfloat16"
               else jnp.dtype(dtype))
        sr_packed = pack_components(
            [c.astype(pdt) for c in
             (S[0, 0], S[0, 1], S[0, 2], S[1, 1], S[1, 2], S[2, 2],
              R[0, 0], R[1, 0], R[2, 0], R[0, 1], R[1, 1], R[2, 1],
              R[0, 2], R[1, 2], R[2, 2])], 16, gsz, n_total=sb.n_slots)
        for b in sb.buckets:
            mb = b.n_tiles * rows
            f9T_b = jax.lax.slice_in_dim(
                f9T, b.tile_start * rows, b.tile_start * rows + mb, axis=1)
            f_parts.append(forces_warp_packed_v4(
                b.restT_rows, b.static_slab, f9T_b, sr_packed, b.gidx8,
                cfg.h, interpret, chunks=_chunks_for(b.slab_len),
            ))
        termjT = jnp.concatenate(f_parts, axis=1)                  # (3, m)
        f_comp = [
            0.5 * vol_m * (termjT[a]
                           + sum(M[a, b_] * rs6T[3 + b_] for b_ in range(3)))
            for a in range(3)
        ]
        out = jnp.zeros_like(pos_slots)
        return out.at[:m].set(jnp.stack(f_comp, axis=1))
    f = jnp.concatenate(f_parts, axis=0)
    out = jnp.zeros_like(pos_slots)
    return out.at[:m].set(f.reshape(m, 3))
