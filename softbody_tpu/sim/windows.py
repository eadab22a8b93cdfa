"""Window-DMA elastic backend (v6): scene build + per-step orchestration.

Pairs topology/windows.py (column-window slot layout) with
ops/pallas/window_kernels.py (window-DMA pair kernels).  Per step the XLA
between kernels reduces to: build two lane-major sources (one stack each),
the unchanged lane-packed mid-section, and the bucket concat — no gathers,
no slab transposes, no per-tile static arrays.

Column-level buckets are contiguous tile ranges (columns permuted
bucket-major at build), so per-bucket row operands are free slices and the
bucket concat IS tile order, exactly like the sparse path.

Trades ~1.5x more candidate pairs than the sparse bb-cull (950 vs 629 per
particle at 100k, measured) for eliminating the ~2.6 ms/step of gather /
transpose / staging glue.

Reference parity: same math as sim/blocked.py::elastic_forces_blocked
(reference sim.py:170-235), warp pairing (pair_def_grad="i") only for now.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SimConfig
from ..core.types import Materials, Scene
from ..ops import mat3
from ..ops.blocked import far_grid
from .scene import lame_parameters
from ..topology.windows import WindowLayout, build_window_layout
from .blocked import _mid_section


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["offsets"],
    meta_fields=["tile_start", "windows", "rows"],
)
@dataclasses.dataclass(frozen=True)
class WinBucket:
    """One window bucket (contiguous tile range [tile_start, +t_b))."""

    offsets: jnp.ndarray   # (t_b, 9) int32 window start slots (8-aligned)
    tile_start: int
    windows: tuple         # 9 static window lengths
    rows: int

    @property
    def n_tiles(self) -> int:
        return self.offsets.shape[0]

    def rows_of(self, arr):
        return jax.lax.slice_in_dim(arr, self.tile_start,
                                    self.tile_start + self.n_tiles, axis=0)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["buckets", "own_rows", "static5", "rs6"],
    meta_fields=["rows", "n_tiles", "n_slots", "n_shards"],
)
@dataclasses.dataclass(frozen=True)
class WinBlocked:
    """Device-side window topology (lives in Scene.blocked)."""

    buckets: tuple           # tuple[WinBucket, ...]
    own_rows: jnp.ndarray    # (n_tiles, 8, rows) [0_3 | restT_3 | mass | vol]
    static5: jnp.ndarray     # (5, n_slots) [restT_3 | mass | vol]
    rs6: jnp.ndarray         # (n_tiles*rows, 6) static moment row sums
    rows: int
    n_tiles: int
    n_slots: int
    n_shards: int = 1


def build_window_scene(
    points: np.ndarray,
    cfg: SimConfig,
    out_num: int | None = None,
    rows: int = 32,
    max_buckets: int = 8,
    dirichlet_mask: np.ndarray | None = None,
    external_force: np.ndarray | None = None,
    obstacles=None,
    layout: WindowLayout | None = None,
    interpret=None,
    n_shards: int = 1,
):
    """Returns (scene, slot_of_particle) with Scene.blocked a WinBlocked."""
    rest = np.asarray(points, dtype=np.float64)
    n = rest.shape[0]
    dtype = cfg.dtype
    if layout is None:
        layout = build_window_layout(rest, 2.0 * cfg.h, rows=rows,
                                     max_buckets=max_buckets,
                                     n_shards=n_shards)
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
    free[sop] = (1.0 if dirichlet_mask is None
                 else np.asarray(dirichlet_mask, np.float64))
    ext = np.zeros((ns, 3))
    ext[sop] = (
        np.asarray(cfg.external_force, np.float64)
        if external_force is None
        else np.asarray(external_force, np.float64)
    )

    from ..topology.neighbors import rest_density_and_corr

    rho_p, vol_p, corr_p = rest_density_and_corr(rest, np.full(n, cfg.mass), cfg)
    volume = np.zeros(ns)
    volume[sop] = vol_p
    rest_corr9 = np.zeros((m, 9))
    rest_corr9[sop] = corr_p.reshape(n, 9)
    rest_corr = mat3.from_trailing(
        jnp.asarray(rest_corr9.reshape(m, 3, 3), dtype))

    static5 = jnp.asarray(np.concatenate([
        rest_slots.T,                     # (3, ns)
        mass[None, :], volume[None, :],
    ], axis=0), dtype)                    # (5, ns)
    own = np.zeros((n_tiles, 8, rows))
    own[:, 3:6] = np.swapaxes(rest_slots[:m].reshape(n_tiles, rows, 3), 1, 2)
    own[:, 6] = mass[:m].reshape(n_tiles, rows)
    own[:, 7] = volume[:m].reshape(n_tiles, rows)
    own_rows = jnp.asarray(own, dtype)

    buckets = tuple(
        WinBucket(
            offsets=jnp.asarray(b.offsets, jnp.int32),
            tile_start=int(b.tile_ids[0]),
            windows=b.windows,
            rows=rows,
        )
        for b in layout.buckets
    )
    rs6 = _static_rowsums_win(buckets, own_rows, static5, m, cfg, dtype,
                              interpret)
    wb = WinBlocked(
        buckets=buckets,
        own_rows=own_rows,
        static5=static5,
        rs6=rs6,
        rows=rows,
        n_tiles=n_tiles,
        n_slots=ns,
        n_shards=layout.n_shards,
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
        blocked=wb,
        rest_corr=rest_corr,
        slot_of_particle=jnp.asarray(sop, jnp.int32),
        obstacles=obstacles,
    )
    return scene, sop


def _static_rowsums_win(buckets, own_rows, static5, m, cfg, dtype, interpret):
    """rs6 (m, 6): moment row sums from a ones-RHS kernel call (build time)."""
    from ..ops.pallas.pair_kernels import _interpret_default
    from ..ops.pallas.window_kernels import moments_win

    interpret = _interpret_default() if interpret is None else interpret
    ns = static5.shape[1]
    ones_src = jnp.concatenate([jnp.ones((3, ns), dtype), static5], axis=0)
    parts = [moments_win(ones_src, own_rows, b.offsets, b.tile_start,
                         b.windows, cfg.h, interpret) for b in buckets]
    return jnp.concatenate(parts, axis=0).reshape(m, 18)[:, 0::3]


def elastic_forces_windows(pos_slots, ratio_slots, mats: Materials,
                           scene: Scene, cfg: SimConfig, interpret=None):
    """Window-DMA pair kernels + lane-packed XLA mid-section (warp pairing)."""
    from ..ops.pallas.pair_kernels import _interpret_default
    from ..ops.pallas.window_kernels import forces_win, moments_win

    if cfg.pair_def_grad != "i":
        raise NotImplementedError(
            "windows backend implements warp pairing (pair_def_grad='i') only")
    interpret = _interpret_default() if interpret is None else interpret
    wb: WinBlocked = scene.blocked
    t, rows = wb.n_tiles, wb.rows
    m = t * rows
    ns = wb.n_slots
    dtype = pos_slots.dtype

    k1src = jnp.concatenate([pos_slots.T, wb.static5], axis=0)   # (8, ns)
    ay = jnp.concatenate([
        moments_win(k1src, wb.own_rows, b.offsets, b.tile_start,
                    b.windows, cfg.h, interpret)
        for b in wb.buckets
    ], axis=0).reshape(m, 18)

    rs6 = wb.rs6
    pos_m = pos_slots[:m]
    A_raw = mat3.transpose3(mat3.from_trailing(ay[:, :9].reshape(m, 3, 3)))
    Y_raw = mat3.transpose3(mat3.from_trailing(ay[:, 9:18].reshape(m, 3, 3)))
    A = mat3.pack([[A_raw[a, b] - pos_m[:, a] * rs6[:, b]
                    for b in range(3)] for a in range(3)])
    Y = mat3.pack([[Y_raw[a, b] - pos_m[:, a] * rs6[:, 3 + b]
                    for b in range(3)] for a in range(3)])
    R, F, S, M, _G, vol_m = _mid_section(A, Y, ratio_slots, mats, scene, cfg, m)

    # LANE-MAJOR (19, m) — one compact stack, no transpose, no 128-lane pad
    fmT = jnp.stack(
        [F[0, 0], F[0, 1], F[0, 2], F[1, 0], F[1, 1], F[1, 2],
         F[2, 0], F[2, 1], F[2, 2],
         M[0, 0], M[0, 1], M[0, 2], M[1, 0], M[1, 1], M[1, 2],
         M[2, 0], M[2, 1], M[2, 2], vol_m], axis=0)
    fmT = jax.lax.optimization_barrier(fmT)

    def comp_n(c):  # (m,) -> (ns,) zero-padded
        return jnp.concatenate([c, jnp.zeros((ns - m,), dtype)])

    sr15 = jnp.stack([comp_n(c) for c in (
        S[0, 0], S[0, 1], S[0, 2], S[1, 1], S[1, 2], S[2, 2],
        R[0, 0], R[1, 0], R[2, 0], R[0, 1], R[1, 1], R[2, 1],
        R[0, 2], R[1, 2], R[2, 2])], axis=0)                 # (15, ns)
    sr15 = jax.lax.optimization_barrier(sr15)
    k2src = jnp.concatenate([sr15, wb.static5], axis=0)      # (20, ns)

    def fmT_of(b):
        return jax.lax.slice_in_dim(fmT, b.tile_start * rows,
                                    (b.tile_start + b.n_tiles) * rows, axis=1)

    f = jnp.concatenate([
        forces_win(k2src, wb.own_rows, fmT_of(b), b.offsets,
                   b.tile_start, b.windows, cfg.h, interpret)
        for b in wb.buckets
    ], axis=0)
    out = jnp.zeros_like(pos_slots)
    return out.at[:m].set(f.reshape(m, 3))
