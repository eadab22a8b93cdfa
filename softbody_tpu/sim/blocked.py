"""Blocked-backend scene building and elastic forces.

``build_blocked_scene`` scatters a particle body into the column-dense slot
space (topology/blocks.py) and returns a standard Scene whose particle axis is
SLOTS (empty slots inert: far-away rest position, zero mass/volume, Dirichlet
frozen).  The rollout machinery (sim/rollout.py) is reused unchanged; only the
elastic-force evaluation dispatches to the blocked pair path
(cfg.backend == "blocked").
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..config import SimConfig
from ..core.types import Materials, Scene
from ..ops import mat3
from ..ops.blocked import (
    Blocked, far_grid, forces_xla, gather_rows, gather_slab, moments_xla,
)
from ..topology.blocks import build_slot_layout
from .scene import lame_parameters


def _pregather(arr_np, layout, dtype):
    """Host-side static slab/row pregather: (n_slots, F) -> tile structures."""
    idx = (
        layout.slab_start[:, :, None]
        + np.arange(layout.run_len, dtype=np.int64)[None, None, :]
    ).reshape(layout.n_tiles, layout.slab_len)
    return jnp.asarray(arr_np[idx], dtype)


def build_blocked_scene(
    points: np.ndarray,
    cfg: SimConfig,
    out_num: int | None = None,
    tz: int = 4,
    capacity: int | None = None,
    dirichlet_mask: np.ndarray | None = None,
    external_force: np.ndarray | None = None,
    obstacles=None,
    layout: str = "varcol",
    rows: int = 32,
):
    """Returns (scene, slot_of_particle).

    ``scene.rest_position`` etc. live in slot space; map particle-indexed data
    (x, targets, dirichlet masks) through ``slot_of_particle``.

    layout: "varcol" (variable-capacity z-sorted columns — low pair waste,
    default) or "cells" (fixed-capacity cell grid, tz cells per tile).
    """
    rest = np.asarray(points, dtype=np.float64)
    n = rest.shape[0]
    dtype = cfg.dtype
    if layout == "varcol":
        from ..topology.blocks import build_varcol_layout

        layout = build_varcol_layout(rest, 2.0 * cfg.h, rows=rows)
    else:
        layout = build_slot_layout(rest, 2.0 * cfg.h, tz=tz, capacity=capacity)
    ns = layout.n_slots
    sop = layout.slot_of_particle

    # slot-space rest positions: real particles in place, empties on a far grid
    span = float(np.abs(rest).max()) + 1.0
    rest_slots = far_grid(ns, start=span + 100.0 * cfg.h, spacing=4.0 * cfg.h)
    rest_slots[sop] = rest
    real = layout.particle_of_slot >= 0

    # coefficient mass (0 for empty slots -> pair terms vanish) vs integrator
    # mass (1 for empty slots -> no 0/0 in force/m; they're frozen anyway)
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

    m_tiles = layout.n_tiles * layout.tile_rows
    rest_slab = _pregather(rest_slots, layout, dtype)
    rest_rows = jnp.asarray(
        rest_slots[:m_tiles].reshape(layout.n_tiles, layout.tile_rows, 3), dtype
    )
    def group_idx(g):
        # per-tile packed-row indices for group size g (run starts are
        # multiples of 32 >= g, run_len is a multiple of 32)
        offs = np.arange(layout.run_len // g, dtype=np.int64)
        gi = layout.slab_start[:, :, None] // g + offs[None, None, :]
        return jnp.asarray(gi.reshape(layout.n_tiles, layout.slab_len // g), jnp.int32)

    blocked = Blocked(
        tile_start=jnp.asarray(layout.tile_start, jnp.int32),
        slab_start=jnp.asarray(layout.slab_start, jnp.int32),
        rest_slab=rest_slab,
        vol_slab=jnp.zeros((layout.n_tiles, layout.slab_len), dtype),
        mass_slab=_pregather(mass, layout, dtype),
        rest_rows=rest_rows,
        restT_rows=jnp.swapaxes(rest_rows, 1, 2),
        static_slab=None,   # built below once volume is known
        gidx8=group_idx(8),
        gidx4=group_idx(4),
        rs6=None,
        rows=layout.tile_rows,
        slab_len=layout.slab_len,
        run_len=layout.run_len,
        n_tiles=layout.n_tiles,
        n_slots=ns,
    )

    # density / volume via the blocked pair machinery itself (one jit call):
    # rho_i = sum_j m_j w_ij (+ self term if cfg.self_density)
    @jax.jit
    def density(blk):
        from ..ops.blocked import pair_w_gfac

        _, w, _ = pair_w_gfac(blk.rest_rows, blk.rest_slab, cfg.h, blk.rest_rows.dtype)
        rho = jnp.einsum("trs,ts->tr", w, blk.mass_slab).reshape(-1)
        return rho

    rho_rows = np.asarray(density(blocked), np.float64)
    rho = np.zeros(ns)
    rho[:m_tiles] = rho_rows
    if cfg.self_density:
        rho = rho + mass * (1.0 / (np.pi * cfg.h**3))
    volume = np.where(real & (rho > 0), mass / np.where(rho > 0, rho, 1.0), 0.0)

    blocked = jax.tree_util.tree_map(lambda x: x, blocked)  # copy
    import dataclasses as _dc

    vol_slab = _pregather(volume, layout, dtype)
    static_slab = jnp.concatenate([
        jnp.swapaxes(blocked.rest_slab, 1, 2),
        blocked.mass_slab[:, None, :],
        vol_slab[:, None, :],
    ], axis=1)
    blocked = _dc.replace(blocked, vol_slab=vol_slab, static_slab=static_slab)

    # static moment row sums (one build-time moments call on an all-ones RHS;
    # a per-step ones call would not be hoisted out of the episode scan)
    from ..ops.pallas.packed import moments_packed
    from ..ops.pallas.pair_kernels import _interpret_default

    ay1 = moments_packed(
        blocked.restT_rows, blocked.static_slab, None,
        jnp.ones((ns, 3), dtype), blocked.gidx8, cfg.h,
        _interpret_default(),
    ).reshape(m_tiles, 18)
    blocked = _dc.replace(blocked, rs6=ay1[:, 0::3])

    # static rest correction: Y evaluated at the rest configuration
    @jax.jit
    def rest_corr_fn(blk):
        rr = blk.rest_rows
        rs = blk.rest_slab
        _, Y = moments_xla(rr, rs, blk, cfg)
        return Y

    rest_corr4 = rest_corr_fn(blocked)                      # (t, rows, 3, 3)
    rest_corr = mat3.from_trailing(rest_corr4.reshape(m_tiles, 3, 3))

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
        blocked=blocked,
        rest_corr=rest_corr,
        slot_of_particle=jnp.asarray(sop, jnp.int32),
        obstacles=obstacles,
    )
    return scene, sop


def stvk_stress_m3(F, mu, lam, scale):
    """StVK stress in mat3 layout: F (3,3,m), mu/lam/scale (m,)."""
    E = 0.5 * (mat3.matTmul3(F, F) - mat3.eye3(F))
    tr = mat3.trace3(E)
    S = 2.0 * mu * E + lam * tr * mat3.eye3(F)
    return S * scale


def _mid_section(A, Y, ratio_slots, mats: Materials, scene: Scene, cfg: SimConfig, m):
    """Per-slot algebra between the two pair stages (mat3 layout, (3,3,m)):
    polar rotation, deformation gradient, StVK stress, M = R F S, G = V M."""
    if cfg.corotated:
        R = mat3.polar3(A)
        nab = mat3.matTmul3(R, Y) - scene.rest_corr
    else:
        R = mat3.eye3(A)
        nab = Y - scene.rest_corr
    F = mat3.eye3(A) + mat3.transpose3(nab)
    scale = cfg.stiffness_scale(ratio_slots[:m])
    S = stvk_stress_m3(F, mats.mu[:m], mats.lam[:m], scale)
    M = mat3.matmul3(R, mat3.matmul3(F, S))
    vol_m = mats.volume[:m]
    G = vol_m * M                                           # V_k R F S
    return R, F, S, M, G, vol_m


def elastic_forces_blocked(pos_slots, ratio_slots, mats: Materials, scene: Scene,
                           cfg: SimConfig):
    """Blocked-path elastic forces over slot space.  Differentiable (XLA ref)."""
    blk: Blocked = scene.blocked
    m = blk.n_tiles * blk.rows
    pos_rows = gather_rows(pos_slots, blk)                 # (t, rows, 3)
    pos_slab = gather_slab(pos_slots, blk)                 # (t, slab, 3)
    A4, Y4 = moments_xla(pos_rows, pos_slab, blk, cfg)
    A = mat3.from_trailing(A4.reshape(m, 3, 3))
    Y = mat3.from_trailing(Y4.reshape(m, 3, 3))
    R, F, S, M, G, vol_m = _mid_section(A, Y, ratio_slots, mats, scene, cfg, m)

    def to_slot9(X):
        out = jnp.zeros((blk.n_slots, 9), dtype=pos_slots.dtype)
        return out.at[:m].set(mat3.to_trailing(X).reshape(m, 9))

    G_rows = mat3.to_trailing(G).reshape(blk.n_tiles, blk.rows, 3, 3)
    if cfg.pair_def_grad == "j":
        G_slab = gather_slab(to_slot9(G), blk).reshape(blk.n_tiles, blk.slab_len, 3, 3)
        f4 = forces_xla(G_rows, G_slab, vol_m.reshape(blk.n_tiles, blk.rows), blk, cfg)
    else:
        S_slab = gather_slab(to_slot9(S), blk).reshape(blk.n_tiles, blk.slab_len, 3, 3)
        R_slab = gather_slab(to_slot9(R), blk).reshape(blk.n_tiles, blk.slab_len, 3, 3)
        F_rows = mat3.to_trailing(F).reshape(blk.n_tiles, blk.rows, 3, 3)
        f4 = forces_xla(
            G_rows, None, vol_m.reshape(blk.n_tiles, blk.rows), blk, cfg,
            F_rows=F_rows, S_slab=S_slab, R_slab=R_slab, vol_slab=blk.vol_slab,
        )
    out = jnp.zeros_like(pos_slots)
    return out.at[:m].set(f4.reshape(m, 3))


def elastic_forces_pallas(pos_slots, ratio_slots, mats: Materials, scene: Scene,
                          cfg: SimConfig, interpret=None):
    """Fused Pallas pair kernels + lane-packed XLA mid-section.

    Identical math to :func:`elastic_forces_blocked`.  Neighbor slabs move as
    packed 128-float rows through XLA gathers (measured ~2ns/row / 263GB/s on
    v5e — see ops/pallas/packed.py); the pair stages run as TPU kernels with
    custom VJPs, so the whole path differentiates (backward pays an XLA
    scatter-add for the slab transpose).
    """
    from ..ops.pallas.packed import forces_packed, forces_warp_packed, moments_packed
    from ..ops.pallas.pair_kernels import _interpret_default
    from .sparse import SparseBlocked, elastic_forces_sparse

    if isinstance(scene.blocked, SparseBlocked):
        return elastic_forces_sparse(pos_slots, ratio_slots, mats, scene, cfg,
                                     interpret=interpret)
    interpret = _interpret_default() if interpret is None else interpret
    blk: Blocked = scene.blocked
    t, rows = blk.n_tiles, blk.rows
    m = t * rows
    dtype = pos_slots.dtype

    def moments_all(p_slots):
        return moments_packed(
            blk.restT_rows, blk.static_slab, None,
            p_slots, blk.gidx8, cfg.h, interpret,
        ).reshape(m, 18)

    ay = moments_all(pos_slots)
    rs6 = blk.rs6
    pos_m = pos_slots[:m]
    # relabel [3b+a] (free) and subtract the correction component-wise in the
    # lane-packed mat3 space (see elastic_forces_sparse)
    A_raw = mat3.transpose3(mat3.from_trailing(ay[:, :9].reshape(m, 3, 3)))
    Y_raw = mat3.transpose3(mat3.from_trailing(ay[:, 9:18].reshape(m, 3, 3)))
    A = mat3.pack([[A_raw[a, b] - pos_m[:, a] * rs6[:, b]
                    for b in range(3)] for a in range(3)])
    Y = mat3.pack([[Y_raw[a, b] - pos_m[:, a] * rs6[:, 3 + b]
                    for b in range(3)] for a in range(3)])
    R, F, S, M, G, vol_m = _mid_section(A, Y, ratio_slots, mats, scene, cfg, m)
    vol_rows = vol_m.reshape(t, rows)

    def to_slot(X, width):
        out = jnp.zeros((blk.n_slots, width), dtype=dtype)
        return out.at[:m].set(mat3.to_trailing(X).reshape(m, width))

    if cfg.pair_def_grad == "j":
        G9_rows = mat3.to_trailing(G).reshape(t, rows, 9)
        f = forces_packed(
            blk.restT_rows, blk.static_slab,
            G9_rows, to_slot(G, 9), vol_rows, blk.gidx8, cfg.h, interpret,
        )
    else:
        # Warp mode (sim.py:233): fused [F|M|V] rows + [S_6|R_9^T] slot record
        from ..ops.pallas.packed import rows_from_components

        fm_rows = rows_from_components(
            [F[0, 0], F[0, 1], F[0, 2], F[1, 0], F[1, 1], F[1, 2],
             F[2, 0], F[2, 1], F[2, 2],
             M[0, 0], M[0, 1], M[0, 2], M[1, 0], M[1, 1], M[1, 2],
             M[2, 0], M[2, 1], M[2, 2], vol_m], t, rows)
        from ..ops.pallas.packed import pack_components

        # pair_dtype is an explicit bf16 opt-in; otherwise keep the sim dtype
        pdt = (jnp.dtype("bfloat16") if cfg.pair_dtype == "bfloat16"
               else jnp.dtype(dtype))
        sr_packed = pack_components(
            [c.astype(pdt) for c in
             (S[0, 0], S[0, 1], S[0, 2], S[1, 1], S[1, 2], S[2, 2],
              R[0, 0], R[1, 0], R[2, 0], R[0, 1], R[1, 1], R[2, 1],
              R[0, 2], R[1, 2], R[2, 2])], 16, 8, n_total=blk.n_slots)
        f = forces_warp_packed(
            blk.restT_rows, blk.static_slab,
            fm_rows, sr_packed, blk.gidx8, cfg.h, interpret,
        )
    out = jnp.zeros_like(pos_slots)
    return out.at[:m].set(f.reshape(m, 3))

