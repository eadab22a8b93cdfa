"""Core SoA pytree types.

The reference keeps state as module-global Warp/Taichi arrays with (frames+1)
time-copies for tape autodiff (``sim.py:84-95``, ``sim_taichi.py:45-63``).  Here
state is a small immutable pytree carried through ``jax.lax.scan``; the trajectory
is never materialized (reverse-mode memory comes from ``jax.checkpoint`` instead).

All types are NamedTuples so they are automatically JAX pytrees, work under
``jit``/``grad``/``shard_map``, and keep an SoA layout (each leaf is a dense
(N, ...) array - the TPU-friendly structure-of-arrays form).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class ParticleState(NamedTuple):
    """Dynamic per-particle state carried across timesteps.

    ``elastic_forces`` is part of the carry because the reference's trapezoidal
    integrator reuses the forces computed at the end of the previous step
    (``sim.py:353`` reads ``elastic_forces[f]`` produced by the previous
    iteration's ``sim.py:357``).
    """

    position: jnp.ndarray        # (N, 3)
    velocity: jnp.ndarray        # (N, 3)
    elastic_forces: jnp.ndarray  # (N, 3)


class Materials(NamedTuple):
    """Per-particle material and constraint fields (constant within an episode)."""

    mass: jnp.ndarray        # (N,)
    volume: jnp.ndarray      # (N,)   V_i = m_i / rho_i
    mu: jnp.ndarray          # (N,)   first Lame parameter
    lam: jnp.ndarray         # (N,)   second Lame parameter
    free: jnp.ndarray        # (N, 3) Dirichlet mask (1 = free, 0 = clamped), sim.py:81
    external: jnp.ndarray    # (N, 3) constant external force


class Topology(NamedTuple):
    """Static rest-space neighbor tables + precomputed SPH constants.

    The reference builds its hash grid ONCE over rest positions and queries at
    rest coordinates in every kernel (``sim.py:127,178,203,224``), so topology is
    static.  We exploit that: a padded (N, K) neighbor index table plus cached
    rest-space kernel values turn every per-step gather-reduce into dense,
    statically-shaped TPU ops.

    Padding rows point at the particle itself (``idx[i,k] = i``) with
    ``mask = 0`` so gathers stay in-bounds and masked terms vanish.
    """

    idx: jnp.ndarray          # (N, K) int32 neighbor indices
    mask: jnp.ndarray         # (N, K) {0,1} validity (real dtype for cheap multiplies)
    w: jnp.ndarray            # (N, K) W(X_i - X_j, h)           rest kernel value
    nw: jnp.ndarray           # (N, K, 3) grad_W(X_i - X_j, h)   rest kernel gradient
    xji: jnp.ndarray          # (N, K, 3) X_j - X_i              rest offsets
    # Precomputed per-particle reductions over the rest neighborhood:
    c: jnp.ndarray            # (N, K) w_ij * m_j                (A_pq weights)
    vj: jnp.ndarray           # (N, K) V_j * mask                (gathered neighbor volumes)
    sum_c_xji: jnp.ndarray    # (N, 3)   sum_j c_ij * X_ji
    rest_corr: jnp.ndarray    # (N, 3, 3) sum_j V_j * X_ji (x) nw_ij   (nabla_u rest term)
    sum_v_nw: jnp.ndarray     # (N, 3)   sum_j V_j * nw_ij       (force local term)

    @property
    def n_particles(self) -> int:
        return self.idx.shape[0]

    @property
    def max_neighbors(self) -> int:
        return self.idx.shape[1]


class Scene(NamedTuple):
    """Everything needed to run an episode except the design variable ``x``.

    Exactly one of ``topology`` (gather backend) / ``blocked`` (column-dense
    slot backend, sim/blocked.py) is set; for blocked scenes the particle axis
    is SLOTS and ``slot_of_particle`` maps original particle order into it.
    """

    rest_position: jnp.ndarray   # (N, 3)
    materials: Materials
    topology: Topology | None
    out_num: int                 # number of outer-shell particles (sim.py:53)
    blocked: object = None       # ops.blocked.Blocked for the blocked backend
    rest_corr: jnp.ndarray | None = None       # (3, 3, m) static nabla_u rest term
    slot_of_particle: jnp.ndarray | None = None  # (n_particles,) particle -> slot
    obstacles: object = None     # ops.obstacles.Obstacles (SDF contact), optional
    contact: object = None       # ops.contact.ContactGrid (dynamic re-binned
                                 # particle-particle contact), optional
