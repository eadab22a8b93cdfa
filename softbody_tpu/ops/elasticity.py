"""Corotated meshless StVK elasticity as dense gather-reduce ops.

The reference runs three gather-reduce CUDA kernels per step over hash-grid
queries (compute_A_pq / compute_nabla_u / compute_elastic_forces,
sim.py:170-235).  Here each becomes a statically-shaped gather over the
precomputed ``(N, K)`` rest-topology table plus dense einsum reductions — the
form XLA tiles well onto the TPU VPU/MXU, with no atomics and deterministic
reduction order.

Two algebraic restructurings (vs the reference) that cut gather traffic:

* ``nabla_u_i = R_i^T Y_i - C_i`` where ``Y_i = sum_j V_j p_ji (x) nW_ij`` and
  ``C_i`` is a *rest-space constant* (Topology.rest_corr).  The reference
  recomputes the full sum with the rotated term per pair (sim.py:193-209).
* per-particle products ``M_i = R_i F_i S_i`` are formed ONCE and gathered,
  instead of recomputing SVD + stress per neighbor pair — the reference's
  force kernel recomputes R_j for EVERY pair (sim.py:230), its hottest waste.

Both A_pq and Y share one gather of neighbor positions.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import SimConfig
from ..core.types import Materials, Topology
from .svd3 import polar3


def gather(a, idx):
    """Row gather: a (N, ...) -> (N, K, ...) by idx (N, K)."""
    return jnp.take(a, idx, axis=0)


def compute_ratio(x, cfg: SimConfig):
    """Inflation parameterization ratio = 0.5 tanh(gain*x) + 0.5 (sim.py:107-110)."""
    return 0.5 * jnp.tanh(cfg.tanh_gain * x) + 0.5


def deformation(pos, topo: Topology, cfg: SimConfig):
    """A_pq, R, F from current positions.  One (N, K, 3) position gather."""
    pj = gather(pos, topo.idx)                    # (N, K, 3)
    pji = pj - pos[:, None, :]
    # A_pq_i = sum_j c_ij p_ji (x) X_ji   (sim.py:170-183)
    A = jnp.einsum("ij,ija,ijb->iab", topo.c, pji, topo.xji)
    if cfg.corotated:
        R = polar3(A)
    else:                                          # sim_taichi.py:129 (R_i <- I)
        R = jnp.broadcast_to(jnp.eye(3, dtype=pos.dtype), A.shape)
    # Y_i = sum_j V_j p_ji (x) nW_ij ;   nabla_u = R^T Y - rest_corr
    Y = jnp.einsum("ij,ija,ijb->iab", topo.vj, pji, topo.nw)
    if cfg.corotated:
        nabla_u = jnp.einsum("iba,ibc->iac", R, Y) - topo.rest_corr
    else:
        nabla_u = Y - topo.rest_corr
    F = jnp.eye(3, dtype=pos.dtype) + jnp.swapaxes(nabla_u, -1, -2)  # sim.py:209
    return A, R, F


def stvk_stress(F, mu, lam, scale):
    """S = (2 mu E + lam tr(E) I) * inflation scale, E = 0.5 (F^T F - I)
    (compute_sigma, sim.py:212-216)."""
    E = 0.5 * (jnp.einsum("iba,ibc->iac", F, F) - jnp.eye(3, dtype=F.dtype))
    tr = jnp.trace(E, axis1=-2, axis2=-1)
    S = 2.0 * mu[:, None, None] * E + lam[:, None, None] * tr[:, None, None] * jnp.eye(3, dtype=F.dtype)
    return S * scale[:, None, None]


def elastic_forces(pos, ratio, mats: Materials, topo: Topology, cfg: SimConfig):
    """Pairwise antisymmetrized elastic forces (compute_elastic_forces,
    sim.py:218-235 / sim_taichi.py:147-158).

    force_i = 0.5 sum_j (R_j f_ij - R_i f_ji),
      f_ji = -V_i F_i S_i (V_j nW_ij),  f_ij = V_j F_pair S_j (V_i nW_ij).

    For F_pair = F_j (Taichi) the sum separates per particle:
      force_i = 0.5 V_i [ sum_j (V_j M_j) nW_ij  +  M_i (sum_j V_j nW_ij) ],
      M_k = R_k F_k S_k,
    so only one (N, K, 3, 3) gather of G = V*M is needed.  For F_pair = F_i
    (Warp, sim.py:233) the pair mixes i and j: gather R_j and V_j S_j instead.
    """
    _, R, F = deformation(pos, topo, cfg)
    scale = cfg.stiffness_scale(ratio)
    S = stvk_stress(F, mats.mu, mats.lam, scale)
    M = jnp.einsum("iab,ibc,icd->iad", R, F, S)          # R_i F_i S_i
    # local term: -R_i f_ji summed = V_i * M_i @ sum_v_nw_i
    term_i = jnp.einsum("iab,ib->ia", M, topo.sum_v_nw)

    if cfg.pair_def_grad == "j":
        G = mats.volume[:, None, None] * M                # V_j M_j
        Gj = gather(G, topo.idx)                          # (N, K, 3, 3)
        term_j = jnp.einsum("ijab,ijb->ia", Gj, topo.nw)
    else:
        VS = mats.volume[:, None, None] * S               # V_j S_j
        VSj = gather(VS, topo.idx)
        Rj = gather(R, topo.idx)
        y = jnp.einsum("iab,ijbc,ijc->ija", F, VSj, topo.nw)   # F_i (V_j S_j) nW
        term_j = jnp.einsum("ijab,ijb->ia", Rj, y)             # R_j @ y
    return 0.5 * mats.volume[:, None] * (term_j + term_i), (R, F, S)
