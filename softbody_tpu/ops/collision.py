"""Collision penalties.

Ground plane (sim.py:238-244) plus an SDF-based obstacle penalty the reference
lacks (BASELINE.json config #3/#4) — any differentiable signed-distance function
can act as an obstacle.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import SimConfig


def ground_penalty(pos, cfg: SimConfig, vel=None):
    """Quadratic penalty pushing +y when y < collision_range (sim.py:238-244).

    Beyond-reference: when ``cfg.collision_damping > 0`` and ``vel`` is given,
    a Kelvin-Voigt normal damper ``-c * delta * v_y`` is added inside the
    contact zone (smooth in both pos and vel — the delta factor vanishes at
    the contact boundary, so the force stays C1 and differentiable).  Explicit
    penalty contact alone pumps energy into the impact ring (the round-4 drop
    scenarios' "contact heating"); a near-critical damper (c ~ 2 sqrt(2 k
    delta m) / delta) dissipates it without changing the stiffness bound."""
    delta = jnp.maximum(cfg.collision_range - pos[..., 1], 0.0)
    fy = delta * delta * cfg.collision_stiffness
    if vel is not None and cfg.collision_damping:
        fy = fy - cfg.collision_damping * delta * vel[..., 1]
    return jnp.zeros_like(pos).at[..., 1].set(fy)


def sdf_penalty(pos, sdf_fn, stiffness, margin=0.0):
    """Penalty force pushing out of an implicit obstacle.

    f = stiffness * max(margin - sdf, 0)^2 * normalize(grad sdf).
    ``sdf_fn``: (3,) -> scalar signed distance (negative inside).
    """
    def phi(p):
        return sdf_fn(p)

    val, grad = jax.vmap(jax.value_and_grad(phi))(pos)
    depth = jnp.maximum(margin - val, 0.0)
    n = grad / jnp.maximum(jnp.linalg.norm(grad, axis=-1, keepdims=True), 1e-9)
    return stiffness * (depth * depth)[:, None] * n
