"""Collision penalties.

Ground plane (sim.py:238-244) plus an SDF-based obstacle penalty the reference
lacks (BASELINE.json config #3/#4) — any differentiable signed-distance function
can act as an obstacle.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import SimConfig


def ground_penalty(pos, cfg: SimConfig):
    """Quadratic penalty pushing +y when y < collision_range (sim.py:238-244)."""
    delta = jnp.maximum(cfg.collision_range - pos[..., 1], 0.0)
    fy = delta * delta * cfg.collision_stiffness
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
