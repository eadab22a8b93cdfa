"""Implicit obstacles: analytic SDF primitives + DeepSDF shapes.

The reference's only contact is the ground-plane penalty (sim.py:238-244).
BASELINE.json configs #3/#4 call for SDF-based collision against implicit
obstacles; this module provides a composable obstacle set as a JAX pytree
(static ``kinds`` + array params) and the penalty force

    f = stiffness * max(margin - sdf(p), 0)^2 * normalize(grad sdf)

evaluated with closed-form gradients for primitives and autodiff for DeepSDF.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["params"],
    meta_fields=["kinds", "stiffness", "margin"],
)
@dataclasses.dataclass(frozen=True)
class Obstacles:
    """A set of implicit obstacles.

    kinds:  tuple of "sphere" | "plane" | "box" | "deepsdf"
    params: tuple of per-obstacle param pytrees:
      sphere:  (center (3,), radius ())
      plane:   (normal (3,), offset ())        sdf = n.p - offset
      box:     (center (3,), half (3,))
      deepsdf: (DeepSDFParams, scale (), offset (3,))
    """

    kinds: tuple
    params: tuple
    stiffness: float = 3e5
    margin: float = 1e-4


def sphere(center, radius, **kw):
    return ("sphere", (jnp.asarray(center, jnp.float32), jnp.asarray(radius, jnp.float32)))


def plane(normal, offset, **kw):
    n = jnp.asarray(normal, jnp.float32)
    n = n / jnp.linalg.norm(n)
    return ("plane", (n, jnp.asarray(offset, jnp.float32)))


def box(center, half):
    return ("box", (jnp.asarray(center, jnp.float32), jnp.asarray(half, jnp.float32)))


def deepsdf(params, scale=1.0, offset=(0.0, 0.0, 0.0)):
    return ("deepsdf", (params, jnp.asarray(scale, jnp.float32),
                        jnp.asarray(offset, jnp.float32)))


def make(*primitives, stiffness=3e5, margin=1e-4) -> Obstacles:
    kinds = tuple(p[0] for p in primitives)
    params = tuple(p[1] for p in primitives)
    return Obstacles(kinds=kinds, params=params, stiffness=stiffness, margin=margin)


def _sdf_one(kind: str, param, pos):
    """Signed distance of (N, 3) positions to one obstacle (negative inside)."""
    if kind == "sphere":
        center, radius = param
        return jnp.linalg.norm(pos - center, axis=-1) - radius
    if kind == "plane":
        normal, offset = param
        return pos @ normal - offset
    if kind == "box":
        center, half = param
        q = jnp.abs(pos - center) - half
        outside = jnp.linalg.norm(jnp.maximum(q, 0.0), axis=-1)
        inside = jnp.minimum(jnp.max(q, axis=-1), 0.0)
        return outside + inside
    if kind == "deepsdf":
        from ..models.deepsdf import forward

        params, scale, offset = param
        return forward(params, (pos - offset) / scale).squeeze(-1) * scale
    raise ValueError(kind)


def sdf(obstacles: Obstacles, pos):
    """min over obstacles of the signed distance; (N, 3) -> (N,)."""
    vals = [_sdf_one(k, p, pos) for k, p in zip(obstacles.kinds, obstacles.params)]
    out = vals[0]
    for v in vals[1:]:
        out = jnp.minimum(out, v)
    return out


def penalty_force(obstacles: Obstacles, pos):
    """Quadratic penalty pushing particles out of obstacles; (N, 3) -> (N, 3)."""
    def phi(p):
        return jnp.sum(sdf(obstacles, p[None, :]))

    val = sdf(obstacles, pos)
    grad = jax.vmap(jax.grad(phi))(pos)
    n = grad / jnp.maximum(jnp.linalg.norm(grad, axis=-1, keepdims=True), 1e-9)
    depth = jnp.maximum(obstacles.margin - val, 0.0)
    return obstacles.stiffness * (depth * depth)[:, None] * n
