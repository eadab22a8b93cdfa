"""SPH cubic-spline kernel W and its gradient, in JAX.

Math from the reference (sim.py:133-151 / utils.py:25-43).  The static elasticity
path consumes *precomputed* rest-space tables (topology/neighbors.py) so these are
mainly for dynamic queries (TPU hash-grid contact, tests) and Pallas kernels.
Branch-free: both pieces are evaluated and selected with ``where`` (VPU-friendly).
"""

from __future__ import annotations

import jax.numpy as jnp


def W(xij, h):
    """Cubic-spline kernel; xij: (..., 3) -> (...,)."""
    q = jnp.linalg.norm(xij, axis=-1) / h
    c = 1.0 / (jnp.pi * h**3)
    near = c * (1.0 - 1.5 * q**2 + 0.75 * q**3)
    far = 0.25 * c * (2.0 - q) ** 3
    return jnp.where(q < 1.0, near, jnp.where(q < 2.0, far, 0.0))


def nabla_W(xij, h):
    """Gradient of W wrt xij; xij: (..., 3) -> (..., 3)."""
    q = jnp.linalg.norm(xij, axis=-1, keepdims=True) / h
    c = 1.0 / (jnp.pi * h**3)
    near = c * (-3.0 * xij / h**2 + 2.25 * q * xij / h**2)
    q_safe = jnp.where(q > 0, q, 1.0)
    far = 0.25 * c * (-3.0) * (2.0 - q) ** 2 * xij / (q_safe * h * h)
    return jnp.where(q < 1.0, near, jnp.where(q < 2.0, far, 0.0))
