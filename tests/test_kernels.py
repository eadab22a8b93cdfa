"""Unit tests for the SPH cubic-spline kernel W and grad W.

Strategy (SURVEY.md §4): closed-form checks + finite-difference consistency —
the reference's only automated validation idea (grad_check, sim.py:418-436)
applied at the op level.
"""

import numpy as np
import jax
import jax.numpy as jnp

from softbody_tpu.oracle import sim as oracle
from softbody_tpu.ops import kernels


def test_w_normalization():
    # The cubic spline integrates to ~1 over its 2h support.
    h = 0.1
    rng = np.random.default_rng(0)
    # Monte-Carlo integral over the support ball of radius 2h
    pts = rng.uniform(-2 * h, 2 * h, size=(400000, 3))
    vals = oracle.W(pts, h)
    integral = vals.mean() * (4 * h) ** 3
    assert abs(integral - 1.0) < 2e-2


def test_w_piecewise_values():
    h = 0.05
    c = 1.0 / (np.pi * h**3)
    # q = 0
    assert np.isclose(oracle.W(np.zeros(3), h), c)
    # q = 1 from both pieces: c*(1-1.5+0.75) = 0.25c ; 0.25c*(2-1)^3 = 0.25c
    x = np.array([h, 0.0, 0.0])
    assert np.isclose(oracle.W(x, h), 0.25 * c)
    # q >= 2 -> 0
    assert oracle.W(np.array([2 * h, 0, 0.0]), h) == 0.0
    assert oracle.W(np.array([3 * h, 0, 0.0]), h) == 0.0


def test_jax_matches_oracle():
    h = 0.03
    rng = np.random.default_rng(1)
    x = rng.normal(scale=h, size=(512, 3))
    np.testing.assert_allclose(np.asarray(kernels.W(jnp.asarray(x), h)), oracle.W(x, h), rtol=1e-9)
    np.testing.assert_allclose(
        np.asarray(kernels.nabla_W(jnp.asarray(x), h)), oracle.nabla_W(x, h), rtol=1e-9, atol=1e-9
    )


def test_nabla_w_is_gradient_of_w():
    h = 0.07
    rng = np.random.default_rng(2)
    x = rng.normal(scale=h, size=(64, 3))
    # autodiff of the JAX W must equal the hand-coded nabla_W (and the oracle's)
    g_auto = jax.vmap(jax.grad(lambda p: kernels.W(p, h)))(jnp.asarray(x))
    g_hand = kernels.nabla_W(jnp.asarray(x), h)
    np.testing.assert_allclose(np.asarray(g_auto), np.asarray(g_hand), atol=1e-9)


def test_nabla_w_zero_at_origin_and_outside():
    h = 0.1
    assert np.allclose(oracle.nabla_W(np.zeros(3), h), 0.0)
    assert np.allclose(oracle.nabla_W(np.array([2.5 * h, 0, 0]), h), 0.0)
