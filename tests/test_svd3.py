"""Tests for the batched Jacobi 3x3 SVD and differentiable polar rotation.

Covers the hard cases called out in SURVEY.md §7 (degenerate sigmas — the
reference hand-clamps at utils.py:65-73): random, near-identity (the A_pq
regime), rank-deficient, negative-determinant, and zero matrices, plus a
finite-difference check of the custom VJP.
"""

import numpy as np
import jax
import jax.numpy as jnp

from softbody_tpu.ops.svd3 import eigh3, polar3, svd3


def _random_batch(n=256, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    return rng.normal(scale=scale, size=(n, 3, 3))


def test_svd_reconstruction_random():
    A = _random_batch()
    U, s, V = svd3(jnp.asarray(A))
    U, s, V = np.asarray(U), np.asarray(s), np.asarray(V)
    recon = np.einsum("nab,nb,ncb->nac", U, s, V)
    np.testing.assert_allclose(recon, A, atol=1e-8)
    # orthogonality
    np.testing.assert_allclose(np.einsum("nba,nbc->nac", U, U), np.tile(np.eye(3), (len(A), 1, 1)), atol=1e-9)
    np.testing.assert_allclose(np.einsum("nba,nbc->nac", V, V), np.tile(np.eye(3), (len(A), 1, 1)), atol=1e-9)
    # singular values match numpy, descending, non-negative
    s_np = np.linalg.svd(A, compute_uv=False)
    np.testing.assert_allclose(s, s_np, atol=1e-8)
    assert (np.diff(s, axis=-1) <= 1e-10).all()
    assert (s >= 0).all()


def test_eigh3_matches_numpy():
    A = _random_batch(128, seed=3)
    S = np.einsum("nba,nbc->nac", A, A)
    evals, V = eigh3(jnp.asarray(S))
    evals = np.asarray(evals)
    w_np = np.linalg.eigvalsh(S)[:, ::-1]
    np.testing.assert_allclose(evals, w_np, atol=1e-8)
    # eigenvector property
    SV = np.einsum("nab,nbc->nac", S, np.asarray(V))
    VD = np.asarray(V) * evals[:, None, :]
    np.testing.assert_allclose(SV, VD, atol=1e-7)


def test_polar_matches_numpy_uvt():
    A = _random_batch(256, seed=1)
    R = np.asarray(polar3(jnp.asarray(A)))
    U, _, Vh = np.linalg.svd(A)
    R_np = U @ Vh
    np.testing.assert_allclose(R, R_np, atol=1e-7)


def test_polar_near_identity_shape_matching_regime():
    # A_pq for small deformations is ~ (positive scale) * rotation
    rng = np.random.default_rng(5)
    th = rng.uniform(-0.3, 0.3, 64)
    Rz = np.zeros((64, 3, 3))
    Rz[:, 0, 0] = np.cos(th); Rz[:, 0, 1] = -np.sin(th)
    Rz[:, 1, 0] = np.sin(th); Rz[:, 1, 1] = np.cos(th)
    Rz[:, 2, 2] = 1.0
    scale = rng.uniform(0.5, 2.0, (64, 1, 1))
    A = scale * Rz + rng.normal(scale=1e-4, size=(64, 3, 3))
    R = np.asarray(polar3(jnp.asarray(A)))
    np.testing.assert_allclose(R, Rz, atol=1e-3)


def test_degenerate_inputs_no_nans():
    A = np.zeros((5, 3, 3))
    A[1] = np.diag([1.0, 0.0, 0.0])            # rank 1
    A[2] = np.diag([1.0, 1.0, 0.0])            # rank 2
    A[3] = np.diag([1.0, 1.0, -1.0])           # negative det
    A[4] = np.eye(3) * 1e-20                   # tiny
    U, s, V = svd3(jnp.asarray(A))
    R = polar3(jnp.asarray(A))
    for arr in (U, s, V, R):
        assert np.isfinite(np.asarray(arr)).all()
    # U, V still orthonormal even at rank deficiency
    for M in (np.asarray(U), np.asarray(V)):
        np.testing.assert_allclose(
            np.einsum("nba,nbc->nac", M, M), np.tile(np.eye(3), (5, 1, 1)), atol=1e-6
        )
    # gradient at degenerate inputs is finite (the clamp in _polar_bwd)
    g = jax.grad(lambda a: jnp.sum(polar3(a)))(jnp.asarray(A))
    assert np.isfinite(np.asarray(g)).all()


def test_polar_vjp_matches_finite_differences():
    rng = np.random.default_rng(7)
    A = rng.normal(size=(4, 3, 3))
    G = rng.normal(size=(4, 3, 3))  # cotangent

    def f(a):
        return jnp.sum(polar3(a) * jnp.asarray(G))

    g_ana = np.asarray(jax.grad(f)(jnp.asarray(A)))
    eps = 1e-6
    g_num = np.zeros_like(A)
    for n in range(A.shape[0]):
        for i in range(3):
            for j in range(3):
                Ap = A.copy(); Ap[n, i, j] += eps
                Am = A.copy(); Am[n, i, j] -= eps
                g_num[n, i, j] = (float(f(jnp.asarray(Ap))) - float(f(jnp.asarray(Am)))) / (2 * eps)
    np.testing.assert_allclose(g_ana, g_num, rtol=1e-4, atol=1e-6)


def test_polar_negative_det_matches_reference_convention():
    # wp.svd3 returns a proper SVD (sigma >= 0); R = U V^T may be a reflection
    # for det(A) < 0 — we must match, not "fix", that convention.
    A = _random_batch(64, seed=11)
    A[::2] *= -1.0
    R = np.asarray(polar3(jnp.asarray(A)))
    U, _, Vh = np.linalg.svd(A)
    np.testing.assert_allclose(R, U @ Vh, atol=1e-6)
