"""The leading-axis (lane-efficient) mat3 module must agree exactly with the
trailing-axis reference implementation in ops/svd3.py."""

import numpy as np
import jax
import jax.numpy as jnp

from softbody_tpu.ops import mat3, svd3


def batch(n=257, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(n, 3, 3))
    return A, jnp.asarray(np.moveaxis(A, 0, -1))  # (3, 3, N)


def test_algebra_ops():
    A, At = batch()
    B, Bt = batch(seed=1)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(mat3.matmul3(At, Bt)), -1, 0), A @ B, atol=1e-12
    )
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(mat3.matTmul3(At, Bt)), -1, 0),
        np.swapaxes(A, 1, 2) @ B, atol=1e-12,
    )
    np.testing.assert_allclose(np.asarray(mat3.trace3(At)), np.trace(A, axis1=1, axis2=2), atol=1e-12)
    v = jnp.asarray(np.moveaxis(B[:, 0], 0, -1))
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(mat3.matvec3(At, v)), -1, 0),
        np.einsum("nij,nj->ni", A, B[:, 0]), atol=1e-12,
    )
    np.testing.assert_allclose(np.asarray(mat3.to_trailing(mat3.from_trailing(jnp.asarray(A)))), A)


def test_svd_matches_trailing_impl():
    A, At = batch(512, seed=2)
    U1, s1, V1 = svd3.svd3(jnp.asarray(A))
    U2, s2, V2 = mat3.svd3(At)
    np.testing.assert_allclose(np.moveaxis(np.asarray(U2), -1, 0), np.asarray(U1), atol=1e-10)
    np.testing.assert_allclose(np.moveaxis(np.asarray(s2), -1, 0), np.asarray(s1), atol=1e-10)
    np.testing.assert_allclose(np.moveaxis(np.asarray(V2), -1, 0), np.asarray(V1), atol=1e-10)


def test_polar_matches_trailing_impl_and_grad():
    A, At = batch(128, seed=3)
    R1 = np.asarray(svd3.polar3(jnp.asarray(A)))
    R2 = np.moveaxis(np.asarray(mat3.polar3(At)), -1, 0)
    np.testing.assert_allclose(R2, R1, atol=1e-10)

    G = np.random.default_rng(4).normal(size=A.shape)
    g1 = np.asarray(jax.grad(lambda a: jnp.sum(svd3.polar3(a) * G))(jnp.asarray(A)))
    g2 = np.asarray(
        jax.grad(lambda a: jnp.sum(mat3.polar3(a) * jnp.asarray(np.moveaxis(G, 0, -1))))(At)
    )
    np.testing.assert_allclose(np.moveaxis(g2, -1, 0), g1, atol=1e-10)


def test_batch_suffix_polymorphism():
    # 2-D batch suffix (the Pallas in-kernel shape) must work identically.
    A, At = batch(256, seed=5)
    R_flat = np.asarray(mat3.polar3(At))
    R_2d = np.asarray(mat3.polar3(At.reshape(3, 3, 2, 128)))
    np.testing.assert_allclose(R_2d.reshape(3, 3, 256), R_flat, atol=1e-12)
