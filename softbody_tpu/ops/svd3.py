"""Batched, branch-free 3x3 SVD and differentiable polar rotation.

Replaces the reference's per-thread ``wp.svd3`` (sim.py:190) / ``ti.svd``
(sim_taichi.py:113) with a TPU-friendly implementation: a fixed-iteration cyclic
Jacobi eigendecomposition of A^T A, vectorized over the particle axis so the VPU
processes all N particles per rotation.  No data-dependent control flow — ideal
for XLA and reusable verbatim inside Pallas kernels.

The sim only ever consumes the polar rotation R = U V^T (sim.py:185-191), so the
differentiable export is :func:`polar3` with an analytic custom VJP:

    R = U V^T,  P = U^T dA V  =>  dR = U K V^T,  K_ij = (P - P^T)_ij / (s_i + s_j)

giving the adjoint  A_bar = U H V^T with H_ij = (G'_ij - G'_ji)/(s_i + s_j),
G' = U^T G V.  Denominators are clamped away from zero exactly in the spirit of
the reference's hand-written SVD VJP (utils.py:45-73, ``clamp`` at 1e-6).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_JACOBI_SWEEPS = 8
_PAIRS = ((0, 1), (0, 2), (1, 2))


def _givens(app, aqq, apq):
    """Branch-free Jacobi rotation (c, s) zeroing the (p, q) entry."""
    small = jnp.abs(apq) < 1e-30
    apq_safe = jnp.where(small, 1.0, apq)
    theta = (aqq - app) / (2.0 * apq_safe)
    t = jnp.sign(theta) / (jnp.abs(theta) + jnp.sqrt(1.0 + theta * theta))
    t = jnp.where(theta == 0.0, 1.0, t)  # theta==0 -> 45 degree rotation
    c = 1.0 / jnp.sqrt(1.0 + t * t)
    s = t * c
    c = jnp.where(small, 1.0, c)
    s = jnp.where(small, 0.0, s)
    return c, s


def _rotate(S, V, p, q):
    """Apply the (p, q) Jacobi rotation:  S <- J^T S J,  V <- V J.

    S: (..., 3, 3) symmetric;  V: (..., 3, 3).  p, q are static ints.
    """
    c, s = _givens(S[..., p, p], S[..., q, q], S[..., p, q])
    c = c[..., None]
    s = s[..., None]
    # Column update on S (S J): columns p, q mix.
    Sp = S[..., :, p]
    Sq = S[..., :, q]
    S = S.at[..., :, p].set(c * Sp - s * Sq)
    S = S.at[..., :, q].set(s * Sp + c * Sq)
    # Row update on S (J^T S).
    Rp = S[..., p, :]
    Rq = S[..., q, :]
    S = S.at[..., p, :].set(c * Rp - s * Rq)
    S = S.at[..., q, :].set(s * Rp + c * Rq)
    # Accumulate V <- V J.
    Vp = V[..., :, p]
    Vq = V[..., :, q]
    V = V.at[..., :, p].set(c * Vp - s * Vq)
    V = V.at[..., :, q].set(s * Vp + c * Vq)
    return S, V


def eigh3(S, sweeps: int = _JACOBI_SWEEPS):
    """Eigendecomposition of batched symmetric 3x3 via cyclic Jacobi.

    Returns (eigenvalues (..., 3) descending, eigenvectors (..., 3, 3) columns).
    """
    V = jnp.broadcast_to(jnp.eye(3, dtype=S.dtype), S.shape)
    for _ in range(sweeps):
        for (p, q) in _PAIRS:
            S, V = _rotate(S, V, p, q)
    evals = jnp.stack([S[..., 0, 0], S[..., 1, 1], S[..., 2, 2]], axis=-1)
    # Sort descending with a 3-element sorting network (static, branch-free).
    order = jnp.argsort(-evals, axis=-1)
    evals = jnp.take_along_axis(evals, order, axis=-1)
    V = jnp.take_along_axis(V, order[..., None, :], axis=-1)
    return evals, V


def svd3(A, sweeps: int = _JACOBI_SWEEPS):
    """Batched SVD of (..., 3, 3): returns (U, sigma (..., 3), V) with A = U diag(s) V^T.

    sigma is descending and non-negative.  Degenerate/rank-deficient inputs get a
    valid orthonormal U via cross-product completion (no NaNs).
    """
    AtA = jnp.einsum("...ba,...bc->...ac", A, A)
    evals, V = eigh3(AtA, sweeps)
    sigma = jnp.sqrt(jnp.maximum(evals, 0.0))
    B = jnp.einsum("...ab,...bc->...ac", A, V)  # = U diag(sigma)
    eps = jnp.asarray(1e-12, dtype=A.dtype)

    def col(i):
        return B[..., :, i]

    def normalize(v, fallback):
        n = jnp.linalg.norm(v, axis=-1, keepdims=True)
        ok = n > eps
        return jnp.where(ok, v / jnp.where(ok, n, 1.0), fallback)

    e0 = jnp.zeros_like(B[..., :, 0]).at[..., 0].set(1.0)
    u0 = normalize(col(0), e0)
    # u1: prefer B column, fall back to any unit vector orthogonal to u0.
    alt = jnp.cross(u0, jnp.roll(u0, 1, axis=-1) + e0 * 0.5)
    alt = normalize(alt, jnp.zeros_like(u0).at[..., 1].set(1.0))
    u1 = normalize(col(1) - jnp.sum(col(1) * u0, -1, keepdims=True) * u0, alt)
    # u2: cross completion keeps U orthonormal even at rank <= 1.
    u2_b = col(2) - jnp.sum(col(2) * u0, -1, keepdims=True) * u0
    u2_b = u2_b - jnp.sum(u2_b * u1, -1, keepdims=True) * u1
    sign = jnp.sum(u2_b * jnp.cross(u0, u1), -1, keepdims=True)
    sign = jnp.where(jnp.abs(sign) > eps, jnp.sign(sign), 1.0)
    u2 = normalize(u2_b, sign * jnp.cross(u0, u1))
    U = jnp.stack([u0, u1, u2], axis=-1)
    return U, sigma, V


def _polar_primal(A, sweeps):
    U, sigma, V = svd3(A, sweeps)
    R = jnp.einsum("...ab,...cb->...ac", U, V)
    return R, (U, sigma, V)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def polar3(A, sweeps: int = _JACOBI_SWEEPS):
    """Rotation part of the polar decomposition: R = U V^T from SVD(A).

    Matches ``compute_R_i`` (sim.py:185-191).  Differentiable with a clamped
    analytic VJP (see module docstring); safe at degenerate sigma.
    """
    return _polar_primal(A, sweeps)[0]


def _polar_fwd(A, sweeps):
    R, res = _polar_primal(A, sweeps)
    return R, res


def _polar_bwd(sweeps, res, G):
    U, sigma, V = res
    # G' = U^T G V
    Gp = jnp.einsum("...ba,...bc,...cd->...ad", U, G, V)
    skew = Gp - jnp.swapaxes(Gp, -1, -2)
    denom = sigma[..., :, None] + sigma[..., None, :]
    # Clamp like the reference's utils.py:65-73 (denominators held away from 0).
    denom = jnp.maximum(denom, 1e-6)
    H = skew / denom
    Abar = jnp.einsum("...ab,...bc,...dc->...ad", U, H, V)
    return (Abar,)


polar3.defvjp(_polar_fwd, _polar_bwd)
