"""Lane-efficient batched 3x3 linear algebra: matrix axes LEADING, batch trailing.

TPU vector registers are (8 sublanes x 128 lanes) over the two minor dims.
Arrays shaped (N, 3, 3) waste ~40x of each register on the size-3 minor dims;
storing matrices as (3, 3, *batch) makes every component a full lane-packed
array and all 3x3 algebra unrolled elementwise ops.  These helpers are shape
polymorphic over the batch suffix, so they work identically in XLA ops
(batch = (N,)) and inside Pallas kernels (batch = (sublanes, lanes)).

Includes a leading-axis port of the cyclic-Jacobi SVD / polar rotation from
svd3.py (same math, same clamped VJP).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_PAIRS = ((0, 1), (0, 2), (1, 2))


def eye3(like):
    """Identity with batch suffix broadcast from ``like`` (shape (3,3)+batch)."""
    out = jnp.zeros_like(like)
    for d in range(3):
        out = out.at[d, d].set(1.0)
    return out


def transpose3(a):
    return jnp.swapaxes(a, 0, 1)


def matmul3(a, b):
    """(3,3,*) @ (3,3,*) contracting the inner matrix index."""
    return jnp.einsum("ik...,kj...->ij...", a, b)


def matTmul3(a, b):
    """a^T @ b."""
    return jnp.einsum("ki...,kj...->ij...", a, b)


def matvec3(a, v):
    """(3,3,*) @ (3,*) -> (3,*)."""
    return jnp.einsum("ij...,j...->i...", a, v)


def outer3(u, v):
    """(3,*) (x) (3,*) -> (3,3,*)."""
    return jnp.einsum("i...,j...->ij...", u, v)


def trace3(a):
    return a[0, 0] + a[1, 1] + a[2, 2]


def from_trailing(a):
    """(..., 3, 3) -> (3, 3, ...)."""
    return jnp.moveaxis(a, (-2, -1), (0, 1))


def to_trailing(a):
    """(3, 3, ...) -> (..., 3, 3)."""
    return jnp.moveaxis(a, (0, 1), (-2, -1))


# --------------------------------------------------------------------- Jacobi SVD
def _givens(app, aqq, apq):
    small = jnp.abs(apq) < 1e-30
    apq_safe = jnp.where(small, 1.0, apq)
    theta = (aqq - app) / (2.0 * apq_safe)
    t = jnp.sign(theta) / (jnp.abs(theta) + jnp.sqrt(1.0 + theta * theta))
    t = jnp.where(theta == 0.0, 1.0, t)
    c = 1.0 / jnp.sqrt(1.0 + t * t)
    s = t * c
    c = jnp.where(small, 1.0, c)
    s = jnp.where(small, 0.0, s)
    return c, s


def _rotate(S, V, p, q):
    """S <- J^T S J, V <- V J for the static (p, q) plane.  S, V: (3,3,*)."""
    c, s = _givens(S[p, p], S[q, q], S[p, q])
    Sp, Sq = S[:, p], S[:, q]
    S = S.at[:, p].set(c * Sp - s * Sq)
    S = S.at[:, q].set(s * Sp + c * Sq)
    Rp, Rq = S[p, :], S[q, :]
    S = S.at[p, :].set(c * Rp - s * Rq)
    S = S.at[q, :].set(s * Rp + c * Rq)
    Vp, Vq = V[:, p], V[:, q]
    V = V.at[:, p].set(c * Vp - s * Vq)
    V = V.at[:, q].set(s * Vp + c * Vq)
    return S, V


def eigh3(S, sweeps: int = 8):
    """Eigendecomposition of symmetric (3,3,*): (evals (3,*) desc, evecs (3,3,*))."""
    V = eye3(S)
    for _ in range(sweeps):
        for (p, q) in _PAIRS:
            S, V = _rotate(S, V, p, q)
    evals = jnp.stack([S[0, 0], S[1, 1], S[2, 2]])

    # 3-element descending sort network on the leading axis, applied to both
    # evals and V columns (no gather: static swaps with where).
    def swap(e, V, a, b):
        cond = e[a] < e[b]
        ea = jnp.where(cond, e[b], e[a])
        eb = jnp.where(cond, e[a], e[b])
        e = e.at[a].set(ea).at[b].set(eb)
        Va, Vb = V[:, a], V[:, b]
        V = V.at[:, a].set(jnp.where(cond, Vb, Va))
        V = V.at[:, b].set(jnp.where(cond, Va, Vb))
        return e, V

    for (a, b) in ((0, 1), (1, 2), (0, 1)):
        evals, V = swap(evals, V, a, b)
    return evals, V


def svd3(A, sweeps: int = 8):
    """SVD of (3,3,*): (U (3,3,*), sigma (3,*) desc >= 0, V (3,3,*))."""
    AtA = matTmul3(A, A)
    evals, V = eigh3(AtA, sweeps)
    sigma = jnp.sqrt(jnp.maximum(evals, 0.0))
    B = matmul3(A, V)
    eps = jnp.asarray(1e-12, dtype=A.dtype)

    def norm(v):
        return jnp.sqrt(v[0] * v[0] + v[1] * v[1] + v[2] * v[2])

    def normalize(v, fallback):
        n = norm(v)
        ok = n > eps
        return jnp.where(ok, v / jnp.where(ok, n, 1.0), fallback)

    def cross(u, v):
        return jnp.stack([
            u[1] * v[2] - u[2] * v[1],
            u[2] * v[0] - u[0] * v[2],
            u[0] * v[1] - u[1] * v[0],
        ])

    def e_axis(d, like):
        z = jnp.zeros_like(like)
        return z.at[d].set(1.0)

    b0, b1, b2 = B[:, 0], B[:, 1], B[:, 2]
    u0 = normalize(b0, e_axis(0, b0))
    alt = cross(u0, jnp.roll(u0, 1, axis=0) + 0.5 * e_axis(0, u0))
    alt = normalize(alt, e_axis(1, u0))
    dot01 = u0[0] * b1[0] + u0[1] * b1[1] + u0[2] * b1[2]
    u1 = normalize(b1 - dot01 * u0, alt)
    d20 = u0[0] * b2[0] + u0[1] * b2[1] + u0[2] * b2[2]
    u2b = b2 - d20 * u0
    d21 = u1[0] * u2b[0] + u1[1] * u2b[1] + u1[2] * u2b[2]
    u2b = u2b - d21 * u1
    c01 = cross(u0, u1)
    sgn = u2b[0] * c01[0] + u2b[1] * c01[1] + u2b[2] * c01[2]
    sgn = jnp.where(jnp.abs(sgn) > eps, jnp.sign(sgn), 1.0)
    u2 = normalize(u2b, sgn * c01)
    U = jnp.stack([u0, u1, u2], axis=1)
    return U, sigma, V


def _polar_primal(A, sweeps):
    U, sigma, V = svd3(A, sweeps)
    R = jnp.einsum("ik...,jk...->ij...", U, V)  # U V^T
    return R, (U, sigma, V)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def polar3(A, sweeps: int = 8):
    """R = U V^T of the polar decomposition; leading-axis layout (3,3,*).
    Same clamped analytic VJP as ops.svd3.polar3 (see that module docstring)."""
    return _polar_primal(A, sweeps)[0]


def _polar_fwd(A, sweeps):
    return _polar_primal(A, sweeps)


def _polar_bwd(sweeps, res, G):
    U, sigma, V = res
    Gp = jnp.einsum("ki...,kl...,lj...->ij...", U, G, V)  # U^T G V
    skew = Gp - jnp.swapaxes(Gp, 0, 1)
    denom = sigma[:, None] + sigma[None, :]
    denom = jnp.maximum(denom, 1e-6)
    H = skew / denom
    Abar = jnp.einsum("ik...,kl...,jl...->ij...", U, H, V)  # U H V^T
    return (Abar,)


polar3.defvjp(_polar_fwd, _polar_bwd)
