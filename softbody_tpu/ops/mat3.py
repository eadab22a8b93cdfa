"""Lane-efficient batched 3x3 linear algebra: matrix axes LEADING, batch trailing.

TPU vector registers are (8 sublanes x 128 lanes) over the two minor dims.
Arrays shaped (N, 3, 3) waste ~40x of each register on the size-3 minor dims;
storing matrices as (3, 3, *batch) makes every component a full lane-packed
array.

CRITICAL implementation note: einsum/dot_general over the size-3 axes lowers to
*batched 3x3 matmuls* on TPU (measured ~100x slower than elementwise), and
``.at[...].set`` updates materialize full-array copies/scatters.  So every op
here unpacks matrices into 9 component arrays, computes with explicit unrolled
scalar formulas (pure VPU elementwise ops, fully fusable), and repacks once.

Includes the cyclic-Jacobi SVD / polar rotation with the clamped analytic VJP
(same math as ops/svd3.py, which remains the readable trailing-layout
reference implementation).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_PAIRS = ((0, 1), (0, 2), (1, 2))


def unpack(A):
    """(3, 3, *batch) -> 3x3 nested list of (*batch,) components."""
    return [[A[i, j] for j in range(3)] for i in range(3)]


def pack(m):
    """3x3 nested list -> (3, 3, *batch)."""
    return jnp.stack([jnp.stack(row) for row in m])


def unpack_vec(v):
    return [v[0], v[1], v[2]]


def pack_vec(v):
    return jnp.stack(v)


# ----------------------------------------------------------- component helpers
def _mm(a, b):
    """a @ b on components."""
    return [[sum(a[i][k] * b[k][j] for k in range(3)) for j in range(3)] for i in range(3)]


def _mtm(a, b):
    """a^T @ b on components."""
    return [[sum(a[k][i] * b[k][j] for k in range(3)) for j in range(3)] for i in range(3)]


def _mmt(a, b):
    """a @ b^T on components."""
    return [[sum(a[i][k] * b[j][k] for k in range(3)) for j in range(3)] for i in range(3)]


def _t(a):
    return [[a[j][i] for j in range(3)] for i in range(3)]


def eye3(like):
    """Identity with batch suffix broadcast from ``like`` (shape (3,3)+batch)."""
    one = jnp.ones_like(like[0, 0])
    zero = jnp.zeros_like(like[0, 0])
    return pack([[one if i == j else zero for j in range(3)] for i in range(3)])


def transpose3(a):
    return jnp.swapaxes(a, 0, 1)


def matmul3(a, b):
    """(3,3,*) @ (3,3,*) contracting the inner matrix index (elementwise VPU)."""
    return pack(_mm(unpack(a), unpack(b)))


def matTmul3(a, b):
    """a^T @ b."""
    return pack(_mtm(unpack(a), unpack(b)))


def matvec3(a, v):
    """(3,3,*) @ (3,*) -> (3,*)."""
    au = unpack(a)
    vu = unpack_vec(v)
    return pack_vec([sum(au[i][k] * vu[k] for k in range(3)) for i in range(3)])


def outer3(u, v):
    uu, vu = unpack_vec(u), unpack_vec(v)
    return pack([[uu[i] * vu[j] for j in range(3)] for i in range(3)])


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
    """S <- J^T S J, V <- V J on component lists (no array updates)."""
    c, s = _givens(S[p][p], S[q][q], S[p][q])
    # column update S J
    for i in range(3):
        sp, sq = S[i][p], S[i][q]
        S[i][p] = c * sp - s * sq
        S[i][q] = s * sp + c * sq
    # row update J^T S
    for j in range(3):
        rp, rq = S[p][j], S[q][j]
        S[p][j] = c * rp - s * rq
        S[q][j] = s * rp + c * rq
    for i in range(3):
        vp, vq = V[i][p], V[i][q]
        V[i][p] = c * vp - s * vq
        V[i][q] = s * vp + c * vq
    return S, V


def _eigh3_components(S, sweeps):
    one = jnp.ones_like(S[0][0])
    zero = jnp.zeros_like(S[0][0])
    V = [[one if i == j else zero for j in range(3)] for i in range(3)]
    for _ in range(sweeps):
        for (p, q) in _PAIRS:
            S, V = _rotate(S, V, p, q)
    evals = [S[0][0], S[1][1], S[2][2]]

    # descending 3-sort network on (evals, V columns)
    def swap(e, V, a, b):
        cond = e[a] < e[b]
        ea = jnp.where(cond, e[b], e[a])
        eb = jnp.where(cond, e[a], e[b])
        e[a], e[b] = ea, eb
        for i in range(3):
            va, vb = V[i][a], V[i][b]
            V[i][a] = jnp.where(cond, vb, va)
            V[i][b] = jnp.where(cond, va, vb)
        return e, V

    for (a, b) in ((0, 1), (1, 2), (0, 1)):
        evals, V = swap(evals, V, a, b)
    return evals, V


def eigh3(S, sweeps: int = 8):
    """Eigendecomposition of symmetric (3,3,*): (evals (3,*) desc, evecs (3,3,*))."""
    evals, V = _eigh3_components(unpack(S), sweeps)
    return pack_vec(evals), pack(V)


def _svd3_components(a, sweeps):
    """Component-level SVD; a is a 3x3 nested list.  Returns (U, sigma, V) lists."""
    AtA = _mtm(a, a)
    evals, V = _eigh3_components(AtA, sweeps)
    sigma = [jnp.sqrt(jnp.maximum(e, 0.0)) for e in evals]
    B = _mm(a, V)                       # = U diag(sigma); columns B[:][k]
    eps = 1e-12

    def col(M, k):
        return [M[0][k], M[1][k], M[2][k]]

    def norm(v):
        return jnp.sqrt(v[0] * v[0] + v[1] * v[1] + v[2] * v[2])

    def normalize(v, fallback):
        n = norm(v)
        ok = n > eps
        n_safe = jnp.where(ok, n, 1.0)
        return [jnp.where(ok, v[i] / n_safe, fallback[i]) for i in range(3)]

    def cross(u, v):
        return [
            u[1] * v[2] - u[2] * v[1],
            u[2] * v[0] - u[0] * v[2],
            u[0] * v[1] - u[1] * v[0],
        ]

    def dot(u, v):
        return u[0] * v[0] + u[1] * v[1] + u[2] * v[2]

    one = jnp.ones_like(a[0][0])
    zero = jnp.zeros_like(a[0][0])
    e0 = [one, zero, zero]
    e1 = [zero, one, zero]
    b0, b1, b2 = col(B, 0), col(B, 1), col(B, 2)
    u0 = normalize(b0, e0)
    # fallback direction orthogonal-ish to u0 (only used at rank 0/degenerate)
    rolled = [u0[2] + 0.5, u0[0], u0[1]]
    alt = normalize(cross(u0, rolled), e1)
    d01 = dot(u0, b1)
    u1 = normalize([b1[i] - d01 * u0[i] for i in range(3)], alt)
    d20 = dot(u0, b2)
    u2b = [b2[i] - d20 * u0[i] for i in range(3)]
    d21 = dot(u1, u2b)
    u2b = [u2b[i] - d21 * u1[i] for i in range(3)]
    c01 = cross(u0, u1)
    sgn = dot(u2b, c01)
    sgn = jnp.where(jnp.abs(sgn) > eps, jnp.sign(sgn), 1.0)
    u2 = normalize(u2b, [sgn * c01[i] for i in range(3)])
    U = [[u0[i], u1[i], u2[i]] for i in range(3)]   # columns u0, u1, u2
    return U, sigma, V


def svd3(A, sweeps: int = 8):
    """SVD of (3,3,*): (U (3,3,*), sigma (3,*) desc >= 0, V (3,3,*))."""
    U, sigma, V = _svd3_components(unpack(A), sweeps)
    return pack(U), pack_vec(sigma), pack(V)


def _polar_primal(A, sweeps):
    U, sigma, V = _svd3_components(unpack(A), sweeps)
    R = pack(_mmt(U, V))               # U V^T
    return R, (U, sigma, V)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def polar3(A, sweeps: int = 8):
    """Rotation part of the polar decomposition; leading-axis layout (3,3,*).
    Clamped analytic VJP (see ops/svd3.py docstring for the derivation)."""
    return _polar_primal(A, sweeps)[0]


def _polar_fwd(A, sweeps):
    R, (U, sigma, V) = _polar_primal(A, sweeps)
    return R, (pack(U), pack_vec(sigma), pack(V))


def _polar_bwd(sweeps, res, G):
    U, sigma, V = res
    Uu, Vu, Gu = unpack(U), unpack(V), unpack(G)
    su = unpack_vec(sigma)
    # G' = U^T G V
    Gp = _mm(_mtm(Uu, Gu), Vu)
    H = [[None] * 3 for _ in range(3)]
    for i in range(3):
        for j in range(3):
            denom = jnp.maximum(su[i] + su[j], 1e-6)
            H[i][j] = (Gp[i][j] - Gp[j][i]) / denom
    Abar = _mmt(_mm(Uu, H), Vu)        # U H V^T
    return (pack(Abar),)


polar3.defvjp(_polar_fwd, _polar_bwd)
