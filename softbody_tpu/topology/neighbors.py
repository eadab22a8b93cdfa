"""Static rest-space neighbor tables.

The reference builds a CUDA hash grid once over rest positions and queries it at
rest coordinates inside every kernel (``sim.py:123-127,161,178,203,224``) — the
topology never changes.  The TPU-native design exploits that: neighbors are found
ONCE on the host, padded into a dense ``(N, K)`` index table, and all rest-space
kernel quantities (W, grad-W, offsets, and several whole-neighborhood reductions)
are precomputed.  Every per-step physics op then becomes a statically-shaped
gather + dense reduce — no hash probing, no atomics, bitwise deterministic.

Builders (fastest available is picked automatically):
  * C++ spatial hash via ctypes (softbody_tpu/native), built lazily;
  * scipy cKDTree;
  * pure-NumPy cell hash (always available).
"""

from __future__ import annotations

import numpy as np

from ..config import SimConfig
from ..core.types import Topology
from ..oracle.sim import W, nabla_W


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def neighbor_lists_numpy(rest: np.ndarray, radius: float):
    """Pure-NumPy uniform-grid neighbor search. Returns list-of-arrays (j != i)."""
    n = rest.shape[0]
    cell = radius
    keys = np.floor(rest / cell).astype(np.int64)
    # pack 3D cell coords into one int64 key (21 bits per axis, offset to positive)
    off = keys.min(axis=0)
    k = keys - off
    packed = (k[:, 0] << 42) | (k[:, 1] << 21) | k[:, 2]
    order = np.argsort(packed, kind="stable")
    sorted_keys = packed[order]
    # bucket boundaries
    starts = np.searchsorted(sorted_keys, sorted_keys, side="left")
    uniq, first = np.unique(sorted_keys, return_index=True)
    bucket_of = {int(u): (int(f), int(np.searchsorted(sorted_keys, u, side="right"))) for u, f in zip(uniq, first)}
    r2 = radius * radius
    out = []
    for i in range(n):
        ki = k[i]
        cand = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dz in (-1, 0, 1):
                    key = int(((ki[0] + dx) << 42) | ((ki[1] + dy) << 21) | (ki[2] + dz))
                    rng = bucket_of.get(key)
                    if rng is not None:
                        cand.append(order[rng[0]:rng[1]])
        cand = np.concatenate(cand) if cand else np.empty(0, dtype=np.int64)
        d2 = np.sum((rest[cand] - rest[i]) ** 2, axis=-1)
        sel = cand[(d2 < r2) & (cand != i)]
        out.append(np.sort(sel))
    return out


def neighbor_lists(rest: np.ndarray, radius: float):
    """Neighbor lists within ``radius`` (exclusive of self), best available backend."""
    try:
        from ..native import hashgrid as _native

        if _native.available():
            return _native.neighbor_lists(rest, radius)
    except Exception:
        pass
    try:
        from scipy.spatial import cKDTree

        tree = cKDTree(rest)
        pairs = tree.query_ball_point(rest, r=radius * (1 - 1e-12))
        return [np.asarray([j for j in js if j != i], dtype=np.int64) for i, js in enumerate(pairs)]
    except ImportError:
        return neighbor_lists_numpy(rest, radius)


def build_topology(rest: np.ndarray, mass: np.ndarray, cfg: SimConfig, volume: np.ndarray | None = None):
    """Build the padded neighbor table + cached rest-space quantities.

    Returns (Topology-as-numpy, rho, volume).  All f64; cast via
    :func:`topology_to_jax` for device use.
    """
    rest = np.asarray(rest, dtype=np.float64)
    mass = np.asarray(mass, dtype=np.float64)
    n = rest.shape[0]
    radius = 2.0 * cfg.h
    lists = neighbor_lists(rest, radius)
    counts = np.array([len(l) for l in lists])
    kmax = int(counts.max()) if n else 0
    K = max(_round_up(max(kmax, 1), 8), 8)
    if cfg.max_neighbors and K > cfg.max_neighbors:
        K = cfg.max_neighbors

    idx = np.tile(np.arange(n, dtype=np.int64)[:, None], (1, K))
    mask = np.zeros((n, K), dtype=np.float64)
    for i, js in enumerate(lists):
        if len(js) > K:  # keep the K nearest
            d2 = np.sum((rest[js] - rest[i]) ** 2, axis=-1)
            js = js[np.argsort(d2)[:K]]
        idx[i, : len(js)] = js
        mask[i, : len(js)] = 1.0

    xij = rest[:, None, :] - rest[idx]          # X_i - X_j  (N, K, 3)
    w = W(xij, cfg.h) * mask
    nw = nabla_W(xij, cfg.h) * mask[..., None]
    xji = -xij * mask[..., None]

    # density / volume (self term controlled by cfg.self_density; sim.py:163 vs
    # sim_taichi.py:97-98)
    rho = np.sum(mass[idx] * w, axis=1)
    if cfg.self_density:
        rho = rho + mass * (1.0 / (np.pi * cfg.h**3))  # W(0,h)
    if volume is None:
        volume = mass / rho

    c = w * mass[idx]
    vj = volume[idx] * mask
    topo = Topology(
        idx=idx.astype(np.int32),
        mask=mask,
        w=w,
        nw=nw,
        xji=xji,
        c=c,
        vj=vj,
        sum_c_xji=np.einsum("ij,ija->ia", c, xji),
        rest_corr=np.einsum("ij,ija,ijb->iab", vj, xji, nw),
        sum_v_nw=np.einsum("ij,ija->ia", vj, nw),
    )
    return topo, rho, volume


def neighbor_csr(rest: np.ndarray, radius: float):
    """CSR neighbor structure (offsets (n+1,), flat indices), self excluded.

    Prefers the native C++ hash grid; falls back to scipy cKDTree.
    """
    rest = np.ascontiguousarray(rest, dtype=np.float64)
    try:
        from ..native import hashgrid as _native

        if _native.available():
            return _native.neighbor_csr(rest, radius)
    except Exception:
        pass
    from scipy.spatial import cKDTree

    tree = cKDTree(rest)
    pairs = tree.query_pairs(radius * (1 - 1e-12), output_type="ndarray")
    n = rest.shape[0]
    src = np.concatenate([pairs[:, 0], pairs[:, 1]])
    dst = np.concatenate([pairs[:, 1], pairs[:, 0]])
    order = np.argsort(src, kind="stable")
    counts = np.bincount(src, minlength=n)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    return offsets, dst[order].astype(np.int64)


def rest_density_and_corr(rest: np.ndarray, mass: np.ndarray, cfg: SimConfig,
                          chunk: int = 1_000_000, rowsums: bool = False):
    """rho_i = sum_j m_j W_ij, V_i = m_i/rho_i, and the nabla_u rest correction
    Y_i = sum_j V_j (X_j - X_i) (x) grad_W(X_ij) over the flat CSR pair list —
    O(true pairs), no per-particle Python loop (used by the sparse scene
    builder; reference computes these per-thread at sim.py:154-183).

    With ``rowsums=True`` also returns the two static moment row-sum vectors
    the sparse pair kernels' XLA correction consumes (sim/sparse.py rs6):
      scx_i  = sum_j w_ij m_j (X_j - X_i)        (A-moment row sum)
      svnw_i = sum_j V_j grad_W(X_i - X_j)       (Y-moment row sum)
    Computing them here (f64, true pairs) replaces a build-time ones-RHS
    Pallas moments call — 8 bucket-shaped kernel compiles (~77 s over the
    remote-compile tunnel) for what is ~4 numpy passes.

    Chunked over pairs with preallocated scratch reused via ``out=``: on this
    build VM first-touch of fresh anon pages is ~13MB/s, so per-call large
    temporaries would dominate the build unless every buffer is reused.
    """
    rest = np.asarray(rest, dtype=np.float64)
    mass = np.asarray(mass, dtype=np.float64)
    n = rest.shape[0]
    off, idx = neighbor_csr(rest, 2.0 * cfg.h)
    p_total = len(idx)
    src_all = np.repeat(np.arange(n, dtype=np.int64), np.diff(off))

    h = float(cfg.h)
    c0 = 1.0 / (np.pi * h**3)
    c4 = 0.25 * c0

    rho = np.zeros(n)
    corr = np.zeros((n, 3, 3))
    scx = np.zeros((n, 3)) if rowsums else None
    svnw = np.zeros((n, 3)) if rowsums else None

    cap = int(min(chunk, max(p_total, 1)))
    xi = np.empty((cap, 3))
    xj = np.empty((cap, 3))
    q = np.empty(cap)
    tq = np.empty(cap)
    oq = np.empty(cap)
    f1 = np.empty(cap)
    f2 = np.empty(cap)

    def pair_geometry(se):
        """Fill xi <- X_i - X_j, q <- |x|/h, tq <- (2-q)+, oq <- (1-q)+."""
        m_ = se.stop - se.start
        np.take(rest, src_all[se], axis=0, out=xi[:m_])
        np.take(rest, idx[se], axis=0, out=xj[:m_])
        np.subtract(xi[:m_], xj[:m_], out=xi[:m_])
        np.einsum("pa,pa->p", xi[:m_], xi[:m_], out=q[:m_])
        np.sqrt(q[:m_], out=q[:m_])
        q[:m_] /= h
        np.subtract(2.0, q[:m_], out=tq[:m_])
        np.maximum(tq[:m_], 0.0, out=tq[:m_])
        np.subtract(1.0, q[:m_], out=oq[:m_])
        np.maximum(oq[:m_], 0.0, out=oq[:m_])
        return m_

    def fill_gfac(m_, out):
        """out <- c/4 (12 (1-q)+^2 - 3 (2-q)+^2) / (q h^2)  [= nabla_W / xij]."""
        np.multiply(tq[:m_], tq[:m_], out=tq[:m_])
        np.multiply(oq[:m_], oq[:m_], out=oq[:m_])
        np.multiply(oq[:m_], 12.0, out=oq[:m_])
        np.multiply(tq[:m_], 3.0, out=tq[:m_])
        np.subtract(oq[:m_], tq[:m_], out=out[:m_])
        out[:m_] *= c4
        np.maximum(q[:m_], 1e-300, out=q[:m_])
        out[:m_] /= q[:m_]
        out[:m_] /= h * h

    for s0 in range(0, p_total, cap):
        se = slice(s0, min(s0 + cap, p_total))
        m_ = pair_geometry(se)
        # branchless cubic spline: W = c/4 [(2-q)+^3 - 4 (1-q)+^3]
        np.multiply(tq[:m_], tq[:m_], out=f1[:m_])
        np.multiply(f1[:m_], tq[:m_], out=f1[:m_])
        np.multiply(oq[:m_], oq[:m_], out=f2[:m_])
        np.multiply(f2[:m_], oq[:m_], out=f2[:m_])
        np.multiply(f2[:m_], 4.0, out=f2[:m_])
        np.subtract(f1[:m_], f2[:m_], out=f1[:m_])
        f1[:m_] *= c4
        np.take(mass, idx[se], out=f2[:m_])
        np.multiply(f1[:m_], f2[:m_], out=f1[:m_])
        rho += np.bincount(src_all[se], weights=f1[:m_], minlength=n)
        if rowsums:
            # scx_b = sum_j (w m_j) (X_j - X_i)_b; xi holds X_i - X_j
            for b in range(3):
                np.multiply(f1[:m_], xi[:m_, b], out=f2[:m_])
                scx[:, b] -= np.bincount(src_all[se], weights=f2[:m_],
                                         minlength=n)

    if cfg.self_density:
        rho = rho + mass * c0
    with np.errstate(divide="ignore", invalid="ignore"):
        volume = np.where(rho > 0, mass / np.where(rho > 0, rho, 1.0), 0.0)

    for s0 in range(0, p_total, cap):
        se = slice(s0, min(s0 + cap, p_total))
        m_ = pair_geometry(se)
        fill_gfac(m_, f1)
        np.take(volume, idx[se], out=f2[:m_])
        np.multiply(f1[:m_], f2[:m_], out=f1[:m_])   # V_j * gfac
        if rowsums:
            # svnw_b = sum_j V_j gfac (X_i - X_j)_b
            for b in range(3):
                np.multiply(f1[:m_], xi[:m_, b], out=f2[:m_])
                svnw[:, b] += np.bincount(src_all[se], weights=f2[:m_],
                                          minlength=n)
        for a in range(3):
            # weight_a = -V_j gfac (X_i - X_j)_a = V_j gfac (X_j - X_i)_a
            np.multiply(f1[:m_], xi[:m_, a], out=q[:m_])
            np.negative(q[:m_], out=q[:m_])
            for b in range(3):
                np.multiply(q[:m_], xi[:m_, b], out=tq[:m_])
                corr[:, a, b] += np.bincount(src_all[se], weights=tq[:m_],
                                             minlength=n)

    if rowsums:
        return rho, volume, corr, scx, svnw
    return rho, volume, corr


def topology_to_jax(topo: Topology, dtype) -> Topology:
    """Cast a host-built (numpy f64) Topology to device arrays of ``dtype``."""
    import jax.numpy as jnp

    def cast(a, is_int=False):
        return jnp.asarray(a, dtype=jnp.int32 if is_int else dtype)

    return Topology(
        idx=cast(topo.idx, is_int=True),
        mask=cast(topo.mask),
        w=cast(topo.w),
        nw=cast(topo.nw),
        xji=cast(topo.xji),
        c=cast(topo.c),
        vj=cast(topo.vj),
        sum_c_xji=cast(topo.sum_c_xji),
        rest_corr=cast(topo.rest_corr),
        sum_v_nw=cast(topo.sum_v_nw),
    )
