"""NumPy f64 O(N^2) oracle simulator.

This is the "obviously correct" reference implementation of the physics in
SURVEY.md §3.3, mirroring the reference math (sim.py:107-273, sim_taichi.py:78-234,
utils.py:25-43) with every semantic divergence controlled by ``SimConfig`` flags.
It is deliberately slow (dense all-pairs, f64) and exists only to generate golden
values for unit/parity tests of the TPU path.  Nothing here runs on TPU.
"""

from __future__ import annotations

import numpy as np

from ..config import SimConfig


# ----------------------------------------------------------------------------- kernels
def W(xij: np.ndarray, h: float) -> np.ndarray:
    """Cubic-spline SPH kernel (utils.py:25-33 / sim.py:133-141). xij: (..., 3)."""
    q = np.linalg.norm(xij, axis=-1) / h
    c = 1.0 / (np.pi * h**3)
    near = c * (1.0 - 1.5 * q**2 + 0.75 * q**3)
    far = 0.25 * c * (2.0 - q) ** 3
    return np.where(q < 1.0, near, np.where(q < 2.0, far, 0.0))


def nabla_W(xij: np.ndarray, h: float) -> np.ndarray:
    """Gradient of W wrt xij (utils.py:35-43 / sim.py:143-151). xij: (..., 3)."""
    q = np.linalg.norm(xij, axis=-1, keepdims=True) / h
    c = 1.0 / (np.pi * h**3)
    near = c * (-3.0 * xij / h**2 + 2.25 * q * xij / h**2)
    # q==0 only happens in the near branch (where the value is 0 anyway).
    q_safe = np.where(q > 0, q, 1.0)
    far = 0.25 * c * (-3.0) * (2.0 - q) ** 2 * xij / (q_safe * h * h)
    return np.where(q < 1.0, near, np.where(q < 2.0, far, 0.0))


# ----------------------------------------------------------------------------- fields
def compute_volume(rest: np.ndarray, mass: np.ndarray, cfg: SimConfig):
    """rho_i = sum_j m_j W(X_i - X_j); V_i = m_i / rho_i.

    Warp excludes the self term (sim.py:163); Taichi includes it
    (sim_taichi.py:97-98) — controlled by cfg.self_density.
    """
    xij = rest[:, None, :] - rest[None, :, :]
    w = W(xij, cfg.h)
    if not cfg.self_density:
        np.fill_diagonal(w, 0.0)
    rho = w @ mass
    return rho, mass / rho


def compute_A_pq(pos: np.ndarray, rest: np.ndarray, mass: np.ndarray, cfg: SimConfig):
    """A_pq_i = sum_j W(X_ij) m_j (p_j - p_i) (x) (X_j - X_i)  (sim.py:170-183)."""
    xij = rest[:, None, :] - rest[None, :, :]
    w = W(xij, cfg.h)
    np.fill_diagonal(w, 0.0)  # self term is identically zero (p_ii (x) X_ii = 0)
    c = w * mass[None, :]                       # (N, N)
    pji = pos[None, :, :] - pos[:, None, :]     # (N, N, 3)
    xji = rest[None, :, :] - rest[:, None, :]   # (N, N, 3)
    return np.einsum("ij,ija,ijb->iab", c, pji, xji)


def polar_rotation(A: np.ndarray) -> np.ndarray:
    """R = U V^T from SVD(A) (sim.py:185-191, sim_taichi.py:110-123).

    Standard SVD convention (sigma >= 0); no determinant fix — matches wp.svd3 /
    ti.svd semantics where R may be a reflection for det(A) < 0.
    """
    U, _, Vh = np.linalg.svd(A)
    return U @ Vh


def compute_nabla_u(pos, rest, volume, R, cfg: SimConfig):
    """nabla_u_i = sum_j V_j (R_i^T (p_j - p_i) - X_ji) (x) nW(X_ij); F = I + nabla_u^T
    (sim.py:193-209).  Non-corotated mode (cfg.corotated=False) uses R = I,
    reproducing the Taichi overwrite at sim_taichi.py:129."""
    n = pos.shape[0]
    xij = rest[:, None, :] - rest[None, :, :]
    nw = nabla_W(xij, cfg.h)                    # (N, N, 3)
    pji = pos[None, :, :] - pos[:, None, :]
    xji = -xij
    if cfg.corotated:
        rot_pji = np.einsum("iba,ijb->ija", R, pji)  # R_i^T @ p_ji
    else:
        rot_pji = pji
    u_bar = rot_pji - xji
    nabla_u = np.einsum("j,ija,ijb->iab", volume, u_bar, nw)
    F = np.eye(3)[None] + np.transpose(nabla_u, (0, 2, 1))
    return nabla_u, F


def compute_sigma(F, mu, lam, ratio, cfg: SimConfig):
    """StVK stress scaled by the inflation multiplier (sim.py:212-216)."""
    E = 0.5 * (np.einsum("iba,ibc->iac", F, F) - np.eye(3)[None])
    tr = np.trace(E, axis1=1, axis2=2)
    s = 2.0 * mu[:, None, None] * E + lam[:, None, None] * tr[:, None, None] * np.eye(3)[None]
    return s * cfg.stiffness_scale(ratio)[:, None, None]


def compute_elastic_forces(pos, rest, volume, mass, mu, lam, ratio, cfg: SimConfig):
    """Pairwise antisymmetrized elastic forces (sim.py:218-235 / sim_taichi.py:147-158).

    f_ji = -V_i F_i S_i (V_j nW_ij);  f_ij = V_j F_pair S_j (V_i nW_ij)
    force_i = 0.5 sum_j (R_j f_ij - R_i f_ji)
    with F_pair = F_i (Warp, sim.py:233) or F_j (Taichi, sim_taichi.py:157).
    """
    A = compute_A_pq(pos, rest, mass, cfg)
    R = polar_rotation(A) if cfg.corotated else np.tile(np.eye(3), (pos.shape[0], 1, 1))
    _, F = compute_nabla_u(pos, rest, volume, R, cfg)
    S = compute_sigma(F, mu, lam, ratio, cfg)

    xij = rest[:, None, :] - rest[None, :, :]
    nw = nabla_W(xij, cfg.h)                       # (N, N, 3) nW(X_i - X_j)
    vv = volume[:, None] * volume[None, :]         # (N, N) V_i V_j

    FS_i = np.einsum("iab,ibc->iac", F, S)         # F_i S_i
    # -R_i f_ji = +V_i V_j (R_i F_i S_i) nw_ij
    M_i = np.einsum("iab,ibc->iac", R, FS_i)       # R_i F_i S_i
    term_i = np.einsum("ij,iab,ijb->ia", vv, M_i, nw)

    if cfg.pair_def_grad == "j":
        # R_j f_ij = V_i V_j (R_j F_j S_j) nw_ij
        M_j = M_i                                   # same product, indexed by j
        term_j = np.einsum("ij,jab,ijb->ia", vv, M_j, nw)
    else:
        # R_j f_ij = V_i V_j R_j (F_i S_j) nw_ij   (Warp mixes i and j)
        FiSj = np.einsum("iab,jbc->ijac", F, S)     # (N, N, 3, 3)
        term_j = np.einsum("ij,jab,ijbc,ijc->ia", vv, R, FiSj, nw)

    force = 0.5 * (term_j + term_i)
    return force, (A, R, F, S)


# ----------------------------------------------------------------------------- stepping
def collision_penalty(pos: np.ndarray, cfg: SimConfig) -> np.ndarray:
    """Ground-plane quadratic penalty (sim.py:238-244)."""
    f = np.zeros_like(pos)
    if cfg.collision:
        delta = np.maximum(cfg.collision_range - pos[:, 1], 0.0)
        f[:, 1] = delta * delta * cfg.collision_stiffness
    return f


def ratio_of(x: np.ndarray, cfg: SimConfig) -> np.ndarray:
    return 0.5 * np.tanh(cfg.tanh_gain * x) + 0.5


class OracleSim:
    """Stateless-ish oracle: holds the scene, steps with explicit state."""

    def __init__(self, rest, mass_scalar, cfg: SimConfig):
        self.cfg = cfg
        self.rest = np.asarray(rest, dtype=np.float64)
        n = self.rest.shape[0]
        self.mass = np.full(n, mass_scalar, dtype=np.float64)
        self.rho, self.volume = compute_volume(self.rest, self.mass, cfg)
        nu = cfg.poisson_ratio
        E = cfg.youngs_modulus
        self.mu = np.full(n, E / (2.0 * (1.0 + nu)))
        self.lam = np.full(n, E * nu / ((1.0 + nu) * (1.0 - 2.0 * nu)))
        self.free = np.ones((n, 3))
        self.external = np.tile(np.asarray(cfg.external_force), (n, 1))

    def initial_state(self):
        pos = self.rest.copy()
        vel = np.tile(np.asarray(self.cfg.initial_velocity), (self.rest.shape[0], 1))
        return pos, vel

    def elastic(self, pos, ratio):
        f, _ = compute_elastic_forces(
            pos, self.rest, self.volume, self.mass, self.mu, self.lam, ratio, self.cfg
        )
        return f

    def total_force(self, pos, vel, f_el):
        return self.external + f_el - self.cfg.damping * vel + collision_penalty(pos, self.cfg)

    def step(self, pos, vel, f_el, ratio):
        """One integrator step.  Returns (pos', vel', f_el')."""
        cfg = self.cfg
        dt = cfg.dt
        m = self.mass[:, None]
        if cfg.integrator == "trapezoidal":
            force1 = self.total_force(pos, vel, f_el)
            pos_n = pos + (dt * vel + 0.5 * dt * dt * force1 / m) * self.free
            f_el_n = self.elastic(pos_n, ratio)
            force2 = self.external + f_el_n - cfg.damping * vel + collision_penalty(pos_n, cfg)
            vel_n = vel + dt * (force1 + force2) / (2.0 * m) * self.free
            return pos_n, vel_n, f_el_n
        elif cfg.integrator == "symplectic":
            f_el_now = self.elastic(pos, ratio)
            force = self.total_force(pos, vel, f_el_now)
            vel_n = vel + dt * force / m * self.free
            pos_n = pos + dt * vel_n * self.free
            return pos_n, vel_n, f_el_now
        raise ValueError(cfg.integrator)

    def rollout(self, x, n_steps=None, record_every=None):
        """Full episode.  Returns (positions, velocities) lists of recorded frames
        (frame 0 included) in reference semantics (sim.py:341-358)."""
        cfg = self.cfg
        n_steps = cfg.frames if n_steps is None else n_steps
        ratio = ratio_of(np.asarray(x, dtype=np.float64), cfg)
        pos, vel = self.initial_state()
        f_el = self.elastic(pos, ratio) if cfg.integrator == "trapezoidal" else np.zeros_like(pos)
        traj_p, traj_v = [pos.copy()], [vel.copy()]
        for _ in range(n_steps):
            pos, vel, f_el = self.step(pos, vel, f_el, ratio)
            traj_p.append(pos.copy())
            traj_v.append(vel.copy())
        return np.stack(traj_p), np.stack(traj_v)

    def loss(self, traj_p, traj_v, target_p, target_v):
        """Reference loss (sim.py:269-273,359-361 / sim_taichi.py:210-214)."""
        cfg = self.cfg
        if cfg.loss_mode == "final":
            dp = traj_p[-1] - target_p[-1]
            dv = traj_v[-1] - target_v[-1]
            return float(np.sum(dp * dp) + np.sum(dv * dv))
        total = 0.0
        interval = traj_p.shape[0] - 1
        n_targets = target_p.shape[0]
        step = interval // n_targets
        for i in range(n_targets):
            f = step * (i + 1)
            dp = traj_p[f] - target_p[i]
            dv = traj_v[f] - target_v[i]
            total += np.sum(dp * dp) + cfg.dt * np.sum(dv * dv)
        return float(total)
