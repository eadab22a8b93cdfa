"""Parity tests: JAX gather-table physics ops vs the O(N^2) f64 NumPy oracle.

The oracle mirrors the reference math directly (sim.py:154-244); the JAX path
uses the restructured topology-table algebra (ops/elasticity.py docstring).
Both must agree to f64 precision in both Warp-parity and Taichi-parity
semantics — this validates the restructuring is exact, not approximate.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from softbody_tpu import taichi_parity, warp_parity
from softbody_tpu.geometry.shapes import inflatable_sphere, suggest_h
from softbody_tpu.oracle import sim as oracle
from softbody_tpu.ops import elasticity
from softbody_tpu.sim.scene import build_scene


def make_case(cfg, n_outer=96, seed=0):
    pts, out_num = inflatable_sphere(n_outer=n_outer, radius=0.05, seed=seed)
    cfg = cfg.replace(h=suggest_h(pts, 16), dtype="float64")
    osim = oracle.OracleSim(pts, cfg.mass, cfg)
    scene = build_scene(pts, cfg, out_num=out_num)
    return pts, cfg, osim, scene


def deformed_positions(rest, seed=0, amp=0.08):
    rng = np.random.default_rng(seed)
    # smooth-ish deformation: affine stretch + small noise
    F = np.eye(3) + amp * rng.normal(size=(3, 3))
    return (rest - rest.mean(0)) @ F.T + rest.mean(0) + amp * 0.01 * rng.normal(size=rest.shape)


@pytest.mark.parametrize("preset", [warp_parity, taichi_parity])
def test_volume_matches_oracle(preset):
    pts, cfg, osim, scene = make_case(preset())
    np.testing.assert_allclose(np.asarray(scene.materials.volume), osim.volume, rtol=1e-10)


@pytest.mark.parametrize("preset", [warp_parity, taichi_parity])
def test_deformation_matches_oracle(preset):
    pts, cfg, osim, scene = make_case(preset())
    pos = deformed_positions(pts, seed=1)
    A, R, F = elasticity.deformation(jnp.asarray(pos), scene.topology, cfg)

    A_o = oracle.compute_A_pq(pos, pts, osim.mass, cfg)
    np.testing.assert_allclose(np.asarray(A), A_o, rtol=1e-8, atol=1e-12)

    R_o = oracle.polar_rotation(A_o) if cfg.corotated else np.tile(np.eye(3), (len(pts), 1, 1))
    np.testing.assert_allclose(np.asarray(R), R_o, atol=1e-7)

    _, F_o = oracle.compute_nabla_u(pos, pts, osim.volume, R_o, cfg)
    np.testing.assert_allclose(np.asarray(F), F_o, rtol=1e-6, atol=1e-9)


@pytest.mark.parametrize("preset", [warp_parity, taichi_parity])
def test_elastic_forces_match_oracle(preset):
    pts, cfg, osim, scene = make_case(preset())
    pos = deformed_positions(pts, seed=2)
    x = np.random.default_rng(3).normal(size=len(pts))
    ratio = oracle.ratio_of(x, cfg)

    f_jax, _ = elasticity.elastic_forces(
        jnp.asarray(pos), jnp.asarray(ratio), scene.materials, scene.topology, cfg
    )
    f_o, _ = oracle.compute_elastic_forces(
        pos, pts, osim.volume, osim.mass, osim.mu, osim.lam, ratio, cfg
    )
    scale = np.abs(f_o).max()
    np.testing.assert_allclose(np.asarray(f_jax), f_o, atol=1e-7 * scale)


def test_forces_vanish_at_rest():
    # At the rest configuration F = I, S = 0 -> zero elastic force.
    pts, cfg, osim, scene = make_case(warp_parity())
    ratio = jnp.full(len(pts), 0.3, dtype=jnp.float64)
    f, (R, F, S) = elasticity.elastic_forces(
        jnp.asarray(pts), ratio, scene.materials, scene.topology, cfg
    )
    # S is ~mu*scale (1e7) times the residual strain; f64 roundoff in the
    # Y - rest_corr cancellation leaves ~1e-14 strain -> ~1e-7 stress.
    assert np.abs(np.asarray(S)).max() < 1e-6
    assert np.abs(np.asarray(f)).max() < 1e-6
    # rest A_pq polar rotation is identity
    np.testing.assert_allclose(np.asarray(R), np.tile(np.eye(3), (len(pts), 1, 1)), atol=1e-6)


def test_momentum_conservation_taichi_mode():
    # With F_pair = F_j the pairwise forces are exactly antisymmetric
    # (f_i<-j = -f_j<-i), so internal forces conserve linear momentum.
    pts, cfg, osim, scene = make_case(taichi_parity())
    pos = deformed_positions(pts, seed=4)
    ratio = np.full(len(pts), 0.2)
    f, _ = elasticity.elastic_forces(
        jnp.asarray(pos), jnp.asarray(ratio), scene.materials, scene.topology, cfg
    )
    total = np.asarray(f).sum(0)
    scale = np.abs(np.asarray(f)).max()
    np.testing.assert_allclose(total, 0.0, atol=1e-9 * max(scale, 1.0) * len(pts))


def test_ratio_parameterization():
    cfg = warp_parity()
    x = jnp.asarray(np.linspace(-3, 3, 101))
    r = elasticity.compute_ratio(x, cfg)
    np.testing.assert_allclose(np.asarray(r), 0.5 * np.tanh(3.0 * np.asarray(x)) + 0.5, atol=1e-14)
    assert (np.asarray(r) > 0).all() and (np.asarray(r) < 1).all()
    cfg_t = taichi_parity()
    r_t = elasticity.compute_ratio(x, cfg_t)
    np.testing.assert_allclose(np.asarray(r_t), 0.5 * np.tanh(5.0 * np.asarray(x)) + 0.5, atol=1e-14)
