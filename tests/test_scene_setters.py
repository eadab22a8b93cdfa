"""Setter-style material updates (C19: sim.py:279-308 semantics) and warm start
(C17: sim.py:454)."""

import numpy as np
import jax.numpy as jnp

from softbody_tpu import build_scene, warp_parity
from softbody_tpu.geometry.shapes import inflatable_sphere, suggest_h
from softbody_tpu.opt.driver import warm_start_x0
from softbody_tpu.sim.scene import lame_parameters, update_materials


def setup():
    pts, out_num = inflatable_sphere(n_outer=48, radius=0.05)
    cfg = warp_parity().replace(h=suggest_h(pts, 14), dtype="float64")
    return pts, cfg, build_scene(pts, cfg, out_num=out_num)


def test_youngs_modulus_update_recomputes_lame():
    pts, cfg, scene = setup()
    s2 = update_materials(scene, cfg, youngs_modulus=3e5)
    mu, lam = lame_parameters(3e5, cfg.poisson_ratio)
    np.testing.assert_allclose(np.asarray(s2.materials.mu), mu, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(s2.materials.lam), lam, rtol=1e-9)


def test_poisson_update_keeps_youngs():
    pts, cfg, scene = setup()
    s2 = update_materials(scene, cfg, poisson_ratio=0.3)
    mu, lam = lame_parameters(cfg.youngs_modulus, 0.3)
    np.testing.assert_allclose(np.asarray(s2.materials.mu), mu, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s2.materials.lam), lam, rtol=1e-6)


def test_per_index_updates():
    pts, cfg, scene = setup()
    idx = [0, 3, 7]
    s2 = update_materials(scene, cfg, dirichlet=(0.0, 0.0, 0.0), index=idx)
    free = np.asarray(s2.materials.free)
    assert (free[idx] == 0).all() and free.sum() == 3 * (len(pts) - 3)
    s3 = update_materials(scene, cfg, external_force=(0.0, 0.0, -0.5), index=idx)
    ext = np.asarray(s3.materials.external)
    np.testing.assert_allclose(ext[idx], np.tile([0.0, 0.0, -0.5], (3, 1)))
    # untouched rows keep the config default
    np.testing.assert_allclose(ext[1], cfg.external_force)


def test_mass_update_retriggers_volume():
    pts, cfg, scene = setup()
    s2 = update_materials(scene, cfg, mass=2.0 * cfg.mass)
    # rho scales with m -> V = m/rho invariant; vj tables rebuilt consistently
    np.testing.assert_allclose(
        np.asarray(s2.materials.volume), np.asarray(scene.materials.volume), rtol=1e-9
    )
    np.testing.assert_allclose(np.asarray(s2.materials.mass), 2.0 * cfg.mass)
    np.testing.assert_allclose(
        np.asarray(s2.topology.c), 2.0 * np.asarray(scene.topology.c), rtol=1e-9
    )


def test_warm_start(tmp_path):
    x_prev = np.random.default_rng(0).normal(size=20)
    np.save(tmp_path / "x.npy", x_prev)
    x0 = warm_start_x0(20, tmp_path / "x.npy", noise=1e-2, seed=1)
    assert np.abs(x0 - x_prev).max() <= 1e-2
    assert np.abs(x0 - x_prev).max() > 0
    # missing file / wrong length -> zeros
    np.testing.assert_array_equal(warm_start_x0(20, tmp_path / "nope.npy"), 0.0)
    np.testing.assert_array_equal(warm_start_x0(21, tmp_path / "x.npy"), 0.0)
