"""Pallas pair kernels (interpret mode on CPU) vs the blocked XLA reference:
forces, rollouts, and custom-VJP gradients must match in both semantics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from softbody_tpu import taichi_parity, warp_parity, rollout
from softbody_tpu.geometry.shapes import inflatable_sphere, suggest_h
from softbody_tpu.ops.elasticity import compute_ratio
from softbody_tpu.sim.blocked import (
    build_blocked_scene, elastic_forces_blocked, elastic_forces_pallas,
)
from softbody_tpu.sim.rollout import loss_fn


def setup(preset, n_outer=80, clamp_top=False, **over):
    pts, out_num = inflatable_sphere(n_outer=n_outer, radius=0.05)
    base = dict(
        h=suggest_h(pts, 16), dtype="float64", dt=1e-6,
        initial_velocity=(0.0, -0.4, 0.0), external_force=(0.0, -1e-3, 0.0),
        target_frames=2, backend="blocked",
    )
    base.update(over)
    cfg = preset().replace(**base)
    mask = None
    if clamp_top:
        # clamp the top of the body (sim_taichi.py:329-331 style) so the falling
        # body DEFORMS — a rigid translation has zero strain and zero gradients
        mask = np.ones((len(pts), 3))
        mask[pts[:, 1] > np.percentile(pts[:, 1], 85)] = 0.0
    scene, sop = build_blocked_scene(pts, cfg, out_num=out_num, dirichlet_mask=mask)
    return pts, cfg, scene, sop


@pytest.mark.parametrize("preset", [warp_parity, taichi_parity])
def test_pallas_forces_match_blocked(preset):
    pts, cfg, scene, sop = setup(preset)
    rng = np.random.default_rng(0)
    F = np.eye(3) + 0.05 * rng.normal(size=(3, 3))
    pos = (pts - pts.mean(0)) @ F.T + pts.mean(0)
    pos_slots = scene.rest_position.at[sop].set(jnp.asarray(pos))
    x_slots = jnp.zeros(scene.rest_position.shape[0]).at[sop].set(
        jnp.asarray(rng.normal(size=len(pts)) * 0.4)
    )
    ratio = compute_ratio(x_slots, cfg)
    f_ref = elastic_forces_blocked(pos_slots, ratio, scene.materials, scene, cfg)
    f_pl = elastic_forces_pallas(pos_slots, ratio, scene.materials, scene, cfg)
    scale = np.abs(np.asarray(f_ref)).max()
    np.testing.assert_allclose(np.asarray(f_pl), np.asarray(f_ref), atol=1e-10 * scale)


@pytest.mark.parametrize("preset", [warp_parity, taichi_parity])
@pytest.mark.slow
def test_pallas_rollout_matches_blocked(preset):
    pts, cfg, scene, sop = setup(preset)
    ns = scene.rest_position.shape[0]
    rng = np.random.default_rng(1)
    x = jnp.zeros(ns).at[sop].set(jnp.asarray(rng.normal(size=len(pts)) * 0.3))
    _, fin_b, _ = rollout(x, scene, cfg, n_steps=10)
    _, fin_p, _ = rollout(x, scene, cfg.replace(backend="pallas"), n_steps=10)
    np.testing.assert_allclose(
        np.asarray(fin_p.position), np.asarray(fin_b.position), atol=1e-12
    )
    # reduction order differs (MXU dots vs einsum): pure f64 rounding noise
    np.testing.assert_allclose(
        np.asarray(fin_p.velocity), np.asarray(fin_b.velocity), atol=1e-10
    )


@pytest.mark.parametrize("preset", [warp_parity, taichi_parity])
@pytest.mark.slow
def test_pallas_gradient_matches_blocked(preset):
    # Needs real strain in the episode (starting from rest, StVK stress AND its
    # x-gradient vanish; uniform v0 alone is a rigid translation): clamp the top
    # and run enough steps at a stable dt for the body to deform.
    pts, cfg, scene, sop = setup(preset, n_outer=48, dt=2e-6, clamp_top=True)
    ns = scene.rest_position.shape[0]
    rng = np.random.default_rng(2)
    x = jnp.zeros(ns).at[sop].set(jnp.asarray(rng.normal(size=len(pts)) * 0.3))
    tp = jnp.broadcast_to(scene.rest_position, (2, ns, 3)) * 1.1
    tv = jnp.zeros_like(tp)

    g_b = jax.grad(lambda q: loss_fn(q, scene, cfg, tp, tv, n_steps=40))(x)
    cfg_p = cfg.replace(backend="pallas")
    g_p = jax.grad(lambda q: loss_fn(q, scene, cfg_p, tp, tv, n_steps=40))(x)
    scale = np.abs(np.asarray(g_b)).max()
    assert scale > 1e-16, "degenerate test: gradient is numerically zero"
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_b), atol=1e-6 * scale)
