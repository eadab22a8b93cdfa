"""Blocked (column-dense slot) backend must reproduce the gather backend
exactly — same forces, same trajectories, same loss, same gradient — since both
implement the same math over different data structures."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from softbody_tpu import taichi_parity, warp_parity, build_scene, rollout
from softbody_tpu.geometry.shapes import inflatable_sphere, suggest_h
from softbody_tpu.ops.elasticity import compute_ratio, elastic_forces
from softbody_tpu.sim.blocked import build_blocked_scene, elastic_forces_blocked
from softbody_tpu.sim.rollout import loss_fn

N_STEPS = 12


def setup(preset, n_outer=80, **over):
    pts, out_num = inflatable_sphere(n_outer=n_outer, radius=0.05)
    base = dict(
        h=suggest_h(pts, 16), dtype="float64", dt=1e-6,
        initial_velocity=(0.0, -0.4, 0.0), external_force=(0.0, -1e-3, 0.0),
        target_frames=2,
    )
    base.update(over)
    cfg = preset().replace(**base)
    scene_g = build_scene(pts, cfg, out_num=out_num)
    scene_b, sop = build_blocked_scene(pts, cfg.replace(backend="blocked"), out_num=out_num)
    return pts, cfg, scene_g, scene_b, sop


def scatter_x(x, scene_b, sop):
    ns = scene_b.rest_position.shape[0]
    return jnp.zeros(ns, dtype=x.dtype).at[jnp.asarray(sop)].set(x)


def scatter_targets(tp, tv, scene_b, sop, cfg):
    ns = scene_b.rest_position.shape[0]
    base_p = jnp.broadcast_to(scene_b.rest_position, (tp.shape[0], ns, 3))
    v0 = jnp.asarray(cfg.initial_velocity, dtype=tv.dtype)
    base_v = jnp.broadcast_to(v0, (tv.shape[0], ns, 3))
    return base_p.at[:, sop].set(tp), base_v.at[:, sop].set(tv)


@pytest.mark.parametrize("preset", [warp_parity, taichi_parity])
def test_elastic_forces_match_gather(preset):
    pts, cfg, scene_g, scene_b, sop = setup(preset)
    rng = np.random.default_rng(0)
    F = np.eye(3) + 0.05 * rng.normal(size=(3, 3))
    pos = (pts - pts.mean(0)) @ F.T + pts.mean(0)
    x = rng.normal(size=len(pts)) * 0.4
    ratio_g = compute_ratio(jnp.asarray(x), cfg)
    f_g, _ = elastic_forces(jnp.asarray(pos), ratio_g, scene_g.materials, scene_g.topology, cfg)

    cfg_b = cfg.replace(backend="blocked")
    pos_slots = scene_b.rest_position.at[sop].set(jnp.asarray(pos))
    ratio_b = compute_ratio(scatter_x(jnp.asarray(x), scene_b, sop), cfg_b)
    f_b = elastic_forces_blocked(pos_slots, ratio_b, scene_b.materials, scene_b, cfg_b)

    scale = np.abs(np.asarray(f_g)).max()
    np.testing.assert_allclose(np.asarray(f_b)[sop], np.asarray(f_g), atol=1e-9 * scale)
    # empty slots must produce exactly zero force
    mask = np.ones(scene_b.rest_position.shape[0], bool)
    mask[sop] = False
    assert np.abs(np.asarray(f_b)[mask]).max() == 0.0


@pytest.mark.parametrize("preset", [warp_parity, taichi_parity])
def test_rollout_and_loss_match_gather(preset):
    pts, cfg, scene_g, scene_b, sop = setup(preset)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=len(pts)) * 0.3)
    tp = jnp.asarray(np.stack([pts * 1.1, pts * 1.2]))
    tv = jnp.zeros_like(tp)

    l_g = float(loss_fn(x, scene_g, cfg, tp, tv, n_steps=N_STEPS))
    _, fin_g, _ = rollout(x, scene_g, cfg, n_steps=N_STEPS)

    cfg_b = cfg.replace(backend="blocked")
    x_b = scatter_x(x, scene_b, sop)
    tp_b, tv_b = scatter_targets(tp, tv, scene_b, sop, cfg_b)
    l_b = float(loss_fn(x_b, scene_b, cfg_b, tp_b, tv_b, n_steps=N_STEPS))
    _, fin_b, _ = rollout(x_b, scene_b, cfg_b, n_steps=N_STEPS)

    np.testing.assert_allclose(l_b, l_g, rtol=1e-9)
    np.testing.assert_allclose(
        np.asarray(fin_b.position)[sop], np.asarray(fin_g.position), atol=1e-12
    )


@pytest.mark.slow
def test_gradient_matches_gather():
    pts, out_num = inflatable_sphere(n_outer=48, radius=0.05)
    cfg = warp_parity().replace(
        h=suggest_h(pts, 16), dtype="float64", dt=2e-6,
        initial_velocity=(0.0, -0.4, 0.0), external_force=(0.0, -1e-3, 0.0),
        target_frames=2,
    )
    # clamp the top so the falling body deforms (rigid motion has zero gradient)
    mask = np.ones((len(pts), 3))
    mask[pts[:, 1] > np.percentile(pts[:, 1], 85)] = 0.0
    scene_g = build_scene(pts, cfg, out_num=out_num, dirichlet_mask=mask)
    scene_b, sop = build_blocked_scene(
        pts, cfg.replace(backend="blocked"), out_num=out_num, dirichlet_mask=mask
    )
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=len(pts)) * 0.3)
    tp = jnp.asarray(np.stack([pts * 1.1, pts * 1.2]))
    tv = jnp.zeros_like(tp)
    g_g = jax.grad(lambda q: loss_fn(q, scene_g, cfg, tp, tv, n_steps=40))(x)
    assert np.abs(np.asarray(g_g)).max() > 1e-12, "degenerate test: zero gradient"

    cfg_b = cfg.replace(backend="blocked")
    tp_b, tv_b = scatter_targets(tp, tv, scene_b, sop, cfg_b)

    def f_b(q):
        return loss_fn(scatter_x(q, scene_b, sop), scene_b, cfg_b, tp_b, tv_b, n_steps=40)

    g_b = jax.grad(f_b)(x)
    scale = np.abs(np.asarray(g_g)).max()
    np.testing.assert_allclose(np.asarray(g_b), np.asarray(g_g), atol=1e-8 * scale)


def test_varcol_rest_forces_vanish_f32():
    """Regression: varcol column padding must keep tiles a contiguous slot
    prefix (a max(.,L) pad that wasn't a rows-multiple silently misaligned
    rows vs tile_start, producing ~1e23 'rest' forces in f32)."""
    from softbody_tpu.sim.blocked import elastic_forces_blocked
    from softbody_tpu.ops.elasticity import compute_ratio

    # small body at a large-ish h -> L exceeds several column lengths, which is
    # exactly the shape that triggered the old misalignment
    pts, out_num = inflatable_sphere(n_outer=300, radius=0.05)
    cfg = warp_parity().replace(
        h=suggest_h(pts, 16), dtype="float32", backend="blocked"
    )
    scene, sop = build_blocked_scene(pts, cfg, out_num=out_num)
    ns = scene.rest_position.shape[0]
    # the inflation field only scales stress; at rest the force must be ~0
    x = jnp.zeros(ns, jnp.float32).at[jnp.asarray(sop)].set(1.5)
    ratio = compute_ratio(x, cfg)
    f = elastic_forces_blocked(scene.rest_position, ratio, scene.materials, scene, cfg)
    assert float(jnp.abs(f).max()) < 1.0, float(jnp.abs(f).max())
