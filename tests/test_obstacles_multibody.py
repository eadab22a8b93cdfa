"""SDF obstacles (BASELINE config #3) + multi-body composition (config #4) +
native hash-grid builder + checkpointing."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from softbody_tpu import build_scene, rollout, warp_parity
from softbody_tpu.geometry.compose import Body, compose, translated
from softbody_tpu.geometry.shapes import inflatable_sphere, suggest_h
from softbody_tpu.ops import obstacles as obs


def test_sdf_primitives():
    o = obs.make(
        obs.sphere([0, 0, 0], 1.0),
        obs.plane([0, 1, 0], 0.0),
        obs.box([5, 0, 0], [1, 1, 1]),
    )
    pts = jnp.asarray([
        [0.0, 2.0, 0.0],    # sphere d=1, plane d=2, box far -> min 1
        [0.0, 0.5, 0.0],    # inside sphere d=-0.5
        [5.0, 3.0, 0.0],    # above box: d=2? plane d=3, sphere d~4.8, box d=2
    ])
    d = np.asarray(obs.sdf(o, pts))
    np.testing.assert_allclose(d, [1.0, -0.5, 2.0], atol=1e-6)


def test_sdf_gradients_and_penalty_direction():
    o = obs.make(obs.sphere([0.0, 0.0, 0.0], 1.0), stiffness=1e3, margin=0.0)
    pos = jnp.asarray([[0.0, 0.5, 0.0]])  # inside, depth 0.5
    f = np.asarray(obs.penalty_force(o, pos))
    # pushes outward (+y), magnitude stiffness * depth^2
    np.testing.assert_allclose(f[0], [0.0, 1e3 * 0.25, 0.0], atol=1e-3)
    outside = jnp.asarray([[0.0, 2.0, 0.0]])
    assert np.allclose(np.asarray(obs.penalty_force(o, outside)), 0.0)


def test_deepsdf_obstacle():
    from softbody_tpu.models import deepsdf as dsdf

    params = dsdf.init_params(jax.random.key(0), sizes=[3, 16, 16, 1])
    o = obs.make(obs.deepsdf(params, scale=2.0))
    pts = jnp.asarray(np.random.default_rng(0).normal(size=(7, 3)), jnp.float32)
    d = np.asarray(obs.sdf(o, pts))
    ref = np.asarray(dsdf.forward(params, pts / 2.0)).squeeze(-1) * 2.0
    np.testing.assert_allclose(d, ref, rtol=1e-5)
    f = obs.penalty_force(o, pts)
    assert np.isfinite(np.asarray(f)).all()


def test_obstacle_deflects_falling_body():
    # drop a body onto an SDF sphere obstacle; it must not sink inside
    pts, out_num = inflatable_sphere(n_outer=48, radius=0.02, center=(0, 0.05, 0))
    cfg = warp_parity().replace(
        h=suggest_h(pts, 14), dtype="float64", dt=2e-6, collision=False,
        initial_velocity=(0.0, -2.0, 0.0),
    )
    # obstacle top at y=0.0295; body bottom starts at y=0.03 and falls ~1.2mm
    sph = obs.make(obs.sphere([0.0, -0.5, 0.0], 0.5295), stiffness=3e9, margin=1e-4)
    scene = build_scene(pts, cfg, out_num=out_num, obstacles=sph)
    x = jnp.zeros(len(pts), dtype=jnp.float64)
    _, final, _ = rollout(x, scene, cfg, n_steps=300)
    p = np.asarray(final.position)
    assert np.isfinite(p).all()
    d = np.asarray(obs.sdf(sph, jnp.asarray(p)))
    assert d.min() > -2e-4  # nothing deeply inside the obstacle
    # without obstacle the body sinks past the surface
    scene_free = build_scene(pts, cfg, out_num=out_num)
    _, final_free, _ = rollout(x, scene_free, cfg, n_steps=300)
    d_free = np.asarray(obs.sdf(sph, jnp.asarray(np.asarray(final_free.position))))
    assert d_free.min() < -2e-4


def test_multibody_compose_and_sim():
    b1_pts, n1 = inflatable_sphere(n_outer=40, radius=0.02, center=(0, 0.03, 0))
    b1 = Body(points=b1_pts, out_num=n1, name="a")
    b2 = translated(b1, [0.08, 0.0, 0.0])
    comp = compose([b1, b2])
    assert comp.points.shape[0] == 2 * len(b1_pts)
    assert comp.body_slice(1).start == len(b1_pts)

    cfg = warp_parity().replace(h=suggest_h(comp.points, 14), dtype="float64", dt=2e-6)
    scene = build_scene(comp.points, cfg)
    x = jnp.zeros(len(comp.points), dtype=jnp.float64)
    _, final, _ = rollout(x, scene, cfg, n_steps=20)
    parts = comp.split(np.asarray(final.position))
    assert len(parts) == 2 and all(np.isfinite(p).all() for p in parts)
    # bodies separated by > 2h must not interact: body 2 stays a rigid
    # translation of body 1 (same fall, same elastic response)
    np.testing.assert_allclose(parts[1] - [0.08, 0, 0], parts[0], atol=1e-9)


def test_native_hashgrid_matches_scipy():
    from softbody_tpu.native import hashgrid

    if not hashgrid.available():
        pytest.skip("no native toolchain")
    from scipy.spatial import cKDTree

    pts, _ = inflatable_sphere(n_outer=300)
    r = 2 * suggest_h(pts, 16)
    nat = hashgrid.neighbor_lists(pts, r)
    ref = cKDTree(pts).query_ball_point(pts, r=r * (1 - 1e-12))
    for i in range(len(pts)):
        assert set(map(int, nat[i])) == set(ref[i]) - {i}


def test_checkpoint_roundtrip(tmp_path):
    import optax

    from softbody_tpu.core.types import ParticleState
    from softbody_tpu.utils import checkpoint as ckpt

    x = np.random.default_rng(0).normal(size=37)
    opt = optax.adam(1e-2)
    state = opt.init(jnp.asarray(x))
    key = jax.random.key(42)
    cfg = warp_parity()
    ckpt.save_opt_state(tmp_path / "c", x, opt_state=state, rng_key=key, cfg=cfg, step=7)
    out = ckpt.load_opt_state(tmp_path / "c", opt_state_like=state)
    np.testing.assert_array_equal(out["x"], x)
    assert out["meta"]["step"] == 7
    assert out["meta"]["config"]["h"] == cfg.h
    assert jax.random.key_data(out["rng_key"]).tolist() == jax.random.key_data(key).tolist()
    # optax state restored leaf-for-leaf
    for a, b in zip(jax.tree.leaves(out["opt_state"]), jax.tree.leaves(state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    st = ParticleState(jnp.ones((5, 3)), jnp.zeros((5, 3)), jnp.ones((5, 3)) * 2)
    ckpt.save_sim_state(tmp_path / "sim", st, frame=123)
    assert ckpt.latest_sim_frame(tmp_path / "sim") == 123
    st2 = ckpt.load_sim_state(tmp_path / "sim", 123)
    np.testing.assert_array_equal(np.asarray(st2.elastic_forces), 2.0)


@pytest.mark.slow
def test_obstacles_on_blocked_backend_match_gather():
    from softbody_tpu.sim.blocked import build_blocked_scene

    pts, out_num = inflatable_sphere(n_outer=48, radius=0.02, center=(0, 0.05, 0))
    cfg = warp_parity().replace(
        h=suggest_h(pts, 14), dtype="float64", dt=2e-6, collision=False,
        initial_velocity=(0.0, -2.0, 0.0),
    )
    sph = obs.make(obs.sphere([0.0, -0.5, 0.0], 0.5295), stiffness=3e9, margin=1e-4)
    scene_g = build_scene(pts, cfg, out_num=out_num, obstacles=sph)
    x = jnp.zeros(len(pts), dtype=jnp.float64)
    _, fin_g, _ = rollout(x, scene_g, cfg, n_steps=50)

    cfg_b = cfg.replace(backend="blocked")
    scene_b, sop = build_blocked_scene(pts, cfg_b, out_num=out_num, obstacles=sph)
    xb = jnp.zeros(scene_b.rest_position.shape[0], dtype=jnp.float64)
    _, fin_b, _ = rollout(xb, scene_b, cfg_b, n_steps=50)
    np.testing.assert_allclose(
        np.asarray(fin_b.position)[sop], np.asarray(fin_g.position), atol=1e-11
    )


def test_midepisode_checkpoint_resume(tmp_path):
    """Mid-episode snapshot/resume reproduces the uninterrupted trajectory
    (beyond-reference capability, SURVEY.md §5)."""
    from softbody_tpu.core.types import ParticleState
    from softbody_tpu.ops.elasticity import compute_ratio
    from softbody_tpu.sim.rollout import initial_state, step
    from softbody_tpu.utils import checkpoint as ckpt

    pts, out_num = inflatable_sphere(n_outer=48, radius=0.05)
    cfg = warp_parity().replace(h=suggest_h(pts, 14), dtype="float64", dt=2e-6)
    scene = build_scene(pts, cfg, out_num=out_num)
    ratio = compute_ratio(jnp.zeros(len(pts), jnp.float64), cfg)

    st = initial_state(scene, ratio, cfg)
    for _ in range(10):
        st = step(st, ratio, scene, cfg)
    ckpt.save_sim_state(tmp_path, st, frame=10)
    for _ in range(10):
        st = step(st, ratio, scene, cfg)

    st2 = ckpt.load_sim_state(tmp_path, 10, dtype="float64")
    for _ in range(10):
        st2 = step(st2, ratio, scene, cfg)
    np.testing.assert_allclose(
        np.asarray(st2.position), np.asarray(st.position), atol=1e-15
    )
