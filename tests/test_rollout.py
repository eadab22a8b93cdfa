"""Episode-level tests: trajectory parity vs the oracle, loss parity, and the
analytic-vs-finite-difference gradient check (the reference's only automated
validation — grad_check, sim.py:418-436 / sim_taichi.py:343-359)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from softbody_tpu import rollout, taichi_parity, warp_parity
from softbody_tpu.geometry.shapes import inflatable_sphere, suggest_h
from softbody_tpu.oracle import sim as oracle
from softbody_tpu.sim.rollout import loss_fn
from softbody_tpu.sim.scene import build_scene

N_STEPS = 40


def make_case(preset, n_outer=80, seed=0, **cfg_over):
    pts, out_num = inflatable_sphere(n_outer=n_outer, radius=0.05, seed=seed)
    # The procedural test body is much lighter than the reference assets, so the
    # reference dt violates CFL here; parity only needs a *stable* shared regime.
    # Also give the Taichi preset (v0=0, no external force) non-trivial motion.
    over = dict(
        h=suggest_h(pts, 16),
        dtype="float64",
        dt=1e-6,
        initial_velocity=(0.0, -0.4, 0.0),
        external_force=(0.0, -1e-3, 0.0),
    )
    over.update(cfg_over)
    cfg = preset().replace(**over)
    osim = oracle.OracleSim(pts, cfg.mass, cfg)
    scene = build_scene(pts, cfg, out_num=out_num)
    return pts, cfg, osim, scene


@pytest.mark.parametrize("preset", [warp_parity, taichi_parity])
def test_trajectory_matches_oracle(preset):
    pts, cfg, osim, scene = make_case(preset)
    rng = np.random.default_rng(1)
    x = rng.normal(size=len(pts))

    traj_p, traj_v = osim.rollout(x, n_steps=N_STEPS)
    _, final, rec = rollout(jnp.asarray(x), scene, cfg, n_steps=N_STEPS, record_every=1)
    rec_p, rec_v = np.asarray(rec[0]), np.asarray(rec[1])

    # recorded frames are 1..N_STEPS; oracle includes frame 0
    p_scale = np.abs(traj_p).max()
    v_scale = max(np.abs(traj_v).max(), 1e-12)
    assert np.abs(rec_p - traj_p[1:]).max() < 1e-9 * max(p_scale, 1.0)
    assert np.abs(rec_v - traj_v[1:]).max() < 1e-7 * v_scale
    np.testing.assert_allclose(np.asarray(final.position), traj_p[-1], atol=1e-9 * max(p_scale, 1.0))


@pytest.mark.parametrize("preset", [warp_parity, taichi_parity])
def test_loss_matches_oracle(preset):
    pts, cfg, osim, scene = make_case(preset)
    rng = np.random.default_rng(2)
    x = rng.normal(size=len(pts))
    n_targets = 4
    cfg = cfg.replace(target_frames=n_targets)

    # synth targets: a perturbed copy of the oracle trajectory samples
    traj_p, traj_v = osim.rollout(x, n_steps=N_STEPS)
    step = N_STEPS // n_targets
    tp = traj_p[[step * (i + 1) for i in range(n_targets)]] * 1.01
    tv = traj_v[[step * (i + 1) for i in range(n_targets)]] * 0.99

    l_oracle = osim.loss(traj_p, traj_v, tp, tv)
    l_jax = float(
        loss_fn(jnp.asarray(x), scene, cfg, jnp.asarray(tp), jnp.asarray(tv), n_steps=N_STEPS)
    )
    np.testing.assert_allclose(l_jax, l_oracle, rtol=1e-8)


@pytest.mark.parametrize("preset", [warp_parity, taichi_parity])
@pytest.mark.parametrize("remat", [True, False])
def test_gradient_matches_finite_differences(preset, remat):
    """Central-difference check of dL/dx (grad_check semantics, sim.py:418-436).

    The top of the body is clamped (sim_taichi.py:329-331 style) so the falling
    body deforms — with uniform v0 alone the motion is rigid and dL/dx ~ 0.
    """
    pts, cfg, osim, scene = make_case(preset, n_outer=48, dt=2e-6)
    mask = np.ones((len(pts), 3))
    mask[pts[:, 1] > np.percentile(pts[:, 1], 85)] = 0.0
    scene = build_scene(pts, cfg, dirichlet_mask=mask)
    osim.free = mask
    cfg = cfg.replace(target_frames=2, remat=remat)
    n_steps = 40
    rng = np.random.default_rng(3)
    x = rng.normal(size=len(pts)) * 0.5

    # targets: inflated rest shape (sim_taichi.py:290-294 style)
    tp = np.stack([pts * 1.2, pts * 1.3])
    tv = np.zeros_like(tp)

    f = jax.jit(
        lambda xv: loss_fn(xv, scene, cfg, jnp.asarray(tp), jnp.asarray(tv), n_steps=n_steps)
    )
    g = jax.jit(jax.grad(
        lambda xv: loss_fn(xv, scene, cfg, jnp.asarray(tp), jnp.asarray(tv), n_steps=n_steps)
    ))(jnp.asarray(x))
    g = np.asarray(g)
    assert np.abs(g).max() > 1e-12, "degenerate test: gradient numerically zero"

    i = int(np.argmax(np.abs(g)))
    for eps in (1e-5, 1e-6):
        xp = x.copy(); xp[i] += eps
        xm = x.copy(); xm[i] -= eps
        g_num = (float(f(jnp.asarray(xp))) - float(f(jnp.asarray(xm)))) / (2 * eps)
        assert abs(g[i] - g_num) < 2e-4 * max(abs(g_num), abs(g[i]), 1e-12), (
            f"analytic {g[i]} vs numeric {g_num} at eps={eps}"
        )


def test_remat_matches_no_remat():
    pts, cfg, osim, scene = make_case(warp_parity, n_outer=48)
    cfg_r = cfg.replace(target_frames=2, remat=True)
    cfg_n = cfg.replace(target_frames=2, remat=False)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=len(pts)) * 0.3)
    tp = jnp.asarray(np.stack([pts * 1.1, pts * 1.2]))
    tv = jnp.zeros_like(tp)
    g_r = jax.grad(lambda xv: loss_fn(xv, scene, cfg_r, tp, tv, n_steps=16))(x)
    g_n = jax.grad(lambda xv: loss_fn(xv, scene, cfg_n, tp, tv, n_steps=16))(x)
    np.testing.assert_allclose(np.asarray(g_r), np.asarray(g_n), rtol=1e-9, atol=1e-12)


@pytest.mark.slow  # ~60 s; remat semantics stay covered fast by test_remat_matches_no_remat
def test_nested_remat_matches_linear():
    """sqrt-nested checkpointing (cfg.remat_chunk) must be a pure memory
    transform: identical loss and gradient to linear per-step remat, including
    a chunk-tail split (n_steps not a chunk multiple)."""
    pts, cfg, osim, scene = make_case(warp_parity, n_outer=48)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=len(pts)) * 0.3)
    tp = jnp.asarray(np.stack([pts * 1.1, pts * 1.2]))
    tv = jnp.zeros_like(tp)

    def vg(cfg_v, n_steps):
        return jax.value_and_grad(
            lambda xv: loss_fn(xv, scene, cfg_v, tp, tv, n_steps=n_steps))(x)

    for n_steps in (16, 18):  # 18 = 4*4 bulk + 2-step tail
        l_lin, g_lin = vg(cfg.replace(target_frames=2, remat_chunk=0), n_steps)
        l_nst, g_nst = vg(cfg.replace(target_frames=2, remat_chunk=4), n_steps)
        np.testing.assert_allclose(float(l_nst), float(l_lin), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(g_nst), np.asarray(g_lin),
                                   rtol=1e-9, atol=1e-14)


def test_dirichlet_mask_freezes_particles():
    pts, cfg, osim, scene = make_case(warp_parity, n_outer=48)
    mask = np.ones((len(pts), 3))
    frozen = [0, 5, 11]
    mask[frozen] = 0.0
    scene2 = build_scene(pts, cfg, dirichlet_mask=mask)
    x = jnp.zeros(len(pts), dtype=jnp.float64)
    _, final, _ = rollout(x, scene2, cfg, n_steps=10)
    np.testing.assert_allclose(np.asarray(final.position)[frozen], pts[frozen], atol=0)
    # others moved (gravity + initial velocity)
    assert np.abs(np.asarray(final.position)[1] - pts[1]).max() > 0


def test_collision_keeps_particles_above_ground():
    # Drop a body from just above the plane; the penalty must push it back up.
    pts, out_num = inflatable_sphere(n_outer=64, radius=0.03, center=(0.0, 0.0305, 0.0))
    cfg = warp_parity().replace(
        h=suggest_h(pts, 16), dtype="float64", dt=2e-6,
        initial_velocity=(0.0, -2.0, 0.0),
        # stiffer penalty than the reference default so the effect is visible
        # within the short (300-step) test horizon
        collision_stiffness=3e9,
    )
    scene = build_scene(pts, cfg)
    x = jnp.zeros(len(pts), dtype=jnp.float64)
    _, final, _ = rollout(x, scene, cfg, n_steps=300)
    y_min = np.asarray(final.position)[:, 1].min()
    assert np.isfinite(np.asarray(final.position)).all()
    # without collision the bottom particles (start y ~ 5e-4, fall 2*2e-6*300 =
    # 1.2e-3) would be well below ground
    assert y_min > -1e-4
    cfg_nc = cfg.replace(collision=False)
    _, final_nc, _ = rollout(x, scene, cfg_nc, n_steps=300)
    assert np.asarray(final_nc.position)[:, 1].min() < -2e-4
