"""SPMD sparse/pallas backend on the virtual 8-device CPU mesh.

The shard-major layout (topology/sparse.py n_shards) + all-gathered packed
sources (parallel/sparse_shard.py) must reproduce the single-device sparse
episode on the SAME layout: trajectories at f64 ulp level (XLA's FMA fusion is
program-dependent), loss/grad to f64 tolerance (cross-shard reduction order
differs)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from softbody_tpu import warp_parity, taichi_parity
from softbody_tpu.geometry.shapes import inflatable_sphere, suggest_h
from softbody_tpu.parallel.sharding import make_mesh
from softbody_tpu.parallel.sparse_shard import (
    sparse_sharded_episode, sparse_sharded_value_and_grad,
)
from softbody_tpu.sim.rollout import loss_fn, rollout
from softbody_tpu.sim.sparse import build_sparse_scene

N_STEPS = 10
N_DEV = 8


def setup(preset, **over):
    pts, out_num = inflatable_sphere(n_outer=64, radius=0.05)
    cfg = preset().replace(
        h=suggest_h(pts, 16), dtype="float64", dt=1e-6, target_frames=2,
        backend="pallas", **over,
    )
    scene, sop = build_sparse_scene(pts, cfg, out_num=out_num, rows=16,
                                    n_shards=N_DEV)
    ns = scene.blocked.n_slots
    rng = np.random.default_rng(0)
    x = jnp.zeros(ns).at[jnp.asarray(sop)].set(
        jnp.asarray(rng.normal(size=len(pts)) * 0.3))
    base = np.asarray(scene.rest_position)
    tp = np.stack([base * 1.02, base * 1.04])
    tv = np.zeros_like(tp)
    # make every PADDING slot's loss term zero (padding slots never move:
    # free = 0): target = its frozen state.  The single-device loss then
    # equals the sharded loss (which drops only the inert trailing group).
    m = scene.blocked.n_tiles * scene.blocked.rows
    pad = np.ones(ns, bool)
    pad[np.asarray(sop)] = False
    tp[:, pad] = base[pad]
    tv[:, pad] = np.asarray(cfg.initial_velocity, np.float64)
    return pts, cfg, scene, x, jnp.asarray(tp), jnp.asarray(tv)


@pytest.mark.parametrize("mode", [
    "warp",
    pytest.param("taichi", marks=pytest.mark.slow),
])
def test_sharded_sparse_matches_single_device(mode):
    preset = warp_parity if mode == "warp" else taichi_parity
    pts, cfg, scene, x, tp, tv = setup(preset)
    m = scene.blocked.n_tiles * scene.blocked.rows

    # single-device reference on the SAME shard-major layout
    loss_ref, final_ref, _ = jax.jit(
        lambda xv: rollout(xv, scene, cfg, tp, tv, n_steps=N_STEPS)
    )(x)

    mesh = make_mesh(N_DEV)
    loss_sh, (pos_sh, vel_sh) = jax.jit(
        lambda xv: sparse_sharded_episode(xv, scene, cfg, tp, tv, mesh,
                                          n_steps=N_STEPS)
    )(x)

    # per-slot math is identical (same kernels, same shapes, same values) but
    # XLA fuses the surrounding elementwise chains differently in the two
    # programs (FMA contraction is program-dependent), so trajectories agree
    # at f64 ulp level, not bitwise — measured max |dpos| ~1e-17 over 10 steps
    np.testing.assert_allclose(np.asarray(pos_sh),
                               np.asarray(final_ref.position[:m]),
                               rtol=1e-10, atol=1e-13)
    np.testing.assert_allclose(np.asarray(vel_sh),
                               np.asarray(final_ref.velocity[:m]),
                               rtol=1e-10, atol=1e-10)
    # loss reduction order differs across shards -> f64 tolerance (padding
    # slots contribute exactly zero by the setup's frozen-state targets, so
    # dropping the trailing group changes nothing)
    np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=1e-12)


@pytest.mark.slow  # ~130 s; core SPMD parity stays fast via test_sharded_sparse_matches_single_device
def test_sharded_obstacles_and_contact_match_single_device():
    """BASELINE configs #3/#4 sharded: SDF obstacle penalty + dynamic
    re-binned contact inside the shard_map episode reproduce the single-device
    rollout (obstacle math is slot-local; contact bins the all-gathered
    positions and queries only local rows)."""
    from softbody_tpu.ops import obstacles as obs
    from softbody_tpu.ops.contact import build_contact_grid

    pts, out_num = inflatable_sphere(n_outer=64, radius=0.05)
    h = suggest_h(pts, 16)
    cfg = warp_parity().replace(
        h=h, dtype="float64", dt=1e-6, target_frames=2, backend="pallas",
    )
    # plane cuts into the body and r_c exceeds rest spacing so both penalty
    # terms fire from step one (this is a parity test, not a physics scenario)
    obstacles = obs.make(
        obs.plane([0.0, 1.0, 0.0], float(pts[:, 1].min()) + 0.01),
        stiffness=1e4, margin=1e-3)
    grid = build_contact_grid(pts.min(0) - 0.02, pts.max(0) + 0.02,
                              r_c=1.2 * h, cap=64, stiffness=1e4)
    scene, sop = build_sparse_scene(pts, cfg, out_num=out_num, rows=16,
                                    n_shards=N_DEV, obstacles=obstacles)
    scene = scene._replace(contact=grid)
    ns = scene.blocked.n_slots
    m = scene.blocked.n_tiles * scene.blocked.rows
    rng = np.random.default_rng(1)
    x = jnp.zeros(ns).at[jnp.asarray(sop)].set(
        jnp.asarray(rng.normal(size=len(pts)) * 0.3))
    base = np.asarray(scene.rest_position)
    tp = np.stack([base * 1.02, base * 1.04])
    tv = np.zeros_like(tp)
    pad = np.ones(ns, bool)
    pad[np.asarray(sop)] = False
    tp[:, pad] = base[pad]
    tv[:, pad] = np.asarray(cfg.initial_velocity, np.float64)
    tp, tv = jnp.asarray(tp), jnp.asarray(tv)

    loss_ref, final_ref, _ = jax.jit(
        lambda xv: rollout(xv, scene, cfg, tp, tv, n_steps=N_STEPS))(x)
    mesh = make_mesh(N_DEV)
    loss_sh, (pos_sh, vel_sh) = jax.jit(
        lambda xv: sparse_sharded_episode(xv, scene, cfg, tp, tv, mesh,
                                          n_steps=N_STEPS))(x)
    # obstacle + contact forces must actually fire for this to test anything
    from softbody_tpu.ops.contact import contact_forces
    from softbody_tpu.ops.obstacles import penalty_force
    assert float(jnp.abs(contact_forces(
        final_ref.position[:m], grid)).max()) > 0.0
    assert float(jnp.abs(penalty_force(
        obstacles, final_ref.position[:m])).max()) > 0.0
    np.testing.assert_allclose(np.asarray(pos_sh),
                               np.asarray(final_ref.position[:m]),
                               rtol=1e-10, atol=1e-13)
    np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=1e-12)


@pytest.mark.slow  # ~240 s
def test_halo_exchange_matches_all_gather():
    """Boundary-group ring exchange (build_halo_plan + ppermute rounds) must
    reproduce the all-gather episode exactly: same kernels, same operand
    VALUES, only the source construction differs."""
    from softbody_tpu.parallel.sparse_shard import build_halo_plan

    pts, cfg, scene, x, tp, tv = setup(warp_parity)
    mesh = make_mesh(N_DEV)

    plan, _, _ = build_halo_plan(scene.blocked)
    m = scene.blocked.n_tiles * scene.blocked.rows
    assert 0 < plan.halo_rows < m // 8, plan.halo_rows  # strictly less comm

    loss_ag, (pos_ag, vel_ag) = jax.jit(
        lambda xv: sparse_sharded_episode(xv, scene, cfg, tp, tv, mesh,
                                          n_steps=N_STEPS))(x)
    loss_h, (pos_h, vel_h) = jax.jit(
        lambda xv: sparse_sharded_episode(xv, scene, cfg, tp, tv, mesh,
                                          n_steps=N_STEPS, halo=True))(x)
    np.testing.assert_allclose(np.asarray(pos_h), np.asarray(pos_ag),
                               rtol=1e-12, atol=1e-15)
    np.testing.assert_allclose(float(loss_h), float(loss_ag), rtol=1e-12)

    # gradient through the ppermute rounds
    run = sparse_sharded_value_and_grad(scene, cfg, mesh, n_steps=N_STEPS,
                                        halo=True)
    run_ag = sparse_sharded_value_and_grad(scene, cfg, mesh, n_steps=N_STEPS)
    _, gh = run(x, tp, tv)
    _, gag = run_ag(x, tp, tv)
    np.testing.assert_allclose(np.asarray(gh), np.asarray(gag),
                               rtol=1e-9, atol=1e-14)


@pytest.mark.slow
def test_sharded_sparse_grad_matches():
    pts, cfg, scene, x, tp, tv = setup(warp_parity)
    mesh = make_mesh(N_DEV)

    gref = jax.jit(jax.grad(
        lambda xv: loss_fn(xv, scene, cfg, tp, tv, n_steps=N_STEPS)))(x)
    run = sparse_sharded_value_and_grad(scene, cfg, mesh, n_steps=N_STEPS)
    loss, gsh = run(x, tp, tv)
    assert np.isfinite(float(loss))
    np.testing.assert_allclose(np.asarray(gsh), np.asarray(gref),
                               rtol=1e-9, atol=1e-12)
