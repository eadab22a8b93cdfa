"""SPMD window-DMA backend on the virtual 8-device CPU mesh.

The shard-major column layout (topology/windows.py n_shards) + all-gathered
lane-major sources (parallel/window_shard.py) must reproduce the
single-device window episode on the SAME layout (same kernels, same global
slot space; only the source build + reduction order differ)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from softbody_tpu import warp_parity
from softbody_tpu.geometry.shapes import inflatable_sphere, suggest_h
from softbody_tpu.parallel.sharding import make_mesh
from softbody_tpu.parallel.window_shard import window_sharded_episode
from softbody_tpu.sim.rollout import loss_fn, rollout
from softbody_tpu.sim.windows import build_window_scene

N_STEPS = 8
N_DEV = 8


def setup(n_outer=64, max_buckets=4):
    pts, out_num = inflatable_sphere(n_outer=n_outer, radius=0.05)
    cfg = warp_parity().replace(
        h=suggest_h(pts, 16), dtype="float64", dt=1e-6, target_frames=2,
        backend="pallas", pair_def_grad="i",
    )
    scene, sop = build_window_scene(pts, cfg, out_num=out_num, rows=16,
                                    max_buckets=max_buckets, n_shards=N_DEV)
    ns = scene.blocked.n_slots
    rng = np.random.default_rng(0)
    x = jnp.zeros(ns).at[jnp.asarray(sop)].set(
        jnp.asarray(rng.normal(size=len(pts)) * 0.3))
    base = np.asarray(scene.rest_position)
    tp = np.stack([base * 1.02, base * 1.04])
    tv = np.zeros_like(tp)
    # padding slots never move (free = 0): target their frozen state so they
    # contribute exactly zero, making single-device and sharded losses equal
    pad = np.ones(ns, bool)
    pad[np.asarray(sop)] = False
    tp[:, pad] = base[pad]
    tv[:, pad] = np.asarray(cfg.initial_velocity, np.float64)
    return cfg, scene, x, jnp.asarray(tp), jnp.asarray(tv)


@pytest.mark.slow
def test_sharded_windows_match_single_device():
    cfg, scene, x, tp, tv = setup()
    m = scene.blocked.n_tiles * scene.blocked.rows

    loss_ref, final_ref, _ = jax.jit(
        lambda xv: rollout(xv, scene, cfg, tp, tv, n_steps=N_STEPS)
    )(x)

    mesh = make_mesh(N_DEV)
    loss_sh, (pos_sh, vel_sh) = jax.jit(
        lambda xv: window_sharded_episode(xv, scene, cfg, tp, tv, mesh,
                                          n_steps=N_STEPS)
    )(x)

    np.testing.assert_allclose(np.asarray(pos_sh),
                               np.asarray(final_ref.position[:m]),
                               rtol=1e-10, atol=1e-13)
    np.testing.assert_allclose(np.asarray(vel_sh),
                               np.asarray(final_ref.velocity[:m]),
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=1e-12)


@pytest.mark.slow
def test_sharded_windows_grad_matches():
    # tiny episode: the interpret-mode fwd+bwd over 8 shards is VERY slow
    cfg, scene, x, tp, tv = setup(n_outer=40, max_buckets=2)
    mesh = make_mesh(N_DEV)
    m = scene.blocked.n_tiles * scene.blocked.rows

    gref = jax.jit(jax.grad(
        lambda xv: loss_fn(xv, scene, cfg, tp, tv, n_steps=3)))(x)
    gsh_m = jax.jit(jax.grad(
        lambda xv: window_sharded_episode(xv, scene, cfg, tp, tv, mesh,
                                          n_steps=3)[0]))(x)
    np.testing.assert_allclose(np.asarray(gsh_m)[:m], np.asarray(gref)[:m],
                               rtol=1e-9, atol=1e-12)
