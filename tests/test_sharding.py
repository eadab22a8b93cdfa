"""Multi-chip tests on the virtual 8-device CPU mesh (SURVEY.md §4): particle
sharding must be numerically transparent — same loss, same gradient."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from softbody_tpu import warp_parity, build_scene
from softbody_tpu.geometry.shapes import inflatable_sphere, suggest_h
from softbody_tpu.parallel.sharding import (
    make_mesh, pad_scene, pad_targets, pad_x, shard_scene,
)
from softbody_tpu.sim.rollout import loss_fn

N_STEPS = 12


def setup():
    pts, out_num = inflatable_sphere(n_outer=64, radius=0.05)
    cfg = warp_parity().replace(
        h=suggest_h(pts, 16), dtype="float64", dt=1e-6, target_frames=2
    )
    scene = build_scene(pts, cfg, out_num=out_num)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=len(pts)) * 0.3)
    tp = jnp.asarray(np.stack([pts * 1.1, pts * 1.2]))
    tv = jnp.zeros_like(tp)
    return pts, cfg, scene, x, tp, tv


def test_eight_devices_available():
    assert jax.device_count() >= 8


def test_padding_is_loss_transparent():
    pts, cfg, scene, x, tp, tv = setup()
    l0 = float(loss_fn(x, scene, cfg, tp, tv, n_steps=N_STEPS))
    padded, n0 = pad_scene(scene, 8, cfg)
    assert padded.rest_position.shape[0] % 8 == 0
    tp_p, tv_p = pad_targets(tp, tv, padded, n0, cfg)
    x_p = pad_x(x, padded, n0)
    l1 = float(loss_fn(x_p, padded, cfg, tp_p, tv_p, n_steps=N_STEPS))
    np.testing.assert_allclose(l1, l0, rtol=1e-12)


@pytest.mark.slow
def test_sharded_matches_single_device():
    pts, cfg, scene, x, tp, tv = setup()

    def f(xv, sc, tpv, tvv):
        return loss_fn(xv, sc, cfg, tpv, tvv, n_steps=N_STEPS)

    l_ref, g_ref = jax.value_and_grad(f)(x, scene, tp, tv)

    mesh = make_mesh(8)
    padded, n0 = pad_scene(scene, 8, cfg)
    sharded = shard_scene(padded, mesh)
    tp_p, tv_p = pad_targets(tp, tv, padded, n0, cfg)
    x_p = jax.device_put(
        pad_x(x, padded, n0),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("p")),
    )
    l_sh, g_sh = jax.jit(jax.value_and_grad(f))(x_p, sharded, tp_p, tv_p)

    np.testing.assert_allclose(float(l_sh), float(l_ref), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(g_sh)[: len(pts)], np.asarray(g_ref), rtol=1e-8, atol=1e-12)
    # pad gradient must be exactly zero (inert particles)
    np.testing.assert_allclose(np.asarray(g_sh)[len(pts):], 0.0, atol=1e-14)


@pytest.mark.slow  # ~280 s; the driver runs dryrun_multichip itself every round
def test_graft_entry_dryrun():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert all(np.isfinite(np.asarray(leaf)).all() for leaf in jax.tree.leaves(out))
    ge.dryrun_multichip(8)
