"""Halo-exchange plan + shard_map ppermute correctness on the 8-device CPU mesh:
an arbitrary neighbor gather-reduce through the halo path must equal the dense
computation."""

import numpy as np
import jax
import jax.numpy as jnp

from softbody_tpu import warp_parity, build_scene
from softbody_tpu.geometry.shapes import inflatable_sphere, suggest_h
from softbody_tpu.parallel.halo import build_halo_plan, halo_gather
from softbody_tpu.parallel.sharding import make_mesh, particle_sharding
from softbody_tpu.topology.sort import morton_sort

D = 8


def make_sorted_scene():
    pts, out_num = inflatable_sphere(n_outer=96, radius=0.05)
    # pad to a multiple of D by dropping the tail (fine for a test body)
    pts = pts[: len(pts) - (len(pts) % D)]
    cfg = warp_parity().replace(h=suggest_h(pts, 14), dtype="float64")
    perm = morton_sort(pts, 2 * cfg.h)
    pts = pts[perm]
    scene = build_scene(pts, cfg)
    return pts, cfg, scene


def test_halo_plan_structure():
    pts, cfg, scene = make_sorted_scene()
    idx = np.asarray(scene.topology.idx)
    plan = build_halo_plan(idx, D)
    assert plan.shard * D == len(pts)
    # Morton-sorted small body: halos must not need every shard
    assert plan.hops < D - 1
    # remapped indices stay within the local+halo address space
    assert int(np.max(np.asarray(plan.local_idx))) < plan.ext


def test_halo_gather_matches_dense():
    pts, cfg, scene = make_sorted_scene()
    idx = np.asarray(scene.topology.idx)
    mask = np.asarray(scene.topology.mask)
    plan = build_halo_plan(idx, D)
    mesh = make_mesh(D)

    rng = np.random.default_rng(0)
    values = jnp.asarray(rng.normal(size=(len(pts), 3)))
    weights = jnp.asarray(rng.normal(size=idx.shape) * mask)   # (N, K)

    # dense reference: y[i] = sum_k w[i,k] * values[idx[i,k]]
    dense = jnp.einsum("ik,ikf->if", weights, values[idx])

    values_sh = jax.device_put(values, particle_sharding(mesh, 2))
    w_np = np.asarray(weights).reshape(D, plan.shard, idx.shape[1])
    w_dev = jnp.asarray(w_np)

    def fn(ext, local_idx):
        d = jax.lax.axis_index("p")
        w = w_dev[d]
        return jnp.einsum("ik,ikf->if", w, jnp.take(ext, local_idx, axis=0))

    out = halo_gather(values_sh, plan, mesh, fn)
    np.testing.assert_allclose(np.asarray(out), np.asarray(dense), atol=1e-12)


def test_halo_traffic_smaller_than_allgather():
    # traffic advantage appears once shards are larger than halo rings
    pts, _ = inflatable_sphere(n_outer=2000, radius=0.05)
    pts = pts[: len(pts) - (len(pts) % D)]
    cfg = warp_parity().replace(h=suggest_h(pts, 14), dtype="float64")
    pts = pts[morton_sort(pts, 2 * cfg.h)]
    scene = build_scene(pts, cfg)
    plan = build_halo_plan(np.asarray(scene.topology.idx), D)
    halo_rows = 2 * plan.hops * plan.halo
    assert halo_rows < len(pts), (
        f"halo {halo_rows} rows should beat all-gather of {len(pts)}"
    )


import pytest
from softbody_tpu import taichi_parity
from softbody_tpu.ops.elasticity import compute_ratio, elastic_forces
from softbody_tpu.parallel.halo import elastic_forces_halo


@pytest.mark.parametrize("preset", [warp_parity, taichi_parity])
@pytest.mark.slow
def test_halo_elastic_forces_match_dense(preset):
    pts, _ = inflatable_sphere(n_outer=96, radius=0.05)
    pts = pts[: len(pts) - (len(pts) % D)]
    cfg = preset().replace(h=suggest_h(pts, 14), dtype="float64")
    perm = morton_sort(pts, 2 * cfg.h)
    pts = pts[perm]
    scene = build_scene(pts, cfg)

    rng = np.random.default_rng(3)
    F = np.eye(3) + 0.05 * rng.normal(size=(3, 3))
    pos = (pts - pts.mean(0)) @ F.T + pts.mean(0)
    x = rng.normal(size=len(pts)) * 0.4
    ratio = compute_ratio(jnp.asarray(x), cfg)

    f_dense, _ = elastic_forces(
        jnp.asarray(pos), ratio, scene.materials, scene.topology, cfg
    )

    plan = build_halo_plan(np.asarray(scene.topology.idx), D)
    mesh = make_mesh(D)
    pos_sh = jax.device_put(jnp.asarray(pos), particle_sharding(mesh, 2))
    ratio_sh = jax.device_put(ratio, particle_sharding(mesh, 1))
    f_halo = elastic_forces_halo(pos_sh, ratio_sh, scene, plan, mesh, cfg)

    scale = np.abs(np.asarray(f_dense)).max()
    np.testing.assert_allclose(
        np.asarray(f_halo), np.asarray(f_dense), atol=1e-9 * scale
    )


@pytest.mark.slow
def test_halo_rollout_matches_dense():
    from softbody_tpu.parallel.halo import halo_rollout
    from softbody_tpu import rollout as dense_rollout

    pts, _ = inflatable_sphere(n_outer=96, radius=0.05)
    pts = pts[: len(pts) - (len(pts) % D)]
    cfg = warp_parity().replace(
        h=suggest_h(pts, 14), dtype="float64", dt=1e-6, target_frames=2,
        initial_velocity=(0.0, -0.4, 0.0), external_force=(0.0, -1e-3, 0.0),
    )
    pts = pts[morton_sort(pts, 2 * cfg.h)]
    scene = build_scene(pts, cfg)
    plan = build_halo_plan(np.asarray(scene.topology.idx), D)
    mesh = make_mesh(D)

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=len(pts)) * 0.3)
    tp = jnp.asarray(np.stack([pts * 1.1, pts * 1.2]))
    tv = jnp.zeros_like(tp)

    from softbody_tpu.sim.rollout import loss_fn
    l_ref = float(loss_fn(x, scene, cfg, tp, tv, n_steps=10))
    _, fin_ref, _ = dense_rollout(x, scene, cfg, n_steps=10)

    x_sh = jax.device_put(x, particle_sharding(mesh, 1))
    l_halo, fin_halo = jax.jit(
        lambda q: halo_rollout(q, scene, plan, mesh, cfg, tp, tv, n_steps=10)
    )(x_sh)

    np.testing.assert_allclose(float(l_halo), l_ref, rtol=1e-9)
    np.testing.assert_allclose(
        np.asarray(fin_halo.position), np.asarray(fin_ref.position), atol=1e-12
    )
