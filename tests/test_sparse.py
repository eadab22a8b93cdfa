"""Sparse candidate-group layout (topology/sparse.py, sim/sparse.py).

Parity oracle: the dense blocked XLA backend (ops/blocked.py), itself validated
against the O(N^2) f64 oracle in test_blocked.py.  All runs f64 on CPU with
interpret-mode Pallas.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from softbody_tpu import warp_parity, taichi_parity
from softbody_tpu.geometry.shapes import inflatable_sphere, suggest_h
from softbody_tpu.ops.elasticity import compute_ratio
from softbody_tpu.sim.blocked import build_blocked_scene, elastic_forces_blocked
from softbody_tpu.sim.rollout import rollout
from softbody_tpu.sim.sparse import build_sparse_scene, elastic_forces_sparse
from softbody_tpu.topology.sparse import (
    _bucket_boundaries, build_sparse_layout, validate_sparse_layout,
)


@pytest.fixture(scope="module")
def body():
    pts, out_num = inflatable_sphere(n_outer=200)
    return pts, out_num, suggest_h(pts, 32)


def test_layout_coverage_and_waste(body):
    pts, _, h = body
    lay = build_sparse_layout(pts, 2 * h, rows=32)
    stats = validate_sparse_layout(lay, pts, 2 * h)  # raises on a missed pair
    assert stats["waste"] < 40.0  # small bodies pad more; 100k measures ~9x
    assert lay.stats["n_buckets"] <= 8
    # tiles partition the slot prefix; every particle has a slot
    assert lay.n_slots % 8 == 0
    assert (lay.particle_of_slot[lay.slot_of_particle] == np.arange(len(pts))).all()


def test_bucket_dp_optimal_small():
    sizes = np.array([8, 16, 40, 48])
    counts = np.array([10, 10, 10, 10])
    caps = _bucket_boundaries(sizes, counts, 2)
    # optimal 2-bucket split: [8,16] capped 16 and [40,48] capped 48
    assert caps == [16, 48]


@pytest.mark.parametrize("mode", ["i", "j"])
def test_forces_match_blocked(body, mode):
    pts, out_num, h = body
    cfg = warp_parity().replace(h=h, dtype="float64", dt=1e-6,
                                pair_def_grad=mode, backend="blocked")
    cfg_p = cfg.replace(backend="pallas")
    sc_b, sop_b = build_blocked_scene(pts, cfg, out_num=out_num)
    sc_s, sop_s = build_sparse_scene(pts, cfg_p, out_num=out_num)
    rng = np.random.default_rng(0)
    dp = rng.normal(scale=1e-3 * h, size=(len(pts), 3))
    pos_b = np.asarray(sc_b.rest_position).copy()
    pos_b[np.asarray(sop_b)] += dp
    pos_s = np.asarray(sc_s.rest_position).copy()
    pos_s[np.asarray(sop_s)] += dp
    xb = jnp.zeros(sc_b.rest_position.shape[0], cfg.dtype)
    xs = jnp.zeros(sc_s.rest_position.shape[0], cfg.dtype)
    fb = elastic_forces_blocked(jnp.asarray(pos_b), compute_ratio(xb, cfg),
                                sc_b.materials, sc_b, cfg)
    fs = elastic_forces_sparse(jnp.asarray(pos_s), compute_ratio(xs, cfg_p),
                               sc_s.materials, sc_s, cfg_p)
    fb = np.asarray(fb)[np.asarray(sop_b)]
    fs = np.asarray(fs)[np.asarray(sop_s)]
    err = np.abs(fb - fs).max() / np.abs(fb).max()
    assert err < 1e-11, err


@pytest.mark.parametrize("mode", ["i", "j"])
@pytest.mark.slow
def test_force_vjp_matches_blocked(body, mode):
    """Backward parity: VJP of the elastic forces wrt (positions, ratio-field
    x) against the autodiff'd dense blocked path, with a random cotangent."""
    pts, out_num, h = body
    cfg = warp_parity().replace(h=h, dtype="float64", dt=1e-6,
                                pair_def_grad=mode, backend="blocked")
    cfg_p = cfg.replace(backend="pallas")
    sc_b, sop_b = build_blocked_scene(pts, cfg, out_num=out_num)
    sc_s, sop_s = build_sparse_scene(pts, cfg_p, out_num=out_num)
    sop_b = np.asarray(sop_b)
    sop_s = np.asarray(sop_s)
    rng = np.random.default_rng(1)
    dp = rng.normal(scale=1e-3 * h, size=(len(pts), 3))
    x_p = rng.normal(scale=0.5, size=len(pts))
    ct = rng.normal(size=(len(pts), 3))

    def prep(scene, sop):
        ns = scene.rest_position.shape[0]
        pos = np.asarray(scene.rest_position).copy()
        pos[sop] += dp
        x = np.zeros(ns)
        x[sop] = x_p
        c = np.zeros((ns, 3))
        c[sop] = ct
        return jnp.asarray(pos), jnp.asarray(x), jnp.asarray(c)

    def vjp_of(fn, scene, sop, cfg_k):
        pos, x, c = prep(scene, sop)

        def f(p, xv):
            return fn(p, compute_ratio(xv, cfg_k), scene.materials, scene, cfg_k)

        out, vjp = jax.vjp(f, pos, x)
        dpos, dx = vjp(c)
        return np.asarray(dpos)[sop], np.asarray(dx)[sop]

    dpos_b, dx_b = vjp_of(elastic_forces_blocked, sc_b, sop_b, cfg)
    dpos_s, dx_s = vjp_of(elastic_forces_sparse, sc_s, sop_s, cfg_p)
    ep = np.abs(dpos_b - dpos_s).max() / np.abs(dpos_b).max()
    ex = np.abs(dx_b - dx_s).max() / max(np.abs(dx_b).max(), 1e-30)
    assert ep < 1e-11, ep
    assert ex < 1e-11, ex


def test_taichi_preset_matches(body):
    pts, out_num, h = body
    cfg = taichi_parity().replace(h=h, dtype="float64", dt=1e-6,
                                  backend="blocked")
    cfg_p = cfg.replace(backend="pallas")
    sc_b, sop_b = build_blocked_scene(pts, cfg, out_num=out_num)
    sc_s, sop_s = build_sparse_scene(pts, cfg_p, out_num=out_num)
    xb = jnp.zeros(sc_b.rest_position.shape[0], cfg.dtype)
    xs = jnp.zeros(sc_s.rest_position.shape[0], cfg.dtype)
    _, fin_b, _ = rollout(xb, sc_b, cfg, n_steps=2)
    _, fin_s, _ = rollout(xs, sc_s, cfg_p, n_steps=2)
    pb = np.asarray(fin_b.position)[np.asarray(sop_b)]
    ps = np.asarray(fin_s.position)[np.asarray(sop_s)]
    assert np.abs(pb - ps).max() < 1e-12


@pytest.mark.slow  # guards the OPT-IN bf16 forward mode (~60 s)
def test_bf16_pair_dtype_drift():
    """cfg.pair_dtype='bfloat16' (K2 pair products + S|R slab in bf16, f32
    accumulation) must track the f32 path to ~bf16 resolution: forces within
    ~1% relative and a short trajectory within 1e-2 * |displacement|."""
    import jax.numpy as jnp
    from softbody_tpu import rollout, warp_parity
    from softbody_tpu.geometry.shapes import inflatable_sphere, suggest_h
    from softbody_tpu.sim.sparse import build_sparse_scene

    pts, out_num = inflatable_sphere(n_outer=120, radius=0.05)
    cfg = warp_parity().replace(
        h=suggest_h(pts, 16), dtype="float32", dt=1e-6, target_frames=2,
        backend="pallas",
    )
    scene, sop = build_sparse_scene(pts, cfg, out_num=out_num)
    x = jnp.zeros(scene.blocked.n_slots, jnp.float32)
    _, fin32, _ = rollout(x, scene, cfg, n_steps=30)
    cfg16 = cfg.replace(pair_dtype="bfloat16")
    _, fin16, _ = rollout(x, scene, cfg16, n_steps=30)
    disp = np.abs(np.asarray(fin32.position) - np.asarray(scene.rest_position))
    err = np.abs(np.asarray(fin16.position) - np.asarray(fin32.position))
    assert err.max() <= max(1e-2 * disp.max(), 1e-7), (err.max(), disp.max())


def test_host_rowsums_match_kernel(body):
    """The host-side f64 rs6 (rest_density_and_corr rowsums=True) must match
    the device ones-RHS moments computation it replaced (_static_rowsums)."""
    from softbody_tpu.sim.sparse import _static_rowsums

    pts, out_num, h = body
    cfg = warp_parity().replace(h=h, dtype="float64", dt=1e-6, backend="pallas")
    sc, sop = build_sparse_scene(pts, cfg, out_num=out_num)
    sb = sc.blocked
    dev = np.asarray(_static_rowsums(sb.buckets, sb.n_tiles * sb.rows,
                                     sb.n_slots, cfg, cfg.dtype))
    host = np.asarray(sb.rs6)
    scale = np.abs(dev).max()
    assert np.abs(dev - host).max() < 1e-9 * max(scale, 1.0), (
        np.abs(dev - host).max(), scale)


def test_group16_layout_and_forces_match_group8(body):
    """The 16-slot packed-row layout (group=16: 128-float pos gather rows at
    DMA bandwidth, ~+14% candidate pairs) must cover every true pair and
    produce bitwise-identical forces to group=8 (padding slots are inert;
    the kernels are group-agnostic — pairs only ever enter via the slab)."""
    pts, out_num, h = body
    lay16 = build_sparse_layout(pts, 2 * h, rows=32, group=16)
    validate_sparse_layout(lay16, pts, 2 * h)     # raises on a missed pair
    assert lay16.n_slots % 16 == 0

    cfg = warp_parity().replace(h=h, dtype="float32", backend="pallas")
    rng = np.random.default_rng(5)
    x = rng.normal(size=len(pts)) * 0.3
    pert = rng.normal(size=(len(pts), 3)) * 0.001
    res = {}
    for g in (8, 16):
        scene, sop = build_sparse_scene(pts, cfg, out_num=out_num, rows=32,
                                        group=g)
        ns = scene.blocked.n_slots
        assert scene.blocked.group == g
        xs = np.zeros(ns)
        xs[sop] = x
        ratio = compute_ratio(jnp.asarray(xs, "float32"), cfg)
        posn = np.array(scene.rest_position)
        posn[np.asarray(sop)] += pert
        f = elastic_forces_sparse(
            jnp.asarray(posn, "float32"), ratio, scene.materials, scene, cfg,
            interpret=True)
        res[g] = np.asarray(f)[np.asarray(sop)]
    np.testing.assert_array_equal(res[8], res[16])


def test_group16_episode_grad_matches_group8(body):
    """The VJP path must be group-size-generic too: the v4 scatter
    accumulators size their packed-row width from the layout group (group 8
    -> 64/128-float rows, group 16 -> 128/256) — a hardcoded 8-group width
    crashed the round-5 group=16 gradient bench.  Episode loss grads must
    match between groups (same math, different padding-slot partitioning;
    inert slots contribute exact zeros)."""
    pts, out_num, h = body
    cfg = warp_parity().replace(h=h, dtype="float32", backend="pallas",
                                dt=1e-6, target_frames=2)
    rng = np.random.default_rng(7)
    x = rng.normal(size=len(pts)) * 0.3
    res = {}
    for g in (8, 16):
        scene, sop = build_sparse_scene(pts, cfg, out_num=out_num, rows=32,
                                        group=g)
        ns = scene.blocked.n_slots
        xs = np.zeros(ns, np.float32)
        xs[sop] = x
        # perturb only PARTICLE slots: padding slots never move, and their
        # (layout-dependent) far-grid positions must contribute exact zeros
        base = np.asarray(scene.rest_position)
        t1, t2 = base.copy(), base.copy()
        t1[np.asarray(sop)] *= 1.001
        t2[np.asarray(sop)] *= 1.002
        tp = jnp.asarray(np.stack([t1, t2]), jnp.float32)
        # padding slots keep the broadcast initial velocity forever (free=0);
        # recorded targets would match it exactly, so the parity targets must
        # too (tv=0 would count layout-dependent padding into the v-loss)
        tv = jnp.broadcast_to(
            jnp.asarray(cfg.initial_velocity, jnp.float32), tp.shape)

        def loss(q):
            l, _, _ = rollout(q, scene, cfg, tp, tv, n_steps=3)
            return l

        val, grad = jax.value_and_grad(loss)(jnp.asarray(xs))
        res[g] = (float(val), np.asarray(grad)[np.asarray(sop)])
    assert np.isfinite(res[8][0]) and res[8][0] > 0
    np.testing.assert_allclose(res[8][0], res[16][0], rtol=1e-6)
    np.testing.assert_allclose(res[8][1], res[16][1], rtol=1e-4, atol=1e-12)


def test_group16_spmd_rejected():
    """parallel/sparse_shard.py assumes 8-slot packed rows; a 16-group SPMD
    scene must be rejected with a typed error, not silently mis-packed."""
    pts, out_num = inflatable_sphere(n_outer=64)
    cfg = warp_parity().replace(h=suggest_h(pts, 16), dtype="float32",
                                backend="pallas")
    with pytest.raises(ValueError, match="group=8"):
        build_sparse_scene(pts, cfg, out_num=out_num, rows=16, group=16,
                           n_shards=2)
