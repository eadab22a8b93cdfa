"""Window-DMA (v6) backend parity: forces, rollout, and gradients match the
sparse pallas path (itself oracle-verified) in particle space."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from softbody_tpu import warp_parity
from softbody_tpu.geometry.shapes import inflatable_sphere, suggest_h


@pytest.fixture(scope="module")
def small_body():
    pts, out_num = inflatable_sphere(n_outer=220, radius=0.05)
    return pts, out_num


def _cfg(pts):
    return warp_parity().replace(
        h=suggest_h(pts, 24),
        dtype="float32",
        dt=1e-6,
        max_neighbors=48,
        target_frames=2,
        backend="pallas",
        pair_def_grad="i",
    )


def _scenes(pts, out_num, cfg):
    from softbody_tpu.sim.sparse import build_sparse_scene
    from softbody_tpu.sim.windows import build_window_scene

    ssc, ssop = build_sparse_scene(pts, cfg, out_num=out_num, rows=32)
    wsc, wsop = build_window_scene(pts, cfg, out_num=out_num, rows=32)
    return (ssc, ssop), (wsc, wsop)


def test_window_layout_valid(small_body):
    from softbody_tpu.topology.windows import (build_window_layout,
                                               validate_window_layout)

    pts, _ = small_body
    h = suggest_h(pts, 24)
    lay = build_window_layout(pts, 2 * h, rows=32)
    v = validate_window_layout(lay, pts, 2 * h)
    assert v["true_pairs"] > 0
    for b in lay.buckets:
        assert (np.diff(b.tile_ids) == 1).all()


def test_window_forces_match_sparse(small_body):
    from softbody_tpu.sim.sparse import elastic_forces_sparse
    from softbody_tpu.sim.windows import elastic_forces_windows

    pts, out_num = small_body
    cfg = _cfg(pts)
    (ssc, ssop), (wsc, wsop) = _scenes(pts, out_num, cfg)
    n = len(pts)
    rng = np.random.default_rng(0)
    disp = rng.normal(scale=0.1 * cfg.h, size=(n, 3))

    def forces(scene, sop, elastic):
        pos = np.asarray(scene.rest_position).copy()
        pos[sop] = pts + disp
        x = jnp.zeros(scene.blocked.n_slots, cfg.dtype)
        from softbody_tpu.ops.elasticity import compute_ratio

        ratio = compute_ratio(x, cfg)
        f = elastic(jnp.asarray(pos, cfg.dtype), ratio,
                    scene.materials, scene, cfg)
        return np.asarray(f)[sop]

    f_s = forces(ssc, ssop, elastic_forces_sparse)
    f_w = forces(wsc, wsop, elastic_forces_windows)
    scale = np.abs(f_s).max()
    assert scale > 0
    np.testing.assert_allclose(f_w, f_s, atol=2e-5 * scale, rtol=2e-4)


@pytest.mark.slow
def test_window_rollout_and_grad_match_sparse():
    """f64 (interpret kernels): rollout loss + dL/dx parity vs sparse, and a
    central-difference check of the window path itself.

    The top half is Dirichlet-clamped so the v0 drift SHEARS the body —
    without deformation F stays I, stresses stay 0, and dL/dx is pure
    rounding noise (~1e-29 measured) that cannot be compared across
    layouts."""
    from softbody_tpu.sim.rollout import loss_fn
    from softbody_tpu.sim.sparse import build_sparse_scene
    from softbody_tpu.sim.windows import build_window_scene

    pts, out_num = inflatable_sphere(n_outer=120, radius=0.05)
    cfg = warp_parity().replace(
        h=suggest_h(pts, 24), dtype="float64", dt=2e-6, max_neighbors=48,
        target_frames=2, backend="pallas", pair_def_grad="i")
    mask = np.ones((len(pts), 3))
    mask[pts[:, 1] > np.median(pts[:, 1])] = 0.0
    ssc, ssop = build_sparse_scene(pts, cfg, out_num=out_num, rows=32,
                                   dirichlet_mask=mask)
    wsc, wsop = build_window_scene(pts, cfg, out_num=out_num, rows=32,
                                   dirichlet_mask=mask)
    rng = np.random.default_rng(1)
    xp = rng.normal(scale=0.5, size=len(pts))
    n_steps = 20

    def setup(scene, sop):
        ns = scene.blocked.n_slots
        pos0 = np.asarray(scene.rest_position)
        tps = np.stack([pos0, pos0])
        # padding slots AND clamped particles keep their initial velocity
        # forever (free mask = 0); target it exactly so their loss term is
        # zero in BOTH scenes (the layouts differ in padding counts)
        tv0 = np.zeros(pos0.shape)
        frozen = np.ones(ns, bool)
        frozen[sop] = mask[:, 1] == 0.0
        tv0[frozen] = np.asarray(cfg.initial_velocity)
        tvs = np.stack([tv0, tv0])
        x = np.zeros(ns)
        x[sop] = xp

        def f(xv):
            return loss_fn(xv, scene, cfg, jnp.asarray(tps), jnp.asarray(tvs),
                           n_steps=n_steps)

        return jnp.asarray(x), f

    x_s, f_s = setup(ssc, ssop)
    x_w, f_w = setup(wsc, wsop)
    v_s, g_s = jax.value_and_grad(f_s)(x_s)
    v_w, g_w = jax.value_and_grad(f_w)(x_w)
    g_s = np.asarray(g_s)[ssop]
    g_w = np.asarray(g_w)[wsop]

    np.testing.assert_allclose(float(v_w), float(v_s), rtol=1e-10)
    scale = np.abs(g_s).max()
    assert scale > 1e-8, "degenerate test: gradient numerically zero"
    np.testing.assert_allclose(g_w, g_s, atol=1e-9 * scale, rtol=1e-6)

    # finite-difference directional check on the WINDOW path itself
    d = rng.normal(size=g_w.shape)
    d_full = np.zeros(x_w.shape)
    d_full[np.asarray(wsop)] = d
    eps = 1e-4
    lp = float(f_w(x_w + eps * jnp.asarray(d_full)))
    lm = float(f_w(x_w - eps * jnp.asarray(d_full)))
    fd = (lp - lm) / (2 * eps)
    an = float(np.dot(g_w.ravel(), d.ravel()))
    assert abs(fd - an) <= 1e-4 * max(abs(fd), abs(an), 1e-300), (fd, an)
