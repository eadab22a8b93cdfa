"""Chunked (multi-dispatch) episode value-and-grad must match the
single-dispatch jax.value_and_grad exactly — the chain rule over chunk
boundaries is the same math, split into bounded device programs (the axon
worker kills single dispatches past its wall-clock watchdog; see
sim/rollout.py::episode_value_and_grad_chunked)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from softbody_tpu import build_scene, warp_parity
from softbody_tpu.geometry.shapes import inflatable_sphere, suggest_h
from softbody_tpu.sim.rollout import (
    episode_value_and_grad_chunked,
    forward_chunked,
    rollout,
    value_and_grad_fn,
)

N_STEPS = 24


@pytest.fixture(scope="module")
def tiny():
    pts, out_num = inflatable_sphere(n_outer=48, radius=0.05)
    mask = np.ones((len(pts), 3))
    mask[pts[:, 1] > np.percentile(pts[:, 1], 85)] = 0.0
    cfg = warp_parity().replace(
        h=suggest_h(pts, 16), dtype="float64", dt=2e-6, target_frames=4,
        frames=N_STEPS,
    )
    scene = build_scene(pts, cfg, out_num=out_num, dirichlet_mask=mask)
    rng = np.random.default_rng(3)
    x_true = jnp.asarray(rng.normal(size=len(pts)) * 0.5)
    _, _, rec = jax.jit(
        lambda xv, sc: rollout(xv, sc, cfg, n_steps=N_STEPS,
                               record_every=N_STEPS // 4))(x_true, scene)
    tp, tv = rec
    x0 = jnp.asarray(rng.normal(size=len(pts)) * 0.3)
    return cfg, scene, x0, tp, tv


@pytest.mark.parametrize("n_chunks", [
    4,
    pytest.param(1, marks=pytest.mark.slow),
    pytest.param(5, marks=pytest.mark.slow),  # uneven chunks (24 = 5+5+5+5+4)
])
def test_chunked_vjp_matches_single_dispatch(tiny, n_chunks):
    # n_chunks=5 exercises uneven chunk sizes (24 = 5+5+5+5+4)
    cfg, scene, x0, tp, tv = tiny
    vg = value_and_grad_fn(scene, cfg, n_steps=N_STEPS)
    loss_ref, grad_ref = vg(x0, tp, tv)
    cvg = episode_value_and_grad_chunked(scene, cfg, n_chunks,
                                         n_steps=N_STEPS)
    loss_c, grad_c = cvg(x0, tp, tv)
    # chunk-wise loss summation reassociates the f64 adds (last-ulp drift)
    np.testing.assert_allclose(float(loss_c), float(loss_ref), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(grad_c), np.asarray(grad_ref),
                               rtol=1e-9, atol=1e-12)


def test_forward_chunked_matches_rollout(tiny):
    cfg, scene, x0, tp, tv = tiny
    _, final, rec = jax.jit(
        lambda xv, sc: rollout(xv, sc, cfg, n_steps=N_STEPS,
                               record_every=N_STEPS // 2))(x0, scene)
    state, recorded = forward_chunked(x0, scene, cfg, N_STEPS,
                                      chunk_len=N_STEPS // 4,
                                      record_every=N_STEPS // 2)
    # different program structure -> different XLA fusion/rounding (ulps)
    np.testing.assert_allclose(np.asarray(state.position),
                               np.asarray(final.position),
                               rtol=1e-12, atol=1e-15)
    assert len(recorded) == 2
    np.testing.assert_allclose(np.asarray(recorded[-1]),
                               np.asarray(rec[0][-1]), rtol=1e-12, atol=1e-15)
