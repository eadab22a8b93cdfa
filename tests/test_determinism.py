"""Bitwise reproducibility (SURVEY.md §5): the reference relies on CUDA atomics
(non-deterministic reduction order); the TPU design uses dense deterministic
reductions — identical inputs must give bit-identical trajectories and
gradients, run to run."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from softbody_tpu import build_scene, rollout, warp_parity
from softbody_tpu.geometry.shapes import inflatable_sphere, suggest_h
from softbody_tpu.sim.rollout import loss_fn


@pytest.mark.slow
def test_bitwise_reproducible_rollout_and_grad():
    pts, out_num = inflatable_sphere(n_outer=64, radius=0.05)
    mask = np.ones((len(pts), 3))
    mask[pts[:, 1] > np.percentile(pts[:, 1], 85)] = 0.0
    cfg = warp_parity().replace(
        h=suggest_h(pts, 14), dtype="float64", dt=2e-6, target_frames=2
    )
    scene = build_scene(pts, cfg, out_num=out_num, dirichlet_mask=mask)
    x = jnp.asarray(np.random.default_rng(0).normal(size=len(pts)) * 0.3)
    tp = jnp.asarray(np.stack([pts * 1.1, pts * 1.2]))
    tv = jnp.zeros_like(tp)

    runs = []
    for _ in range(2):
        _, final, _ = rollout(x, scene, cfg, n_steps=25)
        g = jax.grad(lambda q: loss_fn(q, scene, cfg, tp, tv, n_steps=25))(x)
        runs.append((np.asarray(final.position), np.asarray(g)))
    # bit-identical, not just close
    assert np.array_equal(runs[0][0], runs[1][0])
    assert np.array_equal(runs[0][1], runs[1][1])
