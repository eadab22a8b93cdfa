"""Optimizer drivers, target generation, grad check, CLI — end-to-end on a tiny
procedural scene (reference workflow parity, sim.py:377-476)."""

import json

import numpy as np
import jax.numpy as jnp
import pytest

from softbody_tpu import build_scene, warp_parity
from softbody_tpu.geometry.shapes import inflatable_sphere, suggest_h
from softbody_tpu.opt import driver

N_STEPS = 20


@pytest.fixture(scope="module")
def tiny():
    pts, out_num = inflatable_sphere(n_outer=48, radius=0.05)
    # clamp the top so the episode deforms (gradients vanish for rigid motion)
    mask = np.ones((len(pts), 3))
    mask[pts[:, 1] > np.percentile(pts[:, 1], 85)] = 0.0
    cfg = warp_parity().replace(
        h=suggest_h(pts, 16), dtype="float64", dt=2e-6, target_frames=4,
        frames=N_STEPS,
    )
    scene = build_scene(pts, cfg, out_num=out_num, dirichlet_mask=mask)
    return pts, cfg, scene


def test_target_generation_roundtrip(tiny, tmp_path):
    pts, cfg, scene = tiny
    rng = np.random.default_rng(0)
    x_true = rng.normal(size=len(pts)) * 0.5
    pos, vel = driver.generate_targets(x_true, scene, cfg, tmp_path / "t")
    assert pos.shape == (4, len(pts), 3)
    tp, tv = driver.load_targets(tmp_path / "t", 4)
    np.testing.assert_array_equal(tp, pos)
    np.testing.assert_array_equal(tv, vel)
    # self-consistency: the generating x gives (near) zero loss on its own targets
    from softbody_tpu.sim.rollout import loss_fn

    l = float(loss_fn(jnp.asarray(x_true), scene, cfg, jnp.asarray(tp), jnp.asarray(tv)))
    assert l < 1e-18


def test_lbfgs_reduces_loss_and_writes_artifacts(tiny, tmp_path):
    pts, cfg, scene = tiny
    rng = np.random.default_rng(1)
    x_true = rng.normal(size=len(pts)) * 0.8
    pos, vel = driver.generate_targets(x_true, scene, cfg, tmp_path / "t")
    x0 = np.zeros(len(pts))
    result, history = driver.optimize_lbfgs(
        scene, cfg, x0, pos, vel, opt_dir=tmp_path / "opt", x_target=x_true,
        maxiter=5, verbose=False, plot=True,
    )
    assert len(history["losses"]) >= 1
    if len(history["losses"]) > 1:
        assert history["losses"][-1] <= history["losses"][0]
    assert (tmp_path / "opt" / "x.npy").exists()
    assert json.load(open(tmp_path / "opt" / "losses.json")) == history["losses"]
    assert (tmp_path / "opt" / "loss.png").exists()


def test_adam_reduces_loss(tiny, tmp_path):
    pts, cfg, scene = tiny
    rng = np.random.default_rng(2)
    x_true = rng.normal(size=len(pts)) * 0.8
    pos, vel = driver.generate_targets(x_true, scene, cfg, tmp_path / "t")
    x_fin, losses = driver.optimize_adam(scene, cfg, np.zeros(len(pts)), pos, vel,
                                         steps=10, learning_rate=0.1)
    assert losses[-1] < losses[0]


def test_grad_check_agreement(tiny, tmp_path):
    pts, cfg, scene = tiny
    rng = np.random.default_rng(3)
    x_true = rng.normal(size=len(pts)) * 0.8
    pos, vel = driver.generate_targets(x_true, scene, cfg, tmp_path / "t")
    rows = driver.grad_check(scene, cfg, np.zeros(len(pts)), [1e-5, 1e-6],
                             pos, vel, verbose=False)
    for delta, ana, num in rows:
        assert abs(ana - num) < 5e-4 * max(abs(ana), abs(num), 1e-12)


def test_cli_set_target_then_optimize(tmp_path):
    from softbody_tpu import cli

    common = ["--name", "tiny", "--procedural", "300", "--frames", "12",
              "--out-dir", str(tmp_path), "--dtype", "float64"]
    cli.main(common + ["--set_target"])
    # 12-frame episode -> target_frames adapts to 12
    assert (tmp_path / "target" / "tiny" / "position_12.npy").exists()
    cli.main(common + ["--maxiter", "2"])
    assert (tmp_path / "opt" / "tiny" / "x.npy").exists()
    cli.main(common + ["--init"])


def test_lbfgs_kill_and_resume(tiny, tmp_path):
    """Interrupted L-BFGS resumes from the checkpoint (VERDICT r4 item 8):
    a run killed at iteration k (simulated by a maxiter=k budget) continues
    from the saved iterate, preloads histories, and spends only the remaining
    budget.  The resumed descent must continue from (not restart above) the
    checkpointed loss."""
    pts, cfg, scene = tiny
    rng = np.random.default_rng(3)
    x_true = rng.normal(size=len(pts)) * 0.8
    pos, vel = driver.generate_targets(x_true, scene, cfg, tmp_path / "t")
    x0 = np.zeros(len(pts))
    ck = tmp_path / "ckpt"

    _, h1 = driver.optimize_lbfgs(
        scene, cfg, x0, pos, vel, x_target=x_true, maxiter=2, verbose=False,
        plot=False, resume_dir=ck)
    assert (ck / "x.npy").exists() and (ck / "history.json").exists()
    meta = json.loads((ck / "meta.json").read_text())
    assert meta["step"] == len(h1["xk"])
    x_saved = np.load(ck / "x.npy")

    # resume with a larger total budget: continues from the saved iterate
    res2, h2 = driver.optimize_lbfgs(
        scene, cfg, x0, pos, vel, x_target=x_true, maxiter=5, verbose=False,
        plot=False, resume_dir=ck, resume=True)
    assert len(h2["losses"]) > len(h1["losses"])          # history preloaded + extended
    assert h2["losses"][: len(h1["losses"])] == h1["losses"]
    assert h2["losses"][-1] <= h1["losses"][-1] * (1 + 1e-12)
    # resumed leg spent only the remaining budget
    assert res2.nit <= 5 - meta["step"]
    # exhausted budget: immediate no-op return with the saved x
    res3, _ = driver.optimize_lbfgs(
        scene, cfg, x0, pos, vel, maxiter=meta["step"], verbose=False,
        plot=False, resume_dir=ck, resume=True)
    assert res3.nit == 0 and "budget" in res3.message
    del x_saved


def test_adam_kill_and_resume_exact(tiny, tmp_path):
    """Adam resume is EXACT: a run checkpointed every 3 steps and resumed
    reproduces the uninterrupted run's iterates (the optax state pytree incl.
    moments round-trips through utils/checkpoint.py)."""
    pts, cfg, scene = tiny
    rng = np.random.default_rng(4)
    x_true = rng.normal(size=len(pts)) * 0.8
    pos, vel = driver.generate_targets(x_true, scene, cfg, tmp_path / "t")
    x0 = np.zeros(len(pts))

    x_ref, l_ref = driver.optimize_adam(scene, cfg, x0, pos, vel, steps=6)

    ck = tmp_path / "ckpt_adam"
    xa, la = driver.optimize_adam(scene, cfg, x0, pos, vel, steps=3,
                                  resume_dir=ck, checkpoint_every=3)
    assert json.loads((ck / "meta.json").read_text())["step"] == 3
    xb, lb = driver.optimize_adam(scene, cfg, x0, pos, vel, steps=6,
                                  resume_dir=ck, resume=True,
                                  checkpoint_every=3)
    np.testing.assert_allclose(np.asarray(xb), np.asarray(x_ref), rtol=1e-12)
    np.testing.assert_allclose(lb, l_ref, rtol=1e-12)
    assert len(lb) == 6 and list(lb[:3]) == list(la)
