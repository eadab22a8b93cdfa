"""Inverse-design optimization drivers.

Parity surface (sim.py:377-461):
* scipy L-BFGS-B outer loop over the jit'd episode value-and-grad, with
  per-iteration artifacts — opt/{name}/x.npy, distances.json, losses.json and
  matplotlib convergence plots;
* target generation (--set_target): forward rollout dumping
  target/{name}/position_i.npy + velocity_i.npy for i = 1..target_frames
  (sim.py:363-369);
* analytic-vs-central-finite-difference gradient check (sim.py:418-436).

Plus a TPU-native improvement the reference lacks: an optax Adam path whose
update step stays on device.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

from ..config import SimConfig
from ..core.types import Scene
from ..ops.elasticity import compute_ratio
from ..sim.rollout import loss_fn, rollout
from ..utils.io import create_folder


def generate_targets(x, scene: Scene, cfg: SimConfig, out_dir, n_steps=None,
                     particle_index=None):
    """Forward episode; dump sampled frames in reference layout (sim.py:363-369).

    Frame i (1-based) is the state after ``interval * i`` steps.
    ``particle_index``: for slot-space scenes (blocked backend), the
    slot_of_particle map — saved targets are always PARTICLE-space, matching
    the reference file format.
    Returns (positions (target_frames, N, 3), velocities)."""
    n_steps = cfg.frames if n_steps is None else n_steps
    if n_steps % cfg.target_frames != 0:
        raise ValueError(
            f"frames={n_steps} must be a multiple of target_frames={cfg.target_frames}"
        )
    interval = n_steps // cfg.target_frames
    _, _, rec = rollout(jnp.asarray(x, cfg.dtype), scene, cfg,
                        n_steps=n_steps, record_every=interval)
    pos, vel = np.asarray(rec[0]), np.asarray(rec[1])
    if particle_index is not None:
        pos = pos[:, np.asarray(particle_index)]
        vel = vel[:, np.asarray(particle_index)]
    out = Path(out_dir)
    create_folder(out, exist_ok=True)
    for i in range(cfg.target_frames):
        np.save(out / f"position_{i + 1}.npy", pos[i])
        np.save(out / f"velocity_{i + 1}.npy", vel[i])
    return pos, vel


def load_targets(target_dir, target_frames: int):
    """Load target/{name}/*.npy (sim.py:116-121)."""
    d = Path(target_dir)
    pos = np.stack([np.load(d / f"position_{i}.npy") for i in range(1, target_frames + 1)])
    vel = np.stack([np.load(d / f"velocity_{i}.npy") for i in range(1, target_frames + 1)])
    return pos, vel


def ratio_distance(x_opt, x_target, cfg: SimConfig) -> float:
    """||ratio(x) - ratio(x*)||_2 — the callback's convergence metric
    (sim.py:408-410)."""
    r_opt = np.asarray(compute_ratio(jnp.asarray(x_opt), cfg))
    r_tgt = np.asarray(compute_ratio(jnp.asarray(x_target), cfg))
    return float(np.linalg.norm(r_opt - r_tgt))


def optimize_lbfgs(
    scene: Scene,
    cfg: SimConfig,
    x0: np.ndarray,
    target_p,
    target_v,
    opt_dir=None,
    x_target=None,
    maxiter: int = 1000,
    n_steps=None,
    verbose: bool = True,
    plot: bool = True,
    on_eval=None,
    eval_chunks: int = 0,
    resume_dir=None,
    resume: bool = False,
):
    """scipy L-BFGS-B over the jit'd value_and_grad (sim.py:449-461 parity:
    maxiter/ftol/gtol, per-iteration x.npy + losses/distances json + plots).

    ``on_eval(x_opt)``: called after every loss evaluation with the current
    iterate — the hook point for the reference's render-inside-loss behavior
    (sim.py:385-395, --render renders the CURRENT trajectory every eval).

    ``resume_dir``: checkpoint directory (utils/checkpoint.py).  Every
    iteration saves (x, iteration count, loss/distance histories) there; with
    ``resume=True`` and an existing checkpoint, the run restarts from the
    saved iterate, preloads the histories, and spends only the REMAINING
    iteration budget (maxiter counts total iterations across restarts).
    scipy's L-BFGS-B keeps its curvature memory in Fortran workspace that
    cannot be serialized, so a resumed run rebuilds the m-pair history over
    its first few iterations — the iterate path differs from an uninterrupted
    run, but both descend the same objective from the same point.  The
    1000-iteration reference budget (sim.py:454) is hours at 100k particles;
    on watchdog-prone workers resume is what makes it survivable.

    Returns (result, history dict)."""
    import scipy.optimize

    from ..utils import checkpoint as ckpt

    tp = jnp.asarray(target_p, cfg.dtype)
    tv = jnp.asarray(target_v, cfg.dtype)
    # targets ride as jit ARGUMENTS: closed-over arrays embed as HLO literal
    # constants, and at reference scale (100 frames x n_slots x 3 x 2 arrays
    # ~ 290 MB) the serialized module breaks compile transports
    if eval_chunks and eval_chunks > 1:
        # split each episode's fwd+bwd into bounded device programs — the
        # axon worker's wall-clock watchdog kills single dispatches past
        # ~60 s, which a 3000-step fwd+bwd at 100k particles exceeds
        # (sim/rollout.py::episode_value_and_grad_chunked)
        from ..sim.rollout import episode_value_and_grad_chunked

        cvg = episode_value_and_grad_chunked(scene, cfg, eval_chunks, n_steps)
        vg = lambda q, sc, tp_, tv_: cvg(q, tp_, tv_)
    else:
        # compensated loss pair -> host f64: scipy's f64 line search must see
        # reductions below the f32 quantum of the total (the inverse100k
        # stall: bit-identical f32 evals read as zero reduction)
        from ..sim.rollout import rollout as _rollout

        def _floss(q, sc, tp_, tv_):
            (hi, lo), _, _ = _rollout(q, sc, cfg, tp_, tv_, n_steps=n_steps,
                                      acc_pair=True)
            return hi, lo

        jvg = jax.jit(jax.value_and_grad(_floss, has_aux=True))

        def vg(q, sc, tp_, tv_):
            (hi, lo), grad = jvg(q, sc, tp_, tv_)
            return float(hi) + float(lo), grad

    history = {"losses": [], "distances": [], "xk": []}
    state = {"last_loss": 0.0, "last_grad": np.zeros_like(x0)}
    if opt_dir is not None:
        create_folder(opt_dir, exist_ok=True)

    iters_done = 0
    if resume_dir is not None and resume and (Path(resume_dir) / "x.npy").exists():
        saved = ckpt.load_opt_state(resume_dir)
        x0 = saved["x"]
        iters_done = int(saved["meta"].get("step") or 0)
        hist_file = Path(resume_dir) / "history.json"
        if hist_file.exists():
            h = json.loads(hist_file.read_text())
            history["losses"] = list(h.get("losses", []))
            history["distances"] = list(h.get("distances", []))
        if verbose:
            print(f"resuming from {resume_dir}: iteration {iters_done}, "
                  f"{len(history['losses'])} logged losses")
    if maxiter - iters_done <= 0:
        res = type("R", (), {"x": np.asarray(x0, np.float64), "nit": 0,
                             "nfev": 0, "message": "resume: budget exhausted"})
        return res, history

    def loss(x_opt):
        t0 = time.perf_counter()
        val, grad = vg(jnp.asarray(x_opt, cfg.dtype), scene, tp, tv)
        state["last_loss"] = float(val)
        state["last_grad"] = np.asarray(grad, np.float64)
        if verbose:
            print(f"loss:  {state['last_loss']}   "
                  f"[eval {time.perf_counter() - t0:.1f}s]")
        if on_eval is not None:
            on_eval(np.asarray(x_opt))
        return state["last_loss"]

    def jac(x_opt):
        return state["last_grad"]

    def callback(x_opt):
        history["losses"].append(state["last_loss"])
        history["xk"].append(np.asarray(x_opt).copy())
        if x_target is not None:
            d = ratio_distance(x_opt, x_target, cfg)
            history["distances"].append(d)
            if verbose:
                print("distance: ", d)
        if opt_dir is not None:
            np.save(Path(opt_dir) / "x.npy", x_opt)
            json.dump(history["distances"], open(Path(opt_dir) / "distances.json", "w"))
            json.dump(history["losses"], open(Path(opt_dir) / "losses.json", "w"))
        if resume_dir is not None:
            step = iters_done + len(history["xk"])
            ckpt.save_opt_state(resume_dir, x_opt, cfg=cfg, step=step)
            (Path(resume_dir) / "history.json").write_text(json.dumps(
                {"losses": history["losses"],
                 "distances": history["distances"]}))

    result = scipy.optimize.minimize(
        loss, np.asarray(x0, np.float64), jac=jac, callback=callback,
        method="L-BFGS-B",
        options={"maxiter": maxiter - iters_done, "ftol": 1e-10, "gtol": 1e-10},
    )
    if opt_dir is not None:
        np.save(Path(opt_dir) / "x.npy", result.x)
        if plot:
            import matplotlib

            matplotlib.use("Agg")
            from matplotlib import pyplot as plt

            if history["distances"]:
                plt.plot(history["distances"])
                plt.savefig(Path(opt_dir) / "distance.png")
                plt.clf()
            plt.plot(history["losses"])
            plt.savefig(Path(opt_dir) / "loss.png")
            plt.clf()
    return result, history


def optimize_adam(
    scene: Scene,
    cfg: SimConfig,
    x0,
    target_p,
    target_v,
    steps: int = 200,
    learning_rate: float = 0.05,
    n_steps=None,
    resume_dir=None,
    resume: bool = False,
    checkpoint_every: int = 50,
    eval_chunks: int = 0,
    verbose: bool = False,
):
    """On-device Adam (optax): the update loop is jit'd — no host round-trips
    between iterations (capability the reference lacks).

    ``resume_dir``: the scan runs in ``checkpoint_every``-step chunks, saving
    (x, FULL optax state, step) after each (utils/checkpoint.py).  Unlike the
    L-BFGS path, Adam resume is EXACT: moments live in the saved pytree, so a
    killed-and-resumed run computes the identical iterate sequence.

    ``eval_chunks > 1``: each gradient comes from the bounded host-chunked
    episode VJP (sim/rollout.py::episode_value_and_grad_chunked) and the optax
    update runs as its own small dispatch — for reference-scale episodes whose
    single fwd+bwd dispatch would exceed the worker watchdog (the same reason
    optimize_lbfgs takes eval_chunks).  One Adam step then costs the same
    bounded dispatches as one L-BFGS eval.

    Returns (x_final, losses)."""
    import optax

    from ..utils import checkpoint as ckpt

    tp = jnp.asarray(target_p, cfg.dtype)
    tv = jnp.asarray(target_v, cfg.dtype)
    opt = optax.adam(learning_rate)

    def f(q, sc, tp_, tv_):
        return loss_fn(q, sc, cfg, tp_, tv_, n_steps=n_steps)

    from functools import partial

    if eval_chunks and eval_chunks > 1:
        from ..sim.rollout import episode_value_and_grad_chunked

        cvg = episode_value_and_grad_chunked(scene, cfg, eval_chunks, n_steps)

        @jax.jit
        def apply(x, opt_state, grad):
            updates, opt_state = opt.update(grad, opt_state, x)
            return optax.apply_updates(x, updates), opt_state

        def run(x, opt_state, sc, tp_, tv_, length):
            losses = []
            for _ in range(length):
                t0 = time.perf_counter()
                val, grad = cvg(x, tp_, tv_)
                x, opt_state = apply(x, opt_state, grad)
                losses.append(val)
                if verbose:
                    print(f"adam loss:  {val}   "
                          f"[step {time.perf_counter() - t0:.1f}s]",
                          flush=True)
            return x, opt_state, jnp.asarray(losses)
    else:
        @partial(jax.jit, static_argnames=("length",))
        def run(x, opt_state, sc, tp_, tv_, length):
            def body(carry, _):
                x, opt_state = carry
                val, grad = jax.value_and_grad(f)(x, sc, tp_, tv_)
                updates, opt_state = opt.update(grad, opt_state, x)
                return (optax.apply_updates(x, updates), opt_state), val

            (x, opt_state), losses = jax.lax.scan(
                body, (x, opt_state), None, length=length)
            return x, opt_state, losses

    x = jnp.asarray(x0, cfg.dtype)
    opt_state = opt.init(x)
    done = 0
    all_losses: list = []
    if resume_dir is not None and resume and (Path(resume_dir) / "x.npy").exists():
        saved = ckpt.load_opt_state(resume_dir, opt_state_like=opt_state)
        x = jnp.asarray(saved["x"], cfg.dtype)
        if "opt_state" in saved:
            opt_state = jax.tree.map(
                lambda ref, a: jnp.asarray(a, ref.dtype)
                if hasattr(ref, "dtype") else a, opt_state, saved["opt_state"])
        done = int(saved["meta"].get("step") or 0)
        hist_file = Path(resume_dir) / "history.json"
        if hist_file.exists():
            all_losses = list(json.loads(hist_file.read_text()).get("losses", []))

    chunk = checkpoint_every if resume_dir is not None else steps
    while done < steps:
        length = min(chunk, steps - done)
        x, opt_state, losses = run(x, opt_state, scene, tp, tv, length=length)
        done += length
        all_losses.extend(float(v) for v in np.asarray(losses))
        if resume_dir is not None:
            ckpt.save_opt_state(resume_dir, x, opt_state=opt_state, cfg=cfg,
                                step=done)
            (Path(resume_dir) / "history.json").write_text(
                json.dumps({"losses": all_losses}))
    return x, np.asarray(all_losses)


def grad_check(scene: Scene, cfg: SimConfig, x0, deltas, target_p, target_v,
               index=None, n_steps=None, verbose=True):
    """Analytic vs central finite differences (grad_check, sim.py:418-436).

    Returns list of (delta, analytic, numeric)."""
    tp = jnp.asarray(target_p, cfg.dtype)
    tv = jnp.asarray(target_v, cfg.dtype)
    f_ = lambda q, sc, tp_, tv_: loss_fn(q, sc, cfg, tp_, tv_, n_steps=n_steps)
    fj, gj = jax.jit(f_), jax.jit(jax.grad(f_))
    f = lambda q, sc: fj(q, sc, tp, tv)
    g = lambda q, sc: gj(q, sc, tp, tv)

    grad = np.asarray(g(jnp.asarray(x0, cfg.dtype), scene))
    i = int(np.argmax(np.abs(grad))) if index is None else index
    out = []
    for delta in deltas:
        xp = np.asarray(x0, np.float64).copy()
        xp[i] += delta
        l1 = float(f(jnp.asarray(xp, cfg.dtype), scene))
        xp[i] -= 2 * delta
        l2 = float(f(jnp.asarray(xp, cfg.dtype), scene))
        num = (l1 - l2) / (2 * delta)
        if verbose:
            print("grad ana: ", grad[i], "; grad num: ", num)
        out.append((delta, float(grad[i]), num))
    return out


def warm_start_x0(n: int, warm_path=None, noise: float = 1e-2, seed: int = 0):
    """Reference warm-start semantics (sim.py:454): load a previous x and add
    uniform noise; fall back to zeros when no file exists."""
    rng = np.random.default_rng(seed)
    if warm_path is not None and Path(warm_path).exists():
        x0 = np.load(warm_path)
        if len(x0) == n:
            return x0 + rng.random(n) * noise
    return np.zeros(n)
