#!/usr/bin/env python
"""Reference-scale inverse design on one TPU chip.

The reference's unit of work is a 3000-step differentiable episode with 100
loss frames inside a scipy L-BFGS-B loop (/root/reference/sim.py:63-65,
341-372,449-461).  This script runs that exact workload at ~100k particles on
the flagship sparse-pallas backend:

1. build a ~100k-particle procedural inflatable body;
2. apply a named scenario (softbody_tpu/scenarios.py), each validated stable
   and with a clean descent landscape by tools/probe_stability.py /
   tools/probe_landscape.py:
   * "stretch" (default): clamp the top and load the rest — the Taichi
     reference's own setup (sim_taichi.py:329-334), contact-free;
   * "drop": the Warp reference's flagship workload — the body falls under
     gravity onto the ground plane with penalty contact inside the loss
     window (sim.py:440-454), run at the CFL-consistent v4 triple with the
     Kelvin-Voigt contact damper;
3. pick a ground-truth inflation field x* (radial bands — a pattern the
   optimizer cannot guess from the initial x0 = 0 fill) and generate target
   trajectories by rolling x* forward (the --set_target workflow,
   sim.py:363-369) — 100 sampled frames of 3000 steps;
4. L-BFGS-B from x0 = 0 with the jit'd episode value-and-grad, saving the
   reference's per-iteration artifacts (x.npy, losses/distances json,
   convergence plots) under --out.

Usage: python examples/inverse_design_100k.py [--particles 100000]
           [--steps 3000] [--maxiter 25] [--out out/inverse100k]
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from softbody_tpu.utils.hostmem import enable_compilation_cache, enable_heap_reuse

    enable_heap_reuse()
    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--particles", type=int, default=100_000)
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--target-frames", type=int, default=100)
    ap.add_argument("--maxiter", type=int, default=25)
    ap.add_argument("--x0", default=None,
                    help="warm-start x (slot space .npy from a prior run's "
                         "opt artifacts; the reference warm-starts from "
                         "opt/pear/x.npy the same way, sim.py:454)")
    ap.add_argument("--eval-chunks", type=int, default=8,
                    help="split each episode fwd+bwd into N bounded device "
                         "programs (the axon worker watchdog kills ~60s+ "
                         "dispatches; 8 keeps 3000-step chunks ~10s each)")
    ap.add_argument("--out", default="out/inverse100k")
    ap.add_argument("--scenario", default="stretch", choices=["stretch", "drop"],
                    help="stretch: Taichi-reference clamp-and-load "
                         "(sim_taichi.py:329-334); drop: the Warp reference's "
                         "own flagship workload — body dropped under gravity "
                         "onto the ground plane with penalty contact in the "
                         "loss path (sim.py:440-454), at the CFL-consistent "
                         "v4 triple (softbody_tpu/scenarios.py DROP)")
    ap.add_argument("--resume", action="store_true", default=False,
                    help="resume an interrupted run from {out}/checkpoint")
    ap.add_argument("--optimizer", default="lbfgs", choices=["lbfgs", "adam"],
                    help="lbfgs: the reference's scipy driver (sim.py:454). "
                         "adam: on-device optax Adam (beyond-reference) — "
                         "robust where the L-BFGS line search stalls against "
                         "the contact-landscape noise floor (measured at "
                         "100k drop: ~24 evals/iteration, PERF_NOTES r5)")
    ap.add_argument("--lr", type=float, default=0.05)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from softbody_tpu import warp_parity
    from softbody_tpu.geometry.shapes import suggest_h
    from softbody_tpu.opt import driver
    from softbody_tpu.scenarios import (_SCENARIOS, dirichlet_mask, drop_gap,
                                        fit_body, scale_mass_for_resolution,
                                        x_star_bands)
    from softbody_tpu.sim.rollout import rollout
    from softbody_tpu.sim.sparse import build_sparse_scene

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    # ---- body (same sizing fit as bench.py) + named scenario
    t0 = time.perf_counter()
    pts, out_num = fit_body(args.particles)
    pts = drop_gap(pts, args.scenario)
    n = len(pts)
    cfg = warp_parity().replace(
        h=suggest_h(pts, 32), dtype="float32",
        frames=args.steps, target_frames=args.target_frames,
        backend="pallas", **_SCENARIOS[args.scenario])
    cfg = scale_mass_for_resolution(cfg, n, args.scenario)
    scene, sop = build_sparse_scene(
        pts, cfg, out_num=out_num,
        dirichlet_mask=dirichlet_mask(pts, args.scenario))
    sb = scene.blocked
    print(f"scene: N={n} slots={sb.n_slots} tiles={sb.n_tiles} "
          f"build={time.perf_counter()-t0:.1f}s device={jax.devices()[0]}",
          flush=True)

    # ---- ground-truth inflation field: radial bands in [-1, 1]
    x_star = x_star_bands(pts, sb.n_slots, sop)
    x_star_p = x_star[sop]

    # ---- targets from x* (in-memory --set_target, sim.py:363-369)
    interval = args.steps // args.target_frames
    t0 = time.perf_counter()
    # scene rides as a jit ARGUMENT (closed-over arrays embed as HLO literal
    # constants; at this scale the serialized module breaks compile transports)
    _, _, rec = jax.jit(lambda xv, sc: rollout(
        xv, sc, cfg, n_steps=args.steps, record_every=interval))(
        jnp.asarray(x_star, cfg.dtype), scene)
    tp = jax.block_until_ready(rec[0])
    tv = rec[1]
    print(f"targets: {args.target_frames} frames of {args.steps} steps "
          f"in {time.perf_counter()-t0:.1f}s (incl fwd compile)", flush=True)
    np.save(out / "x_star.npy", x_star_p)

    # ---- L-BFGS-B from x0 = 0 (reference loop, sim.py:449-461)
    x0 = np.zeros(sb.n_slots)
    if args.x0:
        x0 = np.load(args.x0)
        assert x0.shape == (sb.n_slots,), (x0.shape, sb.n_slots)
    t0 = time.perf_counter()
    if args.optimizer == "adam":
        x_fin, losses = driver.optimize_adam(
            scene, cfg, x0, tp, tv, steps=args.maxiter,
            learning_rate=args.lr, n_steps=args.steps,
            eval_chunks=args.eval_chunks, verbose=True,
            resume_dir=out / "checkpoint", resume=args.resume)
        wall = time.perf_counter() - t0
        np.save(out / "x.npy", np.asarray(x_fin))
        json.dump([float(v) for v in losses],
                  open(out / "losses.json", "w"))
        dist = driver.ratio_distance(np.asarray(x_fin), x_star, cfg)
        json.dump([dist], open(out / "distances.json", "w"))
        result = type("R", (), {
            "nit": len(losses), "nfev": len(losses),
            "message": "adam: fixed step budget"})
        history = {"losses": [float(v) for v in losses],
                   "distances": [dist]}
        print(f"Adam: {len(losses)} steps in {wall:.0f}s — "
              f"loss {losses[0]:.6g} -> {losses[-1]:.6g}", flush=True)
    else:
        result, history = driver.optimize_lbfgs(
            scene, cfg, x0, tp, tv, opt_dir=out,
            x_target=x_star, maxiter=args.maxiter, n_steps=args.steps,
            eval_chunks=args.eval_chunks,
            resume_dir=out / "checkpoint", resume=args.resume)
        wall = time.perf_counter() - t0
        print(f"L-BFGS: {result.nit} iterations / {result.nfev} evals in "
              f"{wall:.0f}s — {result.message}", flush=True)

    import datetime

    report = {
        # one coherent run per out dir: every artifact in --out (x.npy,
        # losses/distances json, plots, x_star.npy, run log) comes from THIS
        # invocation, identified by run_id
        "run_id": datetime.datetime.now().isoformat(timespec="seconds"),
        "scenario": args.scenario,
        "optimizer": args.optimizer,
        "cfg": {"dt": cfg.dt, "youngs_modulus": cfg.youngs_modulus,
                "integrator": cfg.integrator, "damping": cfg.damping,
                "h": cfg.h, "mass": cfg.mass,
                "collision": cfg.collision,
                "collision_stiffness": cfg.collision_stiffness,
                "collision_damping": cfg.collision_damping,
                "initial_velocity": list(cfg.initial_velocity),
                "external_force": list(cfg.external_force)},
        "n_particles": n,
        "steps": args.steps,
        "target_frames": args.target_frames,
        "maxiter": args.maxiter,
        "iterations": int(result.nit),
        "function_evals": int(result.nfev),
        "wall_seconds": wall,
        "loss_first": history["losses"][0] if history["losses"] else None,
        "loss_last": history["losses"][-1] if history["losses"] else None,
        "distance_first": history["distances"][0] if history["distances"] else None,
        "distance_last": history["distances"][-1] if history["distances"] else None,
        "message": str(result.message),
    }
    (out / "report.json").write_text(json.dumps(report, indent=2))
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
