#!/usr/bin/env python
"""Is the forward simulation STABLE?  A quiescent body (v0 = 0, no external
force, no collision contact) must stay at rest; any growing displacement is
numerical instability (zero-energy / negative-stiffness SPH modes or CFL
violation), which turns the inverse-design landscape into amplified noise
(tools/probe_landscape.py measured +-0.5 loss jitter at ANY perturbation
size — this probe isolates the mechanism).

Usage: python tools/probe_stability.py [--particles 20000] [--steps 3000]
           [--dt 1e-6] [--integrator trapezoidal] [--damping ...] [--quiet 0/1]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from softbody_tpu.utils.hostmem import enable_compilation_cache, enable_heap_reuse

    enable_heap_reuse()
    enable_compilation_cache()

    from softbody_tpu.scenarios import (add_physics_args, apply_physics_args,
                          dirichlet_mask, drop_gap, fit_body,
                          scale_mass_for_resolution)

    ap = argparse.ArgumentParser()
    ap.add_argument("--particles", type=int, default=20_000)
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--quiet", type=int, default=1,
                    help="1: v0=0, ext=0 (pure stability); 0: warp defaults")
    ap.add_argument("--x", default="zero", choices=["zero", "star"],
                    help="inflation field: zero (ratio 0.5) or radial bands")
    ap.add_argument("--record-every", type=int, default=250)
    add_physics_args(ap)
    ap.add_argument("--f64", action="store_true",
                    help="CPU f64 gather backend: separates discretization "
                         "instability (math) from f32 rounding seeds")
    ap.add_argument("--gather-f32", action="store_true",
                    help="CPU f32 gather backend (centered moments): isolates "
                         "the pallas raw-dot cancellation from generic f32")
    args = ap.parse_args()

    if args.f64 or args.gather_f32:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.f64 or args.gather_f32:
        jax.config.update("jax_platforms", "cpu")
    if args.f64:
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from softbody_tpu import build_scene, warp_parity
    from softbody_tpu.geometry.shapes import suggest_h
    from softbody_tpu.sim.rollout import rollout
    from softbody_tpu.sim.sparse import build_sparse_scene

    pts, out_num = fit_body(args.particles)
    pts = drop_gap(pts, args.scenario)
    cfg = warp_parity().replace(
        h=suggest_h(pts, 32),
        dtype="float64" if args.f64 else "float32",
        dt=1e-6, integrator="trapezoidal",
        frames=args.steps, target_frames=100,
        backend="gather" if (args.f64 or args.gather_f32) else "pallas")
    cfg = apply_physics_args(cfg, args)
    if args.mass is None:
        cfg = scale_mass_for_resolution(cfg, len(pts), args.scenario)
    if args.quiet:
        cfg = cfg.replace(initial_velocity=(0.0, 0.0, 0.0),
                          external_force=(0.0, 0.0, 0.0))
    print(f"cfg: dt={cfg.dt:g} integ={cfg.integrator} damping={cfg.damping:g} "
          f"h={cfg.h:g} mass={cfg.mass:g} E={cfg.youngs_modulus:g} "
          f"scale=({cfg.scale_a:g},{cfg.scale_b:g}) pdg={cfg.pair_def_grad} "
          f"quiet={args.quiet}", flush=True)
    t0 = time.perf_counter()
    mask = dirichlet_mask(pts, args.scenario)
    if args.f64 or args.gather_f32:
        scene = build_scene(pts, cfg, out_num=out_num, dirichlet_mask=mask)
        sop = np.arange(len(pts))
        n_slots = len(pts)
    else:
        scene, sop = build_sparse_scene(pts, cfg, out_num=out_num,
                                        dirichlet_mask=mask)
        n_slots = scene.blocked.n_slots
    print(f"scene: N={len(pts)} slots={n_slots} "
          f"build={time.perf_counter()-t0:.1f}s", flush=True)

    if args.x == "star":
        r = np.linalg.norm(pts - pts.mean(0), axis=1)
        xp = np.sin(r / r.max() * 3.0 * np.pi)
    else:
        xp = np.zeros(len(pts))
    x = np.zeros(n_slots)
    x[sop] = xp

    t0 = time.perf_counter()
    _, final, rec = jax.jit(lambda xv, sc: rollout(
        xv, sc, cfg, n_steps=args.steps, record_every=args.record_every))(
        jnp.asarray(x, cfg.dtype), scene)
    pos = np.asarray(jax.block_until_ready(rec[0]))   # (k, n_slots, 3)
    vel = np.asarray(rec[1])
    print(f"rollout in {time.perf_counter()-t0:.1f}s", flush=True)

    rest = np.asarray(scene.rest_position)
    sl = np.asarray(sop)
    for k in range(pos.shape[0]):
        step_i = (k + 1) * args.record_every
        d = pos[k][sl] - rest[sl]
        # subtract the rigid translation (quiet=0 runs fall uniformly)
        d = d - d.mean(axis=0, keepdims=True)
        v = vel[k][sl]
        v = v - v.mean(axis=0, keepdims=True)
        print(f"step {step_i:5d}: max|disp-rigid|={np.abs(d).max():.3e} "
              f"rms={np.sqrt((d*d).mean()):.3e} "
              f"max|v-rigid|={np.abs(v).max():.3e} "
              f"max|v|={np.abs(vel[k][sl]).max():.3e} "
              f"y_min={pos[k][sl][:, 1].min():+.4f}", flush=True)


if __name__ == "__main__":
    main()
