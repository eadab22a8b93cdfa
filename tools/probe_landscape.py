#!/usr/bin/env python
"""Map the 1-D loss landscape along the descent direction at x0.

The out/inverse100k stall (round 3) showed L-BFGS-B's line search reading
f(x0 + a*p) WORSE at moderate steps and bit-identical to f(x0) at small ones.
This probe answers, with data, which mechanism is at play:

  * f32-plateau: the true loss decreases along -g but by less than the f32
    quantum of the total (~4e-6 at loss 46) — fixed by the compensated
    accumulator (sim/rollout.py::_acc_add);
  * no descent window: curvature along -g is so strong the Armijo region is
    narrower than the perceptibility limit of f32 ratio updates;
  * gradient inconsistency: f does not decrease along -g at any step size
    (a real VJP bug would show here).

Usage: python tools/probe_landscape.py [--particles 20000] [--steps 3000]
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
    ap.add_argument("--target-frames", type=int, default=100)
    ap.add_argument("--eval-chunks", type=int, default=4)
    ap.add_argument("--alpha-min", type=float, default=1e-7)
    ap.add_argument("--alpha-max", type=float, default=1.0)
    ap.add_argument("--per-decade", type=int, default=3)
    add_physics_args(ap)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from functools import partial

    from softbody_tpu import warp_parity
    from softbody_tpu.geometry.shapes import suggest_h
    from softbody_tpu.sim.rollout import (_chunk_primal, acc_float,
                                          episode_value_and_grad_chunked,
                                          rollout)
    from softbody_tpu.sim.sparse import build_sparse_scene

    pts, out_num = fit_body(args.particles)
    pts = drop_gap(pts, args.scenario)
    cfg = warp_parity().replace(
        h=suggest_h(pts, 32), dtype="float32", dt=1e-6,
        frames=args.steps, target_frames=args.target_frames,
        backend="pallas")
    cfg = apply_physics_args(cfg, args)
    if args.mass is None:
        cfg = scale_mass_for_resolution(cfg, len(pts), args.scenario)
    print(f"cfg: dt={cfg.dt:g} integrator={cfg.integrator} "
          f"damping={cfg.damping:g} h={cfg.h:g} E={cfg.youngs_modulus:g} "
          f"kcol={cfg.collision_stiffness:g}", flush=True)
    t0 = time.perf_counter()
    scene, sop = build_sparse_scene(
        pts, cfg, out_num=out_num,
        dirichlet_mask=dirichlet_mask(pts, args.scenario))
    sb = scene.blocked
    print(f"scene: N={len(pts)} slots={sb.n_slots} "
          f"build={time.perf_counter()-t0:.1f}s dev={jax.devices()[0]}",
          flush=True)

    r = np.linalg.norm(pts - pts.mean(0), axis=1)
    x_star_p = np.sin(r / r.max() * 3.0 * np.pi)
    x_star = np.zeros(sb.n_slots)
    x_star[sop] = x_star_p

    interval = args.steps // args.target_frames
    _, _, rec = jax.jit(lambda xv, sc: rollout(
        xv, sc, cfg, n_steps=args.steps, record_every=interval))(
        jnp.asarray(x_star, cfg.dtype), scene)
    tp = jax.block_until_ready(rec[0])
    tv = rec[1]
    print("targets done", flush=True)

    # ---- forward-only chunked loss (compensated, host-f64 combined)
    n_chunks = max(1, args.eval_chunks)
    base = args.steps // n_chunks
    sizes = [base + (1 if i < args.steps % n_chunks else 0)
             for i in range(n_chunks)]
    k0s = np.cumsum([0] + sizes[:-1]).tolist()

    from softbody_tpu.ops.elasticity import compute_ratio
    from softbody_tpu.sim.rollout import initial_state

    @partial(jax.jit, static_argnames=("length",))
    def fwd_chunk(state, x, k0, length):
        return _chunk_primal(state, x, k0, tp, tv, scene, cfg, length,
                             args.steps)

    @jax.jit
    def init_fn(x):
        return initial_state(scene, compute_ratio(x, cfg), cfg)

    def floss(x):
        x = jnp.asarray(x, cfg.dtype)
        state, total = init_fn(x), 0.0
        for k0, length in zip(k0s, sizes):
            state, acc = fwd_chunk(state, x, jnp.int32(k0), length=length)
            total += acc_float(acc)
        return total

    vg = episode_value_and_grad_chunked(scene, cfg, n_chunks, args.steps)

    x0 = np.zeros(sb.n_slots)
    t0 = time.perf_counter()
    f0, g0 = vg(jnp.asarray(x0, cfg.dtype), tp, tv)
    g0 = np.asarray(g0, np.float64)
    gn = float(np.linalg.norm(g0))
    print(f"f(x0)={f0!r} |g|={gn:.6e} max|g|={np.abs(g0).max():.3e} "
          f"[vg {time.perf_counter()-t0:.1f}s]", flush=True)
    fstar = floss(x_star)
    print(f"f(x*)={fstar!r}", flush=True)

    # ---- sweep along p = -g (the first L-BFGS search direction)
    n_dec = int(np.log10(args.alpha_max / args.alpha_min) + 0.5)
    alphas = np.logspace(np.log10(args.alpha_min), np.log10(args.alpha_max),
                         n_dec * args.per_decade + 1)
    print("\n== f(x0 - a*g) sweep (pred = -a*|g|^2 linear model) ==",
          flush=True)
    for al in alphas:
        t0 = time.perf_counter()
        f = floss(x0 - al * g0)
        df = f - f0
        pred = -al * gn * gn
        print(f"a={al:9.3e}  f={f:.12f}  df={df:+.6e}  pred={pred:+.6e}  "
              f"ratio={df/pred if pred else float('nan'):+.3f}  "
              f"[{time.perf_counter()-t0:.1f}s]", flush=True)

    # ---- FD consistency along ghat (directional derivative must be ~ |g|)
    d = g0 / gn
    print("\n== central FD along ghat: (f(x0+e*d)-f(x0-e*d))/2e vs |g| ==",
          flush=True)
    for eps in (1e-2, 1e-3, 1e-4):
        fp, fm = floss(x0 + eps * d), floss(x0 - eps * d)
        print(f"eps={eps:g}: num={(fp-fm)/(2*eps):.6e} ana={gn:.6e} "
              f"f+={fp!r} f-={fm!r}", flush=True)

    # ---- roughness probe: random direction, tiny steps
    rng = np.random.default_rng(0)
    dr = rng.normal(size=len(x0))
    dr /= np.linalg.norm(dr)
    gd = float(dr @ g0)
    print(f"\n== random direction (g.d = {gd:.3e}) ==", flush=True)
    for eps in (1e-4, 1e-3, 1e-2):
        fp = floss(x0 + eps * dr)
        print(f"eps={eps:g}: df={fp-f0:+.6e} pred={eps*gd:+.6e}", flush=True)


if __name__ == "__main__":
    main()
