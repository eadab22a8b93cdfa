#!/usr/bin/env python
"""Diagnose the inverse-design stall (out/inverse100k): determinism of the
chunked value-and-grad, loss(x*) ~= 0 sanity, and gradient magnitude."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from softbody_tpu.utils.hostmem import enable_compilation_cache, enable_heap_reuse

    enable_heap_reuse()
    enable_compilation_cache()
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--particles", type=int, default=100_000)
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--target-frames", type=int, default=100)
    ap.add_argument("--eval-chunks", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from softbody_tpu import warp_parity
    from softbody_tpu.geometry.shapes import inflatable_sphere, suggest_h
    from softbody_tpu.sim.rollout import episode_value_and_grad_chunked, rollout
    from softbody_tpu.sim.sparse import build_sparse_scene

    probe, _ = inflatable_sphere(n_outer=1000, radius=0.05)
    a = (len(probe) - 1000) / 1000**1.5
    n_outer = 1000
    for _ in range(40):
        n_outer = max((max(args.particles - n_outer, 8.0) / a) ** (2 / 3), 8.0)
    pts, out_num = inflatable_sphere(n_outer=max(int(n_outer), 8), radius=0.05)
    cfg = warp_parity().replace(
        h=suggest_h(pts, 32), dtype="float32", dt=1e-6,
        frames=args.steps, target_frames=args.target_frames,
        backend="pallas")
    t0 = time.perf_counter()
    scene, sop = build_sparse_scene(pts, cfg, out_num=out_num)
    sb = scene.blocked
    print(f"scene: N={len(pts)} slots={sb.n_slots} build={time.perf_counter()-t0:.1f}s",
          flush=True)

    r = np.linalg.norm(pts - pts.mean(0), axis=1)
    x_star_p = np.sin(r / r.max() * 3.0 * np.pi)
    x_star = np.zeros(sb.n_slots)
    x_star[sop] = x_star_p

    interval = args.steps // args.target_frames
    t0 = time.perf_counter()
    _, _, rec = jax.jit(lambda xv, sc: rollout(
        xv, sc, cfg, n_steps=args.steps, record_every=interval))(
        jnp.asarray(x_star, cfg.dtype), scene)
    tp = jax.block_until_ready(rec[0])
    tv = rec[1]
    print(f"targets in {time.perf_counter()-t0:.1f}s", flush=True)

    vg = episode_value_and_grad_chunked(scene, cfg, args.eval_chunks, args.steps)

    def ev(x, tag):
        t0 = time.perf_counter()
        loss, grad = vg(jnp.asarray(x, cfg.dtype), tp, tv)
        loss = float(loss)
        g = np.asarray(grad, np.float64)
        print(f"{tag}: loss={loss!r} |g|={np.linalg.norm(g):.6e} "
              f"max|g|={np.abs(g).max():.6e} [{time.perf_counter()-t0:.1f}s]",
              flush=True)
        return loss, g

    x0 = np.zeros(sb.n_slots)
    l0a, g0a = ev(x0, "x=0   #1")
    l0b, g0b = ev(x0, "x=0   #2")
    print(f"determinism: dloss={l0a-l0b!r} dgrad={np.abs(g0a-g0b).max():.3e}",
          flush=True)
    ls, gs = ev(x_star, "x=x*  ")
    # directional FD check along the gradient at x0
    d = g0a / max(np.linalg.norm(g0a), 1e-30)
    for eps in (1e-2, 1e-4):
        lp, _ = ev(x0 + eps * d, f"x=0+{eps:g}*ghat")
        pred = eps * float(d @ g0a)
        print(f"  FD eps={eps:g}: dL={lp - l0a:.6e} predicted={pred:.6e}",
              flush=True)


if __name__ == "__main__":
    main()
