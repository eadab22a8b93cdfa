#!/usr/bin/env python
"""BASELINE.md "Scale" row demo: a 1M-particle inflation episode on one chip
plus PBRT scene export of the final frame.

Runs the flagship sparse-pallas backend end-to-end at ~1.16M particles
(procedural inflatable sphere), reports build time and on-device throughput,
writes artifacts under --out (positions .npy + a sphere-cloud .pbrt scene for
the deformed final frame; pbrt-v4 renders it offline when available).

Usage: python examples/million_particles.py [--particles 1000000] [--steps 200]
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--particles", type=int, default=1_000_000)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--out", default="out/million")
    ap.add_argument("--render-every", type=int, default=0,
                    help="also export intermediate scenes every N steps")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from softbody_tpu import warp_parity
    from softbody_tpu.geometry.shapes import inflatable_sphere, suggest_h
    from softbody_tpu.ops.elasticity import compute_ratio
    from softbody_tpu.sim.rollout import rollout
    from softbody_tpu.sim.sparse import build_sparse_scene

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    t0 = time.perf_counter()
    probe, _ = inflatable_sphere(n_outer=1000, radius=0.05)
    a = (len(probe) - 1000) / 1000**1.5
    n_outer = 1000
    for _ in range(40):
        n_outer = max(((args.particles - n_outer) / a) ** (2 / 3), 8.0)
    pts, out_num = inflatable_sphere(n_outer=int(n_outer), radius=0.05)
    n = len(pts)
    print(f"body: N={n} ({out_num} outer) gen={time.perf_counter()-t0:.1f}s",
          flush=True)

    cfg = warp_parity().replace(h=suggest_h(pts, 32), dtype="float32", dt=1e-6,
                                target_frames=2, backend="pallas")
    t0 = time.perf_counter()
    scene, sop = build_sparse_scene(pts, cfg, out_num=out_num)
    build_s = time.perf_counter() - t0
    sb = scene.blocked
    pairs = sum(b.n_tiles * b.slab_len * sb.rows for b in sb.buckets)
    print(f"scene: slots={sb.n_slots} tiles={sb.n_tiles} "
          f"pairs/step={pairs:.3e} build={build_s:.1f}s "
          f"device={jax.devices()[0]}", flush=True)

    # inflate: x > 0 -> ratio ~ 1 (soft), falling body under gravity-lite
    x = jnp.zeros(sb.n_slots, jnp.float32).at[jnp.asarray(sop)].set(0.5)

    @jax.jit
    def run(xv, sc):
        _, final, _ = rollout(xv, sc, cfg, n_steps=args.steps)
        return final

    t0 = time.perf_counter()
    final = run(x, scene)
    np.asarray(final.position[0, 0])
    compile_s = time.perf_counter() - t0
    print(f"compile+first run: {compile_s:.1f}s", flush=True)

    t0 = time.perf_counter()
    final = run(x, scene)
    pos0 = float(np.asarray(final.position[0, 0]))
    wall = time.perf_counter() - t0
    thr = n * args.steps / wall
    print(f"episode chunk: {args.steps} steps in {wall:.2f}s -> "
          f"{thr:.3e} particle-steps/s", flush=True)

    # artifacts: final positions (particle order) + PBRT scene of the surface
    pos = np.asarray(final.position)[np.asarray(sop)]
    np.save(out / "final_positions.npy", pos.astype(np.float32))
    from softbody_tpu.render.adapters import sphere_cloud_scene

    scene_png = str(out / "final.png")
    sc = sphere_cloud_scene(pos[:min(out_num, 200_000)], scene_png,
                            workdir=out / ".pbrt")
    sc.render()  # writes .pbrt/scene.pbrt; renders if pbrt-v4 is installed
    report = {
        "n_particles": n,
        "steps": args.steps,
        "build_seconds": build_s,
        "compile_seconds": compile_s,
        "wall_seconds": wall,
        "particle_steps_per_sec": thr,
        "pairs_per_step": pairs,
    }
    (out / "report.json").write_text(json.dumps(report, indent=2))
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
