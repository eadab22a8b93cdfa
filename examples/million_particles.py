#!/usr/bin/env python
"""BASELINE.md "Scale" row demo: a 1M-particle inflation episode on one chip
with reference-length rollout, a gradient step, and PBRT frame export.

Runs the flagship sparse-pallas backend end-to-end at ~1M particles
(procedural inflatable sphere):

1. full reference-length episode (3000 steps, sim.py:63-64) as a host loop
   of bounded jit'd scan dispatches (sim/rollout.py::forward_chunked — the
   worker watchdog kills single ~60s+ device programs), recording frames
   every --render-every steps;
2. PBRT scene export of the recorded frames (sphere-cloud surface, the
   Taichi visualize path, sim_taichi.py:300-315); rendered to PNG + mp4
   offline when pbrt-v4/ffmpeg are installed, scene files otherwise;
3. ONE gradient step: value_and_grad of the episode loss wrt the inflation
   field x against an analytically inflated target (the Taichi set_target
   pattern, sim_taichi.py:290-294) — the sqrt-nested jax.checkpoint policy
   (sim/rollout.py) keeps the 3000-step backward inside HBM at this scale.

Usage: python examples/million_particles.py [--particles 1000000]
           [--steps 3000] [--grad-steps 3000] [--render-every 500]
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
    from softbody_tpu.utils.hostmem import (enable_compilation_cache,
                                            enable_heap_reuse)

    enable_heap_reuse()
    enable_compilation_cache()

    ap = argparse.ArgumentParser()
    ap.add_argument("--particles", type=int, default=1_000_000)
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--grad-steps", type=int, default=3000,
                    help="episode length for the gradient step (0 = skip)")
    ap.add_argument("--render-every", type=int, default=500,
                    help="record + export a frame every N steps (0 = final only)")
    ap.add_argument("--render-particles", type=int, default=200_000,
                    help="surface particles per exported scene")
    ap.add_argument("--chunk-steps", type=int, default=250,
                    help="forward steps per device dispatch (the worker "
                         "watchdog kills ~60s+ single dispatches; a 3000-step "
                         "forward at 1M particles is minutes in one program)")
    ap.add_argument("--grad-chunks", type=int, default=40,
                    help="fwd+bwd dispatches for the gradient step (each "
                         "chunk's backward is ~3x its forward)")
    ap.add_argument("--out", default="out/million")
    args = ap.parse_args()

    import datetime

    import jax
    import jax.numpy as jnp

    from softbody_tpu import warp_parity
    from softbody_tpu.geometry.shapes import suggest_h
    from softbody_tpu.scenarios import STRETCH, dirichlet_mask, fit_body
    from softbody_tpu.sim.rollout import (episode_value_and_grad_chunked,
                                          forward_chunked)
    from softbody_tpu.sim.sparse import build_sparse_scene

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    report = {"run_id": datetime.datetime.now().isoformat(timespec="seconds"),
              "scenario": "stretch"}

    # ---- body + flagship stretch scenario (stable physics with visible
    # deformation — softbody_tpu/scenarios.py)
    t0 = time.perf_counter()
    pts, out_num = fit_body(args.particles)
    n = len(pts)
    print(f"body: N={n} ({out_num} outer) gen={time.perf_counter()-t0:.1f}s",
          flush=True)

    cfg = warp_parity().replace(h=suggest_h(pts, 32), dtype="float32",
                                frames=args.steps, target_frames=2,
                                backend="pallas", **STRETCH)
    t0 = time.perf_counter()
    scene, sop = build_sparse_scene(
        pts, cfg, out_num=out_num,
        dirichlet_mask=dirichlet_mask(pts, "stretch"))
    build_s = time.perf_counter() - t0
    sb = scene.blocked
    pairs = sum(b.n_tiles * b.slab_len * sb.rows for b in sb.buckets)
    print(f"scene: slots={sb.n_slots} tiles={sb.n_tiles} "
          f"pairs/step={pairs:.3e} build={build_s:.1f}s "
          f"device={jax.devices()[0]}", flush=True)
    report.update(n_particles=n, steps=args.steps, build_seconds=build_s,
                  pairs_per_step=pairs)

    # uniform mid-inflation field (ratio ~ 0.73 at x = 0.5)
    sop_j = jnp.asarray(np.asarray(sop))
    x = jnp.zeros(sb.n_slots, jnp.float32).at[sop_j].set(0.5)

    # ---- full-length forward episode in BOUNDED dispatches (the worker
    # watchdog kills single device programs past ~60s; forward_chunked keeps
    # each dispatch to --chunk-steps), frames recorded at chunk boundaries
    chunk = max(1, min(args.chunk_steps, args.steps))
    rec_every = args.render_every or args.steps
    if args.steps % rec_every or rec_every % chunk:
        rec_every = args.steps  # record_every must divide steps, chunk | rec
        chunk = min(chunk, rec_every)

    t0 = time.perf_counter()
    final, recorded = forward_chunked(x, scene, cfg, args.steps, chunk,
                                      record_every=rec_every)
    # force a real D2H: on the axon tunnel block_until_ready alone can return
    # before execution completes (async stream; see PERF_NOTES.md)
    float(np.asarray(final.position[0, 0]))
    compile_s = time.perf_counter() - t0
    print(f"compile+first episode: {compile_s:.1f}s "
          f"({args.steps // chunk} dispatches)", flush=True)

    t0 = time.perf_counter()
    final, recorded = forward_chunked(x, scene, cfg, args.steps, chunk,
                                      record_every=rec_every)
    float(np.asarray(final.position[0, 0]))    # real D2H sync (see above)
    wall = time.perf_counter() - t0
    thr = n * args.steps / wall
    print(f"episode: {args.steps} steps in {wall:.2f}s -> "
          f"{thr:.3e} particle-steps/s", flush=True)
    report.update(compile_seconds=compile_s, wall_seconds=wall,
                  particle_steps_per_sec=thr, chunk_steps=chunk)

    # ---- artifacts: recorded frames -> npy + PBRT scenes (render if pbrt)
    from softbody_tpu.render.adapters import sphere_cloud_scene
    from softbody_tpu.render.video import export_mp4

    frames_dir = out / "frames"
    frames_dir.mkdir(exist_ok=True)
    rec_pos = np.stack([np.asarray(p) for p in recorded])  # (n_frames, slots, 3)
    sop_np = np.asarray(sop)[:min(out_num, args.render_particles)]
    rendered = 0
    for i, frame in enumerate(rec_pos):
        pos = frame[sop_np]
        np.save(frames_dir / f"positions_{i:04d}.npy", pos.astype(np.float32))
        png = str(frames_dir / f"frame_{i:04d}.png")
        sc = sphere_cloud_scene(pos, png, workdir=frames_dir / f".pbrt_{i:04d}")
        sc.render()  # writes scene.pbrt; renders when pbrt-v4 is installed
        rendered += os.path.exists(png)
    np.save(out / "final_positions.npy",
            rec_pos[-1][np.asarray(sop)].astype(np.float32))
    video = None
    if rendered == len(rec_pos) and rendered > 1:
        video = str(out / "episode.mp4")
        if not export_mp4(str(frames_dir), video, 10, "frame_", ".png"):
            video = None  # ffmpeg missing — PNG frames remain
    print(f"frames: {len(rec_pos)} exported, {rendered} rendered"
          + (f", video={video}" if video else " (pbrt-v4 not installed: "
             "scene.pbrt files written for offline rendering)"), flush=True)
    report.update(frames_exported=len(rec_pos), frames_rendered=rendered,
                  video=video)

    # ---- one gradient step at scale (VERDICT r2 item 6b)
    if args.grad_steps:
        gcfg = cfg.replace(loss_mode="final")
        center = pts.mean(0)
        tp = jnp.asarray((center + 1.2 * (pts - center))[None], jnp.float32)
        tp = jnp.zeros((1, sb.n_slots, 3), jnp.float32).at[:, sop_j].set(tp)
        tv = jnp.zeros_like(tp)
        # chunked multi-dispatch VJP — a 3000-step fwd+bwd at 1M particles is
        # far past the dispatch watchdog in one program (sim/rollout.py)
        vg = episode_value_and_grad_chunked(scene, gcfg, args.grad_chunks,
                                            n_steps=args.grad_steps)
        # ONE timed call: at 1M a 3000-step fwd+bwd is ~30 min of chip time,
        # and with the persistent compilation cache warm (it is after any
        # prior run at this shape) the first call IS the honest timing;
        # grad_compile_seconds then reports ~0 extra.
        t0 = time.perf_counter()
        loss, grad = vg(x, tp, tv)
        float(np.asarray(grad[0]))             # real D2H sync (see above)
        grad_wall = time.perf_counter() - t0
        grad_compile_s = 0.0
        gthr = n * args.grad_steps / grad_wall
        gnorm = float(jnp.linalg.norm(grad))
        print(f"grad step: {args.grad_steps}-step fwd+bwd in {grad_wall:.1f}s "
              f"(compile {grad_compile_s:.1f}s) -> {gthr:.3e} p-steps/s, "
              f"loss={float(loss):.6e} |grad|={gnorm:.3e}", flush=True)
        report.update(grad_steps=args.grad_steps, grad_wall_seconds=grad_wall,
                      grad_compile_seconds=grad_compile_s,
                      grad_particle_steps_per_sec=gthr,
                      grad_loss=float(loss), grad_norm=gnorm)

    (out / "report.json").write_text(json.dumps(report, indent=2))
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
