#!/usr/bin/env python
"""Headline benchmark: particle-steps/sec for the flagship inflatable-body
forward simulation (Warp-parity semantics, f32) on one TPU chip.

Baseline (BASELINE.md): the reference publishes no numbers; the north-star
target is 1e8 particle-steps/sec/chip at 100k particles on v5e.
``vs_baseline`` is measured_value / 1e8.

Prints exactly ONE JSON line:
  {"metric": "particle_steps_per_sec", "value": N, "unit": "particle*steps/s",
   "vs_baseline": R, "fwdbwd_value": M, "fwdbwd_vs_baseline": Q}

The fwdbwd_* fields pin the gradient-path number the actual workload consumes
(each L-BFGS eval is a full episode forward+backward, sim.py:454); --grad
benchmarks ONLY that path, --fwd-only skips it.
"""

from __future__ import annotations

import argparse
import json
from functools import partial
import sys
import time

import numpy as np

NORTH_STAR = 1e8


def main():
    from softbody_tpu.utils.hostmem import enable_compilation_cache, enable_heap_reuse

    enable_heap_reuse()
    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--particles", type=int, default=100_000)
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--warmup-steps", type=int, default=50)
    ap.add_argument("--neighbors", type=int, default=32)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--backend", choices=["pallas", "blocked", "gather"], default="pallas")
    ap.add_argument("--layout", choices=["sparse", "varcol", "cells"],
                    default="sparse")
    # rows=32 wins under the round-4 true-f32 kernels (fewer candidate pairs
    # now matter more than per-tile staging: 1.60e7 vs 1.43e7 at rows=64,
    # rows=16 1.08e7); rows=64 was the round-3 bf16-dot-era winner
    ap.add_argument("--rows", type=int, default=32)
    ap.add_argument("--max-buckets", type=int, default=8)
    ap.add_argument("--group", type=int, default=8,
                    help="slots per packed gather row (sparse layout)")
    ap.add_argument("--tz", type=int, default=4)
    ap.add_argument("--mode", choices=["warp", "taichi"], default="warp",
                    help="pair_def_grad semantics: warp=F_i (flagship), taichi=F_j (separable)")
    ap.add_argument("--grad", action="store_true", help="benchmark ONLY value_and_grad")
    ap.add_argument("--fwd-only", action="store_true", help="skip the fwd+bwd measurement")
    ap.add_argument("--grad-steps", type=int, default=500,
                    help="episode length for the fwd+bwd measurement (bounded "
                         "so the single dispatch stays under the worker watchdog)")
    ap.add_argument("--pair-dtype", choices=["float32", "bfloat16"], default="float32")
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from softbody_tpu import build_scene, warp_parity
    from softbody_tpu.geometry.shapes import inflatable_sphere, suggest_h
    from softbody_tpu.sim.rollout import loss_fn, rollout

    def log(*a):
        if args.verbose:
            print(*a, file=sys.stderr)

    # Scale the procedural body so the total particle count lands near target.
    # N(n_outer) ~= n_outer + a * n_outer^1.5 (inner fill grows superlinearly);
    # fit `a` on a probe and solve by fixed point.
    probe_n = 1000
    probe, _ = inflatable_sphere(n_outer=probe_n, radius=0.05)
    a = (len(probe) - probe_n) / probe_n**1.5
    n_outer = probe_n
    for _ in range(40):
        n_outer = max(((args.particles - n_outer) / a) ** (2 / 3), 8.0)
    n_outer = max(int(n_outer), 8)
    pts, out_num = inflatable_sphere(n_outer=n_outer, radius=0.05)
    n = len(pts)
    cfg = warp_parity().replace(
        h=suggest_h(pts, args.neighbors),
        dtype="float32",
        dt=1e-6,
        max_neighbors=64,
        target_frames=2,
        backend=args.backend,
        pair_def_grad="i" if args.mode == "warp" else "j",
        pair_dtype=args.pair_dtype,
    )
    t0 = time.perf_counter()
    if args.backend == "pallas" and args.layout == "sparse":
        from softbody_tpu.sim.sparse import build_sparse_scene

        scene, sop = build_sparse_scene(pts, cfg, out_num=out_num, rows=args.rows,
                                        max_buckets=args.max_buckets,
                                        group=args.group)
        blk = scene.blocked
        log(f"scene: N={n} slots={blk.n_slots} tiles={blk.n_tiles} rows={blk.rows} "
            f"buckets={[(b.n_tiles, b.slab_len) for b in blk.buckets]} "
            f"build={time.perf_counter()-t0:.1f}s device={jax.devices()[0]}")
        n_state = blk.n_slots
    elif args.backend in ("pallas", "blocked"):
        from softbody_tpu.sim.blocked import build_blocked_scene

        scene, sop = build_blocked_scene(
            pts, cfg, out_num=out_num, tz=args.tz,
            layout="varcol" if args.layout == "sparse" else args.layout,
            rows=args.rows)
        blk = scene.blocked
        log(f"scene: N={n} slots={blk.n_slots} tiles={blk.n_tiles} rows={blk.rows} "
            f"slab={blk.slab_len} build={time.perf_counter()-t0:.1f}s device={jax.devices()[0]}")
        n_state = blk.n_slots
    else:
        scene = build_scene(pts, cfg, out_num=out_num)
        log(f"scene: N={n} K={scene.topology.idx.shape[1]} build={time.perf_counter()-t0:.1f}s "
            f"device={jax.devices()[0]}")
        n_state = n

    x = jnp.zeros(n_state, dtype=cfg.dtype)

    def measure(execute, steps, tag):
        t0 = time.perf_counter()
        execute()
        log(f"{tag} compile+first run: {time.perf_counter()-t0:.1f}s")
        best = float("inf")
        for r in range(args.repeats):
            t0 = time.perf_counter()
            execute()
            dt_wall = time.perf_counter() - t0
            best = min(best, dt_wall)
            log(f"{tag} repeat {r}: {dt_wall:.3f}s -> "
                f"{n * steps / dt_wall:.3e} particle-steps/s")
        return n * steps / best

    def grad_execute_fn(steps):
        base = np.asarray(scene.rest_position)
        tp = jnp.asarray(np.stack([base, base]), dtype=cfg.dtype)
        tv = jnp.zeros_like(tp)

        from softbody_tpu.utils.hostmem import compiler_options_from_env

        @partial(jax.jit, compiler_options=compiler_options_from_env())
        def run(xv, sc):
            return jax.value_and_grad(
                lambda q: loss_fn(q, sc, cfg, tp, tv, n_steps=steps)
            )(xv)

        def execute():
            loss, grad = run(x, scene)
            # force a real D2H transfer: on the axon tunnel block_until_ready
            # alone can return before execution completes (async stream)
            return float(np.asarray(grad[0])) + float(loss)

        return execute

    if args.grad:
        value = measure(grad_execute_fn(args.steps), args.steps, "fwd+bwd")
        print(json.dumps({
            "metric": "particle_steps_per_sec_fwdbwd",
            "value": value,
            "unit": "particle*steps/s",
            "vs_baseline": value / NORTH_STAR,
        }))
        return

    from softbody_tpu.utils.hostmem import compiler_options_from_env

    copts = compiler_options_from_env()

    @partial(jax.jit, compiler_options=copts)
    def run_fwd(xv, sc):
        _, final, _ = rollout(xv, sc, cfg, n_steps=args.steps)
        return final

    def fwd_execute():
        final = run_fwd(x, scene)
        # force a real D2H transfer (see grad branch note)
        return float(np.asarray(final.position[0, 0]))

    value = measure(fwd_execute, args.steps, "fwd")
    out = {
        "metric": "particle_steps_per_sec",
        "value": value,
        "unit": "particle*steps/s",
        "vs_baseline": value / NORTH_STAR,
    }
    if not args.fwd_only:
        gv = measure(grad_execute_fn(args.grad_steps), args.grad_steps,
                     "fwd+bwd")
        out["fwdbwd_value"] = gv
        out["fwdbwd_vs_baseline"] = gv / NORTH_STAR
    print(json.dumps(out))


if __name__ == "__main__":
    main()
