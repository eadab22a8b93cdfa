#!/usr/bin/env python
"""Capture a profiler trace of the sparse elastic eval (or full step) and print
the aggregated per-op device-time table via tools/xplane.py.

Usage: python tools/trace_eval.py --particles 20000 [--iters 50] [--tile-batch 8]
"""

import argparse
import glob
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from softbody_tpu.utils.hostmem import enable_heap_reuse

    enable_heap_reuse()
    ap = argparse.ArgumentParser()
    ap.add_argument("--particles", type=int, default=20_000)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--tile-batch", type=int, default=None)
    ap.add_argument("--rows", type=int, default=32)
    ap.add_argument("--max-buckets", type=int, default=8)
    ap.add_argument("--step", action="store_true", help="trace the full step")
    ap.add_argument("--grad", action="store_true", help="trace fwd+bwd of a short rollout")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--out", default="/tmp/jaxtrace_eval")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.tile_batch is not None:
        import softbody_tpu.ops.pallas.pair_kernels as pk
        pk._TILE_BATCH = args.tile_batch

    from softbody_tpu import warp_parity
    from softbody_tpu.geometry.shapes import inflatable_sphere, suggest_h
    from softbody_tpu.ops.elasticity import compute_ratio
    from softbody_tpu.sim.sparse import build_sparse_scene, elastic_forces_sparse

    probe, _ = inflatable_sphere(n_outer=1000, radius=0.05)
    a = (len(probe) - 1000) / 1000**1.5
    n_outer = 1000
    for _ in range(40):
        n_outer = max(((args.particles - n_outer) / a) ** (2 / 3), 8.0)
    pts, out_num = inflatable_sphere(n_outer=max(int(n_outer), 8), radius=0.05)
    cfg = warp_parity().replace(h=suggest_h(pts, 32), dtype="float32", dt=1e-6,
                                target_frames=2, backend="pallas")
    t0 = time.perf_counter()
    scene, sop = build_sparse_scene(pts, cfg, out_num=out_num, rows=args.rows,
                                    max_buckets=args.max_buckets)
    sb = scene.blocked
    pairs = sum(b.n_tiles * b.slab_len * sb.rows for b in sb.buckets)
    print(f"N={len(pts)} slots={sb.n_slots} tiles={sb.n_tiles} "
          f"buckets={[(b.n_tiles, b.slab_len) for b in sb.buckets]} "
          f"build={time.perf_counter()-t0:.1f}s pairs={pairs/len(pts):.0f}/particle",
          flush=True)
    x = jnp.zeros(sb.n_slots, jnp.float32)
    ratio = compute_ratio(x, cfg)
    pos0 = scene.rest_position
    np.asarray(jnp.zeros(()))  # sync mode

    if args.grad:
        from softbody_tpu.sim.rollout import loss_fn
        base = np.asarray(scene.rest_position)
        tp = jnp.asarray(np.stack([base, base]), jnp.float32)
        tv = jnp.zeros_like(tp)

        @jax.jit
        def run(xv):
            return jax.value_and_grad(
                lambda q: loss_fn(q, scene, cfg, tp, tv, n_steps=args.iters)
            )(xv)

        def execute():
            loss, grad = run(x)
            return float(np.asarray(grad[0])) + float(loss)
    elif args.step:
        from softbody_tpu.sim.rollout import rollout

        @jax.jit
        def run(xv):
            _, final, _ = rollout(xv, scene, cfg, n_steps=args.iters)
            return final

        def execute():
            return float(np.asarray(run(x).position[0, 0]))
    else:
        def full_eval(p):
            f = elastic_forces_sparse(p, ratio, scene.materials, scene, cfg)
            return p + 1e-12 * f

        @jax.jit
        def run(p):
            def body(c, _):
                return full_eval(c), None
            out, _ = jax.lax.scan(body, p, None, length=args.iters)
            return out

        def execute():
            return float(np.asarray(run(pos0)[0, 0]))

    t0 = time.perf_counter()
    execute()
    print(f"compile+run {time.perf_counter()-t0:.1f}s", flush=True)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        execute()
        best = min(best, time.perf_counter() - t0)
    print(f"best total {best*1e3:.1f} ms -> {(best-0.0249)/args.iters*1e3:.3f} "
          f"ms/iter (minus dispatch)", flush=True)

    os.system(f"rm -rf {args.out}")
    os.makedirs(args.out, exist_ok=True)
    import jax.profiler
    with jax.profiler.trace(args.out):
        execute()
    pbs = glob.glob(f"{args.out}/**/*.xplane.pb", recursive=True)
    print("trace:", pbs, flush=True)
    tool = os.path.join(os.path.dirname(os.path.abspath(__file__)), "xplane.py")
    subprocess.run([sys.executable, tool, pbs[0], "--plane", "TPU",
                    "--top", str(args.top)])


if __name__ == "__main__":
    main()
