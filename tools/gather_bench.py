#!/usr/bin/env python
"""Microbenchmark: XLA gather cost vs packed row width on the real chip.

Measures jnp.take(src, idx, axis=0) inside a lax.scan (sync mode, amortized)
for the same total gathered SLOTS at different group widths:
  GROUP=8  -> 64-f  (pos) / 128-f (sr) rows
  GROUP=16 -> 128-f / 256-f rows
  GROUP=32 -> 256-f / 512-f rows

Decides whether the per-row gather-engine cost (~3.5 ns/row measured round 1)
makes coarser candidate groups worthwhile for the sparse layout.
"""

import argparse
import time

import numpy as np


def main():
    from softbody_tpu.utils.hostmem import enable_heap_reuse

    enable_heap_reuse()
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=120_000)
    ap.add_argument("--gathered-slots", type=int, default=2_200_000)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    np.asarray(jnp.zeros(()))  # sync mode
    rng = np.random.default_rng(0)

    for group, width in [(8, 64), (8, 128), (16, 128), (16, 256),
                         (32, 256), (32, 512)]:
        n_rows = args.slots // group
        n_idx = args.gathered_slots // group
        src = jnp.asarray(rng.standard_normal((n_rows, width)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, n_rows, n_idx), jnp.int32)

        @jax.jit
        def run(s, ix):
            def body(c, _):
                g = jnp.take(s + c, ix, axis=0)
                return jnp.float32(g[0, 0] * 1e-20), None
            out, _ = jax.lax.scan(body, jnp.float32(0), None, length=args.iters)
            return out

        float(np.asarray(run(src, idx)))  # compile
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(run(src, idx)))
            best = min(best, time.perf_counter() - t0)
        per_iter = best / args.iters
        mb = n_idx * width * 4 / 1e6
        print(f"group={group:2d} width={width:3d}f rows={n_idx:8d} "
              f"{per_iter*1e3:7.3f} ms/gather  {per_iter/n_idx*1e9:6.2f} ns/row "
              f"{mb/per_iter/1e3:7.1f} GB/s")


if __name__ == "__main__":
    main()
