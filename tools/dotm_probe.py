#!/usr/bin/env python
"""Does the M (sublane) dimension of the in-kernel MXU dot matter on v5e?

K2's per-chunk contraction is ``sT (16, L) @ Z^T (3*rows, L)`` at HIGHEST
(6 bf16 passes), but only the 9 R rows of the output are consumed — rows
0..5 (S) and 15 (pad) are discarded.  If MXU time scales with M, slicing the
LHS to (9, L) saves ~44% of K2's dot work; if the systolic array rounds M up
to a 128-row tile anyway, it saves nothing.  This probe times the dot shapes
standalone (amortized inside one scan dispatch, sync mode).

Usage: python tools/dotm_probe.py [--L 640] [--iters 2000]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--L", type=int, default=640)
    ap.add_argument("--N", type=int, default=96)  # 3*rows
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--tiles", type=int, default=16,
                    help="independent dots per iteration (amortize loop)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    np.asarray(jnp.zeros(()))  # sync mode on the axon tunnel

    def bench_m(M):
        T = args.tiles

        def kernel(a_ref, b_ref, o_ref):
            o_ref[0] = jax.lax.dot_general(
                a_ref[0], b_ref[0], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)

        a = jnp.asarray(np.random.rand(T, M, args.L), jnp.float32)
        b = jnp.asarray(np.random.rand(T, args.N, args.L), jnp.float32)

        call = pl.pallas_call(
            lambda ar, br, orf: kernel(ar, br, orf),
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, M, args.L), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, args.N, args.L), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, M, args.N), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T, M, args.N), jnp.float32),
        )

        @jax.jit
        def run(a, b):
            def body(c, _):
                o = call(a, b)
                return c + o[0, 0, 0], None

            c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                                length=args.iters)
            return c

        run(a, b).block_until_ready()
        t0 = time.perf_counter()
        float(np.asarray(run(a, b)))
        dt = time.perf_counter() - t0
        per = dt / args.iters / T * 1e9
        print(f"M={M:3d}: {per:8.1f} ns/dot  ({dt:.3f}s total)")
        return per

    for M in (4, 8, 9, 16, 32, 64, 128):
        bench_m(M)


if __name__ == "__main__":
    main()
