#!/usr/bin/env python
"""Mosaic feasibility + cost probe for LANE-MAJOR row-side kernel operands.

Round-2 trace fact: every (rows, k<128) pallas operand/output — fm (rows,19),
ay (rows,18), f (rows,3) — is T(8,128)-padded ~7x in HBM and staged padded per
tile.  The fix: ship them as (k, m) lane-major globals with (k, TB*rows=128)
blocks (TB=4, rows=32) and transpose the (k, 32) sub-blocks in-kernel.

Gates measured here on the real chip:
  1. does Mosaic lower a small in-kernel transpose (19, 32) -> (32, 19)?
  2. its cost per tile vs the padded-BlockSpec baseline;
  3. lane-slicing a (k, 128) block at 32-aligned offsets (value level);
  4. writing a (3, 128) output block assembled from four (3, 32) pieces.

Usage: python tools/lanemajor_probe.py [--tiles 3776] [--iters 50]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiles", type=int, default=3776)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--rows", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows = args.rows
    TB = 128 // rows
    t = ((args.tiles + TB - 1) // TB) * TB
    m = t * rows
    np.asarray(jnp.zeros(()))  # sync mode

    def timeit(name, fn, *xs):
        try:
            f = jax.jit(fn)
            out = f(*xs)
            jax.block_until_ready(out)
        except Exception as e:
            print(f"{name:40s} FAILED: {str(e)[:300]}")
            return None
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = f(*xs)
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / args.iters)
        per_tile = best / t * 1e6
        print(f"{name:40s} {best*1e3:8.3f} ms  {per_tile:7.3f} us/tile")
        return best

    rng = np.random.default_rng(0)
    fm_rows = jnp.asarray(rng.normal(size=(t, rows, 19)), jnp.float32)
    fmT = jnp.asarray(np.swapaxes(np.asarray(fm_rows), 1, 2)
                      .transpose(1, 0, 2).reshape(19, m), jnp.float32)
    # fmT[k, tile*rows + r] = fm_rows[tile, r, k]

    # ---------------- baseline: padded (rows, 19) blocks in, (rows, 3) out
    def base_kernel(fm_ref, o_ref):
        for i in range(TB):
            fm = fm_ref[i]          # (rows, 19)
            cols = [sum(fm[:, 3 * c + d:3 * c + d + 1] for d in range(3))
                    * fm[:, 18:19] for c in range(3)]
            o_ref[i] = jnp.concatenate(cols, axis=1)

    def run_base(fm):
        return pl.pallas_call(
            base_kernel,
            grid=(t // TB,),
            in_specs=[pl.BlockSpec((TB, rows, 19), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((TB, rows, 3), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((t, rows, 3), jnp.float32),
        )(fm)

    base = timeit("baseline (rows,19) in / (rows,3) out", run_base, fm_rows)

    # ---------------- lane-major: (19, 128) block in, (3, 128) out,
    # in-kernel (19, 32) -> (32, 19) transposes
    def lm_kernel(fmT_ref, o_ref):
        fmb = fmT_ref[...]            # (19, 128)
        outs = []
        for i in range(TB):
            fm = jnp.swapaxes(fmb[:, i * rows:(i + 1) * rows], 0, 1)  # (32, 19)
            cols = [sum(fm[:, 3 * c + d:3 * c + d + 1] for d in range(3))
                    * fm[:, 18:19] for c in range(3)]
            outs.append(jnp.swapaxes(jnp.concatenate(cols, axis=1), 0, 1))
        o_ref[...] = jnp.concatenate(outs, axis=1)                    # (3, 128)

    def run_lm(fmTv):
        return pl.pallas_call(
            lm_kernel,
            grid=(t // TB,),
            in_specs=[pl.BlockSpec((19, TB * rows), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((3, TB * rows), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((3, m), jnp.float32),
        )(fmTv)

    lm = timeit("lane-major (19,128) in / (3,128) out", run_lm, fmT)

    # parity
    if base is not None and lm is not None:
        a = np.asarray(run_base(fm_rows))           # (t, rows, 3)
        b = np.asarray(run_lm(fmT))                 # (3, m)
        b2 = b.reshape(3, t, rows).transpose(1, 2, 0)
        print("parity max err:", np.abs(a - b2).max())

    # ---------------- transpose-free variant: keep math on (19, 32) columns
    # (consume fmT rows directly; broadcast over SUBLANES needs the pair
    # tensors lane-major too — here just measure a row-extraction body)
    def lmrows_kernel(fmT_ref, o_ref):
        fmb = fmT_ref[...]            # (19, 128)
        rows_out = [sum(fmb[3 * c + d:3 * c + d + 1, :] for d in range(3))
                    * fmb[18:19, :] for c in range(3)]
        o_ref[...] = jnp.concatenate(rows_out, axis=0)

    def run_lmrows(fmTv):
        return pl.pallas_call(
            lmrows_kernel,
            grid=(t // TB,),
            in_specs=[pl.BlockSpec((19, TB * rows), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((3, TB * rows), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((3, m), jnp.float32),
        )(fmTv)

    timeit("lane-major row-math (no transpose)", run_lmrows, fmT)


if __name__ == "__main__":
    main()
