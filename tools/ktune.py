#!/usr/bin/env python
"""Standalone pair-kernel micro-harness: time K1/K2 on one synthetic bucket.

Carry-dependent scan (LICM-proof), dispatch overhead subtracted.

Usage: python tools/ktune.py --tiles 150 --slab 384 [--rows 32] [--iters 200]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OVERHEAD = 0.0249


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiles", type=int, default=150)
    ap.add_argument("--slab", type=int, default=384)
    ap.add_argument("--rows", type=int, default=32)
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--tile-batch", type=int, default=1)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import softbody_tpu.ops.pallas.pair_kernels as pk

    pk._TILE_BATCH = args.tile_batch

    t, slab, rows = args.tiles, args.slab, args.rows
    pairs = t * slab * rows
    print(f"t={t} slab={slab} rows={rows} pairs/call={pairs:.3e}", flush=True)

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 12)
    h = 0.01
    # plausible rest geometry: points in a box of size ~4h so pairs mix in/out of range
    restT_rows = jax.random.uniform(ks[0], (t, 3, rows), jnp.float32) * 4 * h
    restT_slab = jax.random.uniform(ks[1], (t, 3, slab), jnp.float32) * 4 * h
    mass_slab = jnp.ones((t, slab), jnp.float32)
    vol_slab = jnp.ones((t, slab), jnp.float32)
    pos_rows16 = jnp.concatenate(
        [jax.random.normal(ks[2], (t, rows, 3), jnp.float32),
         jnp.zeros((t, rows, 13), jnp.float32)], axis=2)
    pos_slab16 = jax.random.normal(ks[3], (t, slab, 16), jnp.float32)
    f9 = jax.random.normal(ks[4], (t, rows, 9), jnp.float32)
    m9 = jax.random.normal(ks[5], (t, rows, 9), jnp.float32)
    sr_slab = jax.random.normal(ks[6], (t, slab, 32), jnp.float32)
    vol_rows = jnp.ones((t, rows), jnp.float32)

    np.asarray(jnp.zeros(()))  # sync mode

    def timed(name, fn, c0):
        @jax.jit
        def run(c):
            def body(c, _):
                return fn(c), None
            out, _ = jax.lax.scan(body, c, None, length=args.iters)
            return out
        r = run(c0)
        jax.block_until_ready(r)
        best = np.inf
        for _ in range(3):
            tt = time.perf_counter()
            r = run(c0)
            jax.block_until_ready(r)
            best = min(best, time.perf_counter() - tt)
        per = (best - OVERHEAD) / args.iters * 1e3
        print(f"{name:34s} {per:8.4f} ms  {pairs/(per*1e-3)/1e9:7.2f} Gpair/s",
              flush=True)
        return per

    # K1: carry = pos_rows16 (perturb to keep live)
    def k1(c):
        a9, y9 = pk._moments_fwd_impl(restT_rows, restT_slab, mass_slab, vol_slab,
                                      c, pos_slab16, h, False)
        return c + 1e-30 * jnp.concatenate(
            [a9 + y9, jnp.zeros((t, rows, 7), jnp.float32)], axis=2)
    timed("K1 moments", k1, pos_rows16)

    # K2 warp: carry = f9
    from softbody_tpu.sim.sparse import _chunks_for
    chunks = _chunks_for(slab)

    def k2(c):
        f = pk._forces_warp_fwd_from_slab(restT_rows, restT_slab, vol_slab, c, m9,
                                          sr_slab, vol_rows, h, False, chunks) \
            if hasattr(pk, "_forces_warp_fwd_from_slab") else None
        if f is None:
            from softbody_tpu.ops.pallas import packed as pkd
            import functools
            kernel = pk._batched(functools.partial(
                pk._forces_warp_kernel_packed, h=h, chunks=chunks), 8)
            from jax.experimental import pallas as pl
            args_, t_pad = pk._pad_tiles(
                [restT_rows, restT_slab, vol_slab[:, None, :], c, m9,
                 sr_slab, vol_rows[:, :, None]], t)
            f = pl.pallas_call(
                kernel,
                grid=(t_pad // pk._TILE_BATCH,),
                in_specs=pk._tile_specs([
                    (3, rows), (3, slab), (1, slab), (rows, 9), (rows, 9),
                    (slab, 32), (rows, 1),
                ]),
                out_specs=pk._tile_specs([(rows, 3)])[0],
                out_shape=jax.ShapeDtypeStruct((t_pad, rows, 3), jnp.float32),
                interpret=False,
            )(*args_)[:t]
        return c + 1e-30 * jnp.concatenate(
            [f, jnp.zeros((t, rows, 6), jnp.float32)], axis=2)
    timed("K2 warp forces", k2, f9)


if __name__ == "__main__":
    main()
