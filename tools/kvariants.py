#!/usr/bin/env python
"""Isolate in-kernel cost drivers with tiny synthetic Pallas kernels.

Each variant processes (t, rows, slab) pair tiles like K1/K2 do; throughput in
Gpair/s exposes which construct eats the VPU budget.
"""

import argparse
import functools
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
    ap.add_argument("--iters", type=int, default=100)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t, slab, rows = args.tiles, args.slab, args.rows
    pairs = t * slab * rows
    h = 0.01
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    restT_rows = jax.random.uniform(ks[0], (t, 3, rows), jnp.float32) * 4 * h
    restT_slab = jax.random.uniform(ks[1], (t, 3, slab), jnp.float32) * 4 * h
    sr_slab = jax.random.normal(ks[2], (t, slab, 32), jnp.float32)

    np.asarray(jnp.zeros(()))

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
        print(f"{name:40s} {per:8.4f} ms  {pairs/(per*1e-3)/1e9:7.2f} Gpair/s",
              flush=True)
        return per

    def call(kernel, extra_inputs=(), extra_specs=()):
        return pl.pallas_call(
            kernel,
            grid=(t,),
            in_specs=[
                pl.BlockSpec((1, 3, rows), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, 3, slab), lambda i: (i, 0, 0)),
                *extra_specs,
            ],
            out_specs=pl.BlockSpec((1, rows, 8), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((t, rows, 8), jnp.float32),
        )

    # V0: just read inputs, write rowsum of one dx component (minimal)
    def k_min(rr_ref, rs_ref, o_ref):
        rr = rr_ref[0]
        rs = rs_ref[0]
        dx0 = rr[0][:, None] - rs[0][None, :]
        o_ref[0] = jnp.broadcast_to(
            jnp.sum(dx0, axis=1, keepdims=True), (rows, 8))
    def v0(c):
        out = call(k_min)(c, restT_slab)
        return c + 1e-30 * jnp.sum(out, axis=(1, 2))[:, None, None]
    timed("V0 one dx + rowsum", v0, restT_rows)

    # V1: 3 dx + r2 (5 mults 6 adds / pair)
    def k_r2(rr_ref, rs_ref, o_ref):
        rr = rr_ref[0]
        rs = rs_ref[0]
        dx = [rr[b][:, None] - rs[b][None, :] for b in range(3)]
        r2 = dx[0] * dx[0] + dx[1] * dx[1] + dx[2] * dx[2]
        o_ref[0] = jnp.broadcast_to(jnp.sum(r2, axis=1, keepdims=True), (rows, 8))
    def v1(c):
        out = call(k_r2)(c, restT_slab)
        return c + 1e-30 * jnp.sum(out, axis=(1, 2))[:, None, None]
    timed("V1 dx+r2", v1, restT_rows)

    # V2: + sqrt + div (q)
    def k_q(rr_ref, rs_ref, o_ref):
        rr = rr_ref[0]
        rs = rs_ref[0]
        dx = [rr[b][:, None] - rs[b][None, :] for b in range(3)]
        r2 = dx[0] * dx[0] + dx[1] * dx[1] + dx[2] * dx[2]
        q = jnp.sqrt(r2) / h
        o_ref[0] = jnp.broadcast_to(jnp.sum(q, axis=1, keepdims=True), (rows, 8))
    def v2(c):
        out = call(k_q)(c, restT_slab)
        return c + 1e-30 * jnp.sum(out, axis=(1, 2))[:, None, None]
    timed("V2 dx+r2+sqrt+div", v2, restT_rows)

    # V3: full pair_coeffs
    import softbody_tpu.ops.pallas.pair_kernels as pk
    def k_pc(rr_ref, rs_ref, o_ref):
        rr = rr_ref[0]
        rs = rs_ref[0]
        dx, w, gfac = pk._pair_coeffs(rr, rs, h)
        o_ref[0] = jnp.broadcast_to(
            jnp.sum(w + gfac, axis=1, keepdims=True), (rows, 8))
    def v3(c):
        out = call(k_pc)(c, restT_slab)
        return c + 1e-30 * jnp.sum(out, axis=(1, 2))[:, None, None]
    timed("V3 full pair_coeffs", v3, restT_rows)

    # V4: pair_coeffs + 20 extra fma-ish ops
    def k_pc20(rr_ref, rs_ref, o_ref):
        rr = rr_ref[0]
        rs = rs_ref[0]
        dx, w, gfac = pk._pair_coeffs(rr, rs, h)
        acc = w
        for i in range(10):
            acc = acc * gfac + w
        o_ref[0] = jnp.broadcast_to(jnp.sum(acc, axis=1, keepdims=True), (rows, 8))
    def v4(c):
        out = call(k_pc20)(c, restT_slab)
        return c + 1e-30 * jnp.sum(out, axis=(1, 2))[:, None, None]
    timed("V4 pair_coeffs + 20 fma", v4, restT_rows)

    # V5: transpose cost: (L, 9) -> (9, L) per tile
    def k_tr(rr_ref, rs_ref, sr_ref, o_ref):
        rr = rr_ref[0]
        sr = sr_ref[0]              # (slab, 32)
        sT = sr[:, :9].T            # (9, slab)
        o_ref[0] = jnp.full((rows, 8), jnp.sum(sT), jnp.float32)
    def v5(c):
        out = pl.pallas_call(
            k_tr,
            grid=(t,),
            in_specs=[
                pl.BlockSpec((1, 3, rows), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, 3, slab), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, slab, 32), lambda i: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, rows, 8), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((t, rows, 8), jnp.float32),
        )(c, restT_slab, sr_slab)
        return c + 1e-30 * jnp.sum(out, axis=(1, 2))[:, None, None]
    timed("V5 (L,9)->(9,L) transpose only", v5, restT_rows)

    # V6: MXU dot (96, slab)@(slab, 32)
    def k_dot(rr_ref, rs_ref, sr_ref, o_ref):
        rr = rr_ref[0]
        rs = rs_ref[0]
        sr = sr_ref[0]
        dx0 = rr[0][:, None] - rs[0][None, :]
        u = jnp.concatenate([dx0, dx0, dx0], axis=0)       # (96, slab)
        d = pk._dot(u, sr)                                  # (96, 32)
        o_ref[0] = d[:rows, :8]
    def v6(c):
        out = pl.pallas_call(
            k_dot,
            grid=(t,),
            in_specs=[
                pl.BlockSpec((1, 3, rows), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, 3, slab), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, slab, 32), lambda i: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, rows, 8), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((t, rows, 8), jnp.float32),
        )(c, restT_slab, sr_slab)
        return c + 1e-30 * jnp.sum(out, axis=(1, 2))[:, None, None]
    timed("V6 dx + MXU dot", v6, restT_rows)


if __name__ == "__main__":
    main()
