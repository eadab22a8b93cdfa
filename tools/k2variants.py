#!/usr/bin/env python
"""K2 (warp forces) kernel redesign candidates, timed standalone.

Baseline: pair_kernels._forces_warp_kernel_packed via ktune.
Variants here:
  A: srT precomputed (XLA transpose outside), no in-kernel relayout
  B: A + fori_loop over a TB-tile block per grid instance
  C: B + drop w (gfac only), fold vol into gfac
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
    ap.add_argument("--tiles", type=int, default=144)
    ap.add_argument("--slab", type=int, default=384)
    ap.add_argument("--rows", type=int, default=32)
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--tb", type=int, default=16)
    ap.add_argument("--variants", default="A,B")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import softbody_tpu.ops.pallas.pair_kernels as pk

    t, slab, rows, TB = args.tiles, args.slab, args.rows, args.tb
    pairs = t * slab * rows
    h = 0.01
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    restT_rows = jax.random.uniform(ks[0], (t, 3, rows), jnp.float32) * 4 * h
    restT_slab = jax.random.uniform(ks[1], (t, 3, slab), jnp.float32) * 4 * h
    vol_slab = jnp.ones((t, 1, slab), jnp.float32)
    f9 = jax.random.normal(ks[4], (t, rows, 9), jnp.float32)
    m9 = jax.random.normal(ks[5], (t, rows, 9), jnp.float32)
    sr_slab = jax.random.normal(ks[6], (t, slab, 32), jnp.float32)
    srT_slab = jnp.swapaxes(sr_slab, 1, 2)  # (t, 32, slab)
    vol_rows = jnp.ones((t, rows, 1), jnp.float32)

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
        print(f"{name:34s} {per:8.4f} ms  {pairs/(per*1e-3)/1e9:7.2f} Gpair/s",
              flush=True)
        return per

    consume = lambda c, f: c + 1e-30 * jnp.concatenate(
        [f, jnp.zeros((t, rows, 6), jnp.float32)], axis=2)

    # ---------------- variant A: srT input, single tile per instance
    def kernel_a(rr_ref, rs_ref, vs_ref, f9_ref, m9_ref, sr_ref, srT_ref,
                 vr_ref, f_ref, *, h):
        rr = rr_ref[0]
        f9 = f9_ref[0]
        m9 = m9_ref[0]
        vol_rows = vr_ref[0]
        rs = rs_ref[0]
        dx, w, gfac = pk._pair_coeffs(rr, rs, h)
        vol_lane = vs_ref[0]
        sr = sr_ref[0]
        sT = srT_ref[0]                 # (32, slab): rows 0..8 = S
        nw = [gfac * dx[b] for b in range(3)]
        z = [sum(nw[b] * sT[3 * d + b][None, :] for b in range(3)) for d in range(3)]
        u_stack = jnp.concatenate(
            [sum(f9[:, 3 * c + d: 3 * c + d + 1] * z[d] for d in range(3)) * vol_lane
             for c in range(3)], axis=0)
        dots = pk._dot(u_stack, sr)
        termj = jnp.zeros_like(f9[:, :3])
        for c in range(3):
            block = dots[c * rows:(c + 1) * rows]
            termj = termj + jnp.stack(
                [block[:, 9 + 3 * a + c] for a in range(3)], axis=1)
        svnw = jnp.concatenate([jnp.sum(nw[b] * vol_lane, axis=1, keepdims=True)
                                for b in range(3)], axis=1)  # (rows, 3)
        term_i = jnp.concatenate(
            [sum(m9[:, 3 * a + b: 3 * a + b + 1] * svnw[:, b: b + 1]
                 for b in range(3)) for a in range(3)], axis=1)
        f_ref[0] = 0.5 * vol_rows * (termj + term_i)

    def va(c):
        f = pl.pallas_call(
            functools.partial(kernel_a, h=h),
            grid=(t,),
            in_specs=[
                pl.BlockSpec((1, 3, rows), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, 3, slab), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, 1, slab), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, rows, 9), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, rows, 9), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, slab, 32), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, 32, slab), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, rows, 1), lambda i: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, rows, 3), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((t, rows, 3), jnp.float32),
        )(restT_rows, restT_slab, vol_slab, c, m9, sr_slab, srT_slab, vol_rows)
        return consume(c, f)

    # ---------------- variant B: A + TB tiles per instance via fori_loop
    def kernel_b(rr_ref, rs_ref, vs_ref, f9_ref, m9_ref, sr_ref, srT_ref,
                 vr_ref, f_ref, *, h, tb):
        def body(i, _):
            rr = rr_ref[i]
            f9 = f9_ref[i]
            m9 = m9_ref[i]
            vol_rows = vr_ref[i]
            rs = rs_ref[i]
            dx, w, gfac = pk._pair_coeffs(rr, rs, h)
            vol_lane = vs_ref[i]
            sr = sr_ref[i]
            sT = srT_ref[i]
            nw = [gfac * dx[b] for b in range(3)]
            z = [sum(nw[b] * sT[3 * d + b][None, :] for b in range(3))
                 for d in range(3)]
            u_stack = jnp.concatenate(
                [sum(f9[:, 3 * c + d: 3 * c + d + 1] * z[d] for d in range(3))
                 * vol_lane for c in range(3)], axis=0)
            dots = pk._dot(u_stack, sr)
            termj = jnp.zeros_like(f9[:, :3])
            for c in range(3):
                block = dots[c * rows:(c + 1) * rows]
                termj = termj + jnp.stack(
                    [block[:, 9 + 3 * a + c] for a in range(3)], axis=1)
            svnw = jnp.concatenate(
                [jnp.sum(nw[b] * vol_lane, axis=1, keepdims=True)
                 for b in range(3)], axis=1)
            term_i = jnp.concatenate(
                [sum(m9[:, 3 * a + b: 3 * a + b + 1] * svnw[:, b: b + 1]
                     for b in range(3)) for a in range(3)], axis=1)
            f_ref[i] = 0.5 * vol_rows * (termj + term_i)
            return 0
        jax.lax.fori_loop(0, tb, body, 0)

    def vb(c):
        tpad = -(-t // TB) * TB
        def padt(a):
            return jnp.pad(a, [(0, tpad - t)] + [(0, 0)] * (a.ndim - 1))
        f = pl.pallas_call(
            functools.partial(kernel_b, h=h, tb=TB),
            grid=(tpad // TB,),
            in_specs=[
                pl.BlockSpec((TB, 3, rows), lambda i: (i, 0, 0)),
                pl.BlockSpec((TB, 3, slab), lambda i: (i, 0, 0)),
                pl.BlockSpec((TB, 1, slab), lambda i: (i, 0, 0)),
                pl.BlockSpec((TB, rows, 9), lambda i: (i, 0, 0)),
                pl.BlockSpec((TB, rows, 9), lambda i: (i, 0, 0)),
                pl.BlockSpec((TB, slab, 32), lambda i: (i, 0, 0)),
                pl.BlockSpec((TB, 32, slab), lambda i: (i, 0, 0)),
                pl.BlockSpec((TB, rows, 1), lambda i: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((TB, rows, 3), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((tpad, rows, 3), jnp.float32),
        )(padt(restT_rows), padt(restT_slab), padt(vol_slab), padt(c), padt(m9),
          padt(sr_slab), padt(srT_slab), padt(vol_rows))[:t]
        return consume(c, f)

    wanted = set(args.variants.split(","))
    if "A" in wanted:
        timed("A srT-precomputed", va, f9)
    if "B" in wanted:
        timed(f"B A+fori TB={TB}", vb, f9)


if __name__ == "__main__":
    main()
