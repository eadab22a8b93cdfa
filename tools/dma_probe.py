#!/usr/bin/env python
"""Microbenchmarks for the in-kernel-gather kernel design (v4):

1. relayout: in-kernel (L, 128) -> (16, 8L) field-major -> lane-major cost
2. dma: per-run manual DMA gather from an HBM packed source vs BlockSpec
   staging of a pre-gathered slab

Usage: python tools/dma_probe.py [--tiles 2048] [--groups 73] [--runs 12]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, *args, iters=50):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiles", type=int, default=2048)
    ap.add_argument("--groups", type=int, default=72)  # slab 576
    ap.add_argument("--runs", type=int, default=12)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t, L = args.tiles, args.groups
    slab = 8 * L
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (t, L, 128), jnp.float32)

    # force sync mode (see PERF_NOTES measurement discipline)
    np.asarray(jnp.zeros(()))

    # ---------------- 1. pass-through baseline
    def k_pass(x_ref, o_ref):
        o_ref[0] = x_ref[0]

    @jax.jit
    def f_pass(x):
        return pl.pallas_call(
            k_pass,
            grid=(t,),
            in_specs=[pl.BlockSpec((1, L, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, L, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((t, L, 128), jnp.float32),
        )(x)

    # ---------------- 2. in-kernel relayout (L,128) -> (16, 8L), variants
    def k_rel_a(x_ref, o_ref):
        v = x_ref[0]                          # (L, 128)
        y = v.reshape(L, 16, 8)
        y = jnp.transpose(y, (1, 0, 2)).reshape(16, slab)
        o_ref[0] = y

    def k_rel_b(x_ref, o_ref):
        v = x_ref[0]                          # (L, 128)
        # row f of target = sublane-flatten of the (L, 8) field-f slice
        o_ref[0] = jnp.concatenate(
            [v[:, 8 * f:8 * f + 8].reshape(1, slab) for f in range(16)], axis=0)

    def k_rel_c(x_ref, o_ref):
        v = x_ref[0]                          # (L, 128)
        y = v.reshape(L * 16, 8)              # unfold lanes into sublanes
        y = y.reshape(L, 16, 8)
        y = jnp.swapaxes(y, 0, 1).reshape(16, slab)
        o_ref[0] = y

    def make_rel(k):
        @jax.jit
        def f_rel(x):
            return pl.pallas_call(
                k,
                grid=(t,),
                in_specs=[pl.BlockSpec((1, L, 128), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, 16, slab), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((t, 16, slab), jnp.float32),
            )(x)
        return f_rel

    # ---------------- 3. per-run DMA gather from HBM
    n_src = 16384
    src = jax.random.normal(key, (n_src, 128), jnp.float32)
    R = args.runs
    rng = np.random.default_rng(0)
    # random run table: R runs per tile, total exactly L groups
    starts = np.zeros((t, R), np.int32)
    lens = np.zeros((t, R), np.int32)
    for i in range(t):
        cuts = np.sort(rng.choice(np.arange(1, L), R - 1, replace=False))
        ls = np.diff(np.concatenate([[0], cuts, [L]]))
        lens[i] = ls
        starts[i] = rng.integers(0, n_src - L, R).astype(np.int32)
    starts_j = jnp.asarray(starts)
    lens_j = jnp.asarray(lens)
    offs_j = jnp.asarray(np.concatenate(
        [np.zeros((t, 1), np.int32), np.cumsum(lens, 1)[:, :-1]], 1))

    def k_dma(starts_ref, lens_ref, offs_ref, src_ref, o_ref, buf, sems):
        i = pl.program_id(0)
        # issue all runs, then wait all
        for r in range(R):
            s = starts_ref[i, r]
            ln = lens_ref[i, r]
            off = offs_ref[i, r]
            pltpu.make_async_copy(
                src_ref.at[pl.ds(s, ln)],
                buf.at[pl.ds(off, ln)],
                sems.at[r],
            ).start()
        for r in range(R):
            s = starts_ref[i, r]
            ln = lens_ref[i, r]
            off = offs_ref[i, r]
            pltpu.make_async_copy(
                src_ref.at[pl.ds(s, ln)],
                buf.at[pl.ds(off, ln)],
                sems.at[r],
            ).wait()
        o_ref[0] = buf[...]

    @jax.jit
    def f_dma(starts, lens, offs, src):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(t,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((1, L, 128), lambda i, *_: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((L, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((R,)),
            ],
        )
        return pl.pallas_call(
            k_dma,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((t, L, 128), jnp.float32),
        )(starts, lens, offs, src)

    # ---------------- 4. XLA gather baseline (rows)
    gidx = jnp.asarray(rng.integers(0, n_src, (t, L)).astype(np.int32))

    @jax.jit
    def f_xla_gather(src, gidx):
        return jnp.take(src, gidx.reshape(-1), axis=0).reshape(t, L, 128)

    per_tile = lambda ms: ms / t * 1e3
    print(f"tiles={t} L={L} slab={slab} runs/tile={R}")

    def run(name, fn, *a):
        try:
            ms = timeit(fn, *a, iters=args.iters) * 1e3
            print(f"{name:16s}: {ms:8.3f} ms  ({per_tile(ms):6.3f} us/tile)")
        except Exception as e:
            print(f"{name:16s}: FAILED — {str(e).splitlines()[0][:120]}")

    run("pass-through", f_pass, x)
    run("relayout-a", make_rel(k_rel_a), x)
    run("relayout-b", make_rel(k_rel_b), x)
    run("relayout-c", make_rel(k_rel_c), x)
    run("dma gather", f_dma, starts_j, lens_j, offs_j, src)
    run("xla gather", f_xla_gather, src, gidx)


if __name__ == "__main__":
    main()
