#!/usr/bin/env python
"""Mosaic feasibility + cost probes for the lane-major row-side kernel design
(v5): row-side operands/outputs staged as (k, TB*rows=128) blocks instead of
128-lane-padded (rows, k<128) blocks.

Each probe is a separate compile; failures print and continue.

Usage: python tools/layout_probe.py [--tiles 2048] [--iters 50] [--only NAME]
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiles", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--only", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t = args.tiles
    rows = 32
    key = jax.random.PRNGKey(0)
    np.asarray(jnp.zeros(()))  # sync mode (PERF_NOTES measurement discipline)

    def timeit(fn, *a):
        out = fn(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*a)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / args.iters * 1e3

    def run(name, make):
        if args.only and args.only not in name:
            return
        try:
            fn, a = make()
            ms = timeit(fn, *a)
            print(f"{name:28s}: {ms:8.3f} ms  ({ms / t * 1e3:6.3f} us/tile)")
        except Exception as e:
            print(f"{name:28s}: FAILED {str(e).splitlines()[0][:100]}")

    x_km19 = jax.random.normal(key, (19, t * rows), jnp.float32)
    x_rm19 = jax.random.normal(key, (t, rows, 19), jnp.float32)

    # -------- staging cost: rows-major (t, 32, 19) vs lane-major (19, m)
    def mk_stage_rm():
        def k(x_ref, o_ref):
            o_ref[0] = x_ref[0] * 2.0

        @jax.jit
        def f(x):
            return pl.pallas_call(
                k, grid=(t,),
                in_specs=[pl.BlockSpec((1, rows, 19), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, rows, 19), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((t, rows, 19), jnp.float32),
            )(x)
        return f, (x_rm19,)

    def mk_stage_km():
        def k(x_ref, o_ref):
            o_ref[...] = x_ref[...] * 2.0

        @jax.jit
        def f(x):
            return pl.pallas_call(
                k, grid=(t // 4,),
                in_specs=[pl.BlockSpec((19, 128), lambda i: (0, i),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((19, 128), lambda i: (0, i),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((19, t * rows), jnp.float32),
            )(x)
        return f, (x_km19,)

    # -------- lane slice read at 32-align + use
    def mk_lane_slice_read():
        def k(x_ref, o_ref):
            acc = x_ref[:, 0:32] * 1.0
            for i in range(1, 4):
                acc = acc + x_ref[:, i * 32:(i + 1) * 32]
            o_ref[...] = acc

        @jax.jit
        def f(x):
            return pl.pallas_call(
                k, grid=(t // 4,),
                in_specs=[pl.BlockSpec((19, 128), lambda i: (0, i),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((19, 32), lambda i: (0, i),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((19, (t // 4) * 32), jnp.float32),
            )(x)
        return f, (x_km19,)

    # -------- lane slice write at 32-align
    def mk_lane_slice_write():
        def k(x_ref, o_ref):
            for i in range(4):
                o_ref[:, i * 32:(i + 1) * 32] = x_ref[:, i * 32:(i + 1) * 32] * 2.0

        @jax.jit
        def f(x):
            return pl.pallas_call(
                k, grid=(t // 4,),
                in_specs=[pl.BlockSpec((19, 128), lambda i: (0, i),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((19, 128), lambda i: (0, i),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((19, t * rows), jnp.float32),
            )(x)
        return f, (x_km19,)

    # -------- in-kernel 2D transpose (19, 32) -> (32, 19)
    def mk_transpose_in():
        def k(x_ref, o_ref):
            for i in range(4):
                blk = x_ref[:, i * 32:(i + 1) * 32]
                o_ref[i * 32:(i + 1) * 32, :] = blk.T

        @jax.jit
        def f(x):
            return pl.pallas_call(
                k, grid=(t // 4,),
                in_specs=[pl.BlockSpec((19, 128), lambda i: (0, i),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((128, 19), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((t * rows, 19), jnp.float32),
            )(x)
        return f, (x_km19,)

    # -------- (32, 3) result -> (3, 32) lane-major output
    def mk_transpose_out():
        y = jax.random.normal(key, (t * rows, 3), jnp.float32)

        def k(x_ref, o_ref):
            for i in range(4):
                blk = x_ref[i * 32:(i + 1) * 32, :]
                o_ref[:, i * 32:(i + 1) * 32] = blk.T

        @jax.jit
        def f(x):
            return pl.pallas_call(
                k, grid=(t // 4,),
                in_specs=[pl.BlockSpec((128, 3), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((3, 128), lambda i: (0, i),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((3, t * rows), jnp.float32),
            )(y)
        return f, (y,)

    # -------- broadcast a lane vector to sublanes: (1, 32) -> (32, S) use
    def mk_lane_to_sublane():
        S = 128

        def k(x_ref, o_ref):
            v = x_ref[0:1, 0:32]                      # (1, 32) lane vector
            col = v.T                                  # (32, 1)
            o_ref[...] = col * jnp.ones((1, S), jnp.float32)

        @jax.jit
        def f(x):
            return pl.pallas_call(
                k, grid=(t,),
                in_specs=[pl.BlockSpec((19, 32), lambda i: (0, i),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((rows, S), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((t * rows, S), jnp.float32),
            )(x)
        return f, (x_km19,)

    # -------- reshape (3, 192) -> (3, 6, 32) lane split
    def mk_lane_split():
        z = jax.random.normal(key, (t, 3, 192), jnp.float32)

        def k(x_ref, o_ref):
            v = x_ref[0]                               # (3, 192)
            o_ref[0] = v.reshape(3, 6, 32)

        @jax.jit
        def f(x):
            return pl.pallas_call(
                k, grid=(t,),
                in_specs=[pl.BlockSpec((1, 3, 192), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, 3, 6, 32), lambda i: (i, 0, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((t, 3, 6, 32), jnp.float32),
            )(x)
        return f, (z,)

    # -------- DMA a (16, W) lane-dim window at DYNAMIC offset from (16, n) HBM
    def mk_dma_window(align, W=512, n_dma=9):
        n_src = 1 << 20
        src = jax.random.normal(key, (16, n_src), jnp.float32)
        rng = np.random.default_rng(0)
        offs = jnp.asarray(
            (rng.integers(0, (n_src - W) // align, (t, n_dma)) * align)
            .astype(np.int32))

        def k(offs_ref, src_ref, o_ref, buf, sems):
            i = pl.program_id(0)
            for r in range(n_dma):
                s = offs_ref[i, r]
                pltpu.make_async_copy(
                    src_ref.at[:, pl.ds(s, W)],
                    buf.at[:, pl.ds(r * W, W)],
                    sems.at[r],
                ).start()
            for r in range(n_dma):
                s = offs_ref[i, r]
                pltpu.make_async_copy(
                    src_ref.at[:, pl.ds(s, W)],
                    buf.at[:, pl.ds(r * W, W)],
                    sems.at[r],
                ).wait()
            o_ref[...] = jnp.sum(buf[...], axis=1, keepdims=True)

        @jax.jit
        def f(offs, src):
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(t,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec((16, 1), lambda i, *_: (0, i),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((16, n_dma * W), jnp.float32),
                    pltpu.SemaphoreType.DMA((n_dma,)),
                ],
            )
            return pl.pallas_call(
                k, grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((16, t), jnp.float32),
            )(offs, src)
        return f, (offs, src)

    run("stage (t,32,19) rows-major", mk_stage_rm)
    run("stage (19,128) lane-major", mk_stage_km)
    run("lane-slice read @32", mk_lane_slice_read)
    run("lane-slice write @32", mk_lane_slice_write)
    run("transpose (19,32)->(32,19)", mk_transpose_in)
    run("transpose (32,3)->(3,32)", mk_transpose_out)
    run("lane->sublane (1,32)->(32,1)", mk_lane_to_sublane)
    run("lane split (3,192)->(3,6,32)", mk_lane_split)
    run("dma win @8 (9x512)", lambda: mk_dma_window(8))
    run("dma win @32 (9x512)", lambda: mk_dma_window(32))
    run("dma win @128 (9x512)", lambda: mk_dma_window(128))
    run("dma win @8 (1x512)", lambda: mk_dma_window(8, n_dma=1))
    run("dma win @8 (18x512)", lambda: mk_dma_window(8, n_dma=18))


if __name__ == "__main__":
    main()
