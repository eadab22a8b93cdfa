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
    # Mosaic facts (measured 2026-08-18 on the v5e tunnel):
    #  * lane-dim HBM slice offsets must be PROVABLY divisible by 128: store
    #    offsets in units of 128 floats and multiply in-kernel (`offs*128`
    #    compiles; raw 8/32/128-aligned ints and `offs*8` fail "Failed to
    #    prove ... divisible by the tiling (128)").
    #  * the scalar-prefetch operand is lane-padded to 128 in SMEM (1 MB):
    #    a (t, 9) i32 table allocates t*128*4 B and OOMs SMEM at t=2048 —
    #    use a FLAT (t*n_dma,) table.
    def mk_dma_window(align, W=512, n_dma=9, sub=16):
        assert align % 128 == 0 and W % 128 == 0
        n_src = 1 << 20
        src = jax.random.normal(key, (sub, n_src), jnp.float32)
        rng = np.random.default_rng(0)
        offs = jnp.asarray(
            (rng.integers(0, (n_src - W) // align, t * n_dma)
             * (align // 128)).astype(np.int32))

        def k(offs_ref, src_ref, o_ref, buf, sems):
            i = pl.program_id(0)
            for r in range(n_dma):
                s = offs_ref[i * n_dma + r] * 128
                pltpu.make_async_copy(
                    src_ref.at[:, pl.ds(s, W)],
                    buf.at[:, pl.ds(r * W, W)],
                    sems.at[r],
                ).start()
            for r in range(n_dma):
                pltpu.make_async_copy(
                    src_ref.at[:, pl.ds(offs_ref[i * n_dma + r] * 128, W)],
                    buf.at[:, pl.ds(r * W, W)],
                    sems.at[r],
                ).wait()
            o_ref[0] = jnp.sum(
                buf[...].reshape(sub, n_dma * W // 128, 128), axis=1)

        @jax.jit
        def f(offs, src):
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(t,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec((1, sub, 128), lambda i, *_: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((sub, n_dma * W), jnp.float32),
                    pltpu.SemaphoreType.DMA((n_dma,)),
                ],
            )
            return pl.pallas_call(
                k, grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((t, sub, 128), jnp.float32),
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
    # -------- v6b gate: SUBLANE-dim windows from a slot-major (n, 128) source
    # (slots on sublanes, fields on lanes).  Mosaic sublane tiling is 8 for
    # f32, so offsets only need provable 8-divisibility (`offs*8`) — 8-slot
    # window granularity instead of 128.  Cost: 128-lane rows (512 B/slot).
    def mk_dma_swin(W=128, n_dma=9, lanes=128, dtype=jnp.float32):
        n_src = 1 << 18
        src = jax.random.normal(key, (n_src, lanes), jnp.float32).astype(dtype)
        sub = 16 if dtype == jnp.bfloat16 else 8
        rng = np.random.default_rng(0)
        offs = jnp.asarray(
            rng.integers(0, (n_src - W) // sub, t * n_dma).astype(np.int32))

        def k(offs_ref, src_ref, o_ref, buf, sems):
            i = pl.program_id(0)
            for r in range(n_dma):
                s = offs_ref[i * n_dma + r] * sub
                pltpu.make_async_copy(
                    src_ref.at[pl.ds(s, W), :],
                    buf.at[pl.ds(r * W, W), :],
                    sems.at[r],
                ).start()
            for r in range(n_dma):
                pltpu.make_async_copy(
                    src_ref.at[pl.ds(offs_ref[i * n_dma + r] * sub, W), :],
                    buf.at[pl.ds(r * W, W), :],
                    sems.at[r],
                ).wait()
            o_ref[0] = jnp.sum(
                buf[...].reshape(n_dma * W // 8, 8, lanes).astype(jnp.float32),
                axis=0)

        @jax.jit
        def f(offs, src):
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(t,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec((1, 8, lanes), lambda i, *_: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((n_dma * W, lanes), dtype),
                    pltpu.SemaphoreType.DMA((n_dma,)),
                ],
            )
            return pl.pallas_call(
                k, grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((t, 8, lanes), jnp.float32),
            )(offs, src)
        return f, (offs, src)

    # v6 gates: per-DMA issue cost and bandwidth of dynamic-offset lane
    # windows (all 128-slot aligned — the only granularity Mosaic accepts).
    run("dma win 9x128 sub16", lambda: mk_dma_window(128, W=128))
    run("dma win 9x256 sub16", lambda: mk_dma_window(128, W=256))
    run("dma win 9x512 sub16", lambda: mk_dma_window(128, W=512))
    run("dma win 9x1024 sub16", lambda: mk_dma_window(128, W=1024))
    run("dma win 1x512 sub16", lambda: mk_dma_window(128, n_dma=1))
    run("dma win 18x512 sub16", lambda: mk_dma_window(128, n_dma=18))
    run("dma win 9x512 sub8", lambda: mk_dma_window(128, sub=8))
    run("dma win 9x512 sub24", lambda: mk_dma_window(128, sub=24))
    run("dma swin 9x64xf32", lambda: mk_dma_swin(W=64))
    run("dma swin 9x128xf32", lambda: mk_dma_swin(W=128))
    run("dma swin 9x256xf32", lambda: mk_dma_swin(W=256))
    run("dma swin 9x128xbf16", lambda: mk_dma_swin(W=128, dtype=jnp.bfloat16))


if __name__ == "__main__":
    main()
