#!/usr/bin/env python
"""A/B probe: BlockSpec-pipelined operand staging vs MANUAL double-buffered
DMA for the sparse-layout pair kernels (real kernel bodies, synthetic
single-bucket data at 100k-like shapes).

Motivation (PERF_NOTES.md): the step is staging-dominated — ~1.46 us/tile of
per-tile operand staging at ~62 GB/s effective, while raw dynamic-offset DMA
probes sustain 300-430 GB/s with many outstanding copies.  Hypothesis: the
automatic BlockSpec pipeline pays per-block latency serially; issuing ALL of
a grid step's operand copies together (one sem each, wait at compute) hides
them behind compute.

Usage: python tools/stage_probe.py [--tiles 3758] [--slab 640] [--iters 30]
"""

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiles", type=int, default=3760)  # divisible by TBM=8
    ap.add_argument("--slab", type=int, default=640)
    ap.add_argument("--rows", type=int, default=32)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--tb", type=int, default=2)
    ap.add_argument("--only", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import softbody_tpu.ops.pallas.pair_kernels as pk

    t, slab, rows, TB = args.tiles, args.slab, args.rows, args.tb
    assert t % TB == 0
    key = jax.random.PRNGKey(0)
    np.asarray(jnp.zeros(()))  # sync mode

    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    restT_rows = jax.random.normal(k1, (t, 3, rows), jnp.float32) * 0.01
    static_slab = jax.random.normal(k2, (t, 5, slab), jnp.float32) * 0.01
    pos_slabT = jax.random.normal(k3, (t, 3, slab), jnp.float32) * 0.01
    srT_slab = jax.random.normal(k4, (t, 16, slab), jnp.float32) * 0.01
    fm_rows = jax.random.normal(k5, (t, rows, 19), jnp.float32) * 0.01
    h = 0.002

    def timeit(name, fn, *a):
        if args.only and args.only not in name:
            return
        try:
            out = jax.block_until_ready(fn(*a))
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fn(*a)
            jax.block_until_ready(out)
            ms = (time.perf_counter() - t0) / args.iters * 1e3
            print(f"{name:30s}: {ms:8.3f} ms  ({ms / t * 1e3:6.3f} us/tile)")
        except Exception as e:
            print(f"{name:30s}: FAILED {str(e).splitlines()[0][:110]}")

    # ---------------- A: current BlockSpec pipeline (real wrappers)
    @jax.jit
    def k1_blockspec(rr, st, ps):
        return pk._moments_fwd_impl(rr, st, ps, h, False)

    # forces v2 forward, BlockSpec (mirror of _forces_warp_bwd_impl)
    @functools.partial(jax.jit, static_argnums=(4,))
    def k2_blockspec(rr, st, fm, srT, chunks=pk._WARP_CHUNKS):
        kernel = pk._batched(
            functools.partial(pk._forces_warp_kernel_v2, h=h,
                              chunks=chunks), 5)
        return pl.pallas_call(
            kernel,
            grid=(t // pk._TILE_BATCH,),
            in_specs=pk._tile_specs([
                (3, rows), (5, slab), (rows, 19), (16, slab)]),
            out_specs=pk._tile_specs([(rows, 3)])[0],
            out_shape=jax.ShapeDtypeStruct((t, rows, 3), jnp.float32),
        )(rr, st, fm, srT)

    # ---------------- B: manual double-buffered DMA of the big slab operands.
    # Mosaic DMA constraints (measured): every dim of a sliced memref must
    # respect its tiling — lane dim 128-multiples, sublane dim 8-multiples,
    # and INTERNAL padding breaks even full-range slices: a (t, 5, slab)
    # source cannot be sliced at all (5 -> 8 padded rows).  So slab sources
    # are 2D-FLATTENED to (t*K, slab) and sliced in (TB*K)-row blocks, which
    # needs TB*K % 8 == 0 -> TB=8 for K in {3, 5}.
    TBM = 8

    class _SubFlat:
        """Present rows [bi*K, (bi+1)*K) of a 2D (TB*K, slab) ref as a
        (1, K, slab)-leading ref (kernel bodies index [0, r, c])."""

        def __init__(self, ref, bi, K):
            self._ref = ref
            self._o = bi * K
            self._K = K

        @property
        def shape(self):
            return (1, self._K) + tuple(self._ref.shape[1:])

        def _tr_row(self, r):
            if isinstance(r, slice):
                r0 = 0 if r.start is None else r.start
                r1 = self._K if r.stop is None else r.stop
                return slice(self._o + r0, self._o + r1)
            return self._o + r

        def __getitem__(self, idx):
            if isinstance(idx, tuple):
                assert idx[0] == 0
                rest = idx[2:]
                return self._ref[(self._tr_row(idx[1]),) + rest]
            assert idx == 0
            return self._ref[self._tr_row(slice(None))]

    def manual_call(body, srcs, Ks, out_specs_shapes, n_out):
        """srcs flagged with K != None are 2D (t*K, slab) manual-DMA slabs;
        K None -> BlockSpec-staged (t, ...) operands."""
        n_in = len(srcs)
        man_ids = [k for k, K in enumerate(Ks) if K is not None]
        n_man = len(man_ids)

        def kernel(*refs):
            src_refs = refs[:n_in]
            out_refs = refs[n_in:n_in + n_out]
            # two separate scratch buffers per manual operand (a fused
            # (2, ...) buffer would need a sublane-tiled slice Mosaic rejects)
            flat = refs[n_in + n_out:n_in + n_out + 2 * n_man]
            bufs = [flat[2 * k:2 * k + 2] for k in range(n_man)]
            sems = refs[-1]
            i = pl.program_id(0)
            nt = pl.num_programs(0)

            def copies(blk, par):
                return [
                    pltpu.make_async_copy(
                        src_refs[mk].at[
                            pl.ds(blk * TBM * Ks[mk], TBM * Ks[mk])],
                        bufs[k][par],
                        sems.at[par, k])
                    for k, mk in enumerate(man_ids)
                ]

            @pl.when(i == 0)
            def _():
                for c in copies(0, 0):
                    c.start()

            @pl.when(i + 1 < nt)
            def _():
                for par in (0, 1):
                    @pl.when((i + 1) % 2 == par)
                    def _(par=par):
                        for c in copies(i + 1, par):
                            c.start()

            for par in (0, 1):
                @pl.when(i % 2 == par)
                def _(par=par):
                    for c in copies(i, par):
                        c.wait()
                    for bi in range(TBM):
                        ins = []
                        mi = 0
                        for k in range(n_in):
                            if Ks[k] is not None:
                                ins.append(_SubFlat(bufs[mi][par], bi, Ks[k]))
                                mi += 1
                            else:
                                ins.append(pk._Sub(src_refs[k], bi))
                        outs = [pk._Sub(o, bi) for o in out_refs]
                        body(*ins, *outs)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(t // TBM,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY) if Ks[k] is not None
                else pl.BlockSpec(
                    (TBM,) + tuple(srcs[k].shape[1:]),
                    lambda i_, nd=srcs[k].ndim - 1: (i_,) + (0,) * nd,
                    memory_space=pltpu.VMEM)
                for k in range(n_in)
            ],
            out_specs=[
                pl.BlockSpec((TBM,) + s, lambda i_, s=s: (i_,) + (0,) * len(s),
                             memory_space=pltpu.VMEM)
                for s in out_specs_shapes
            ],
            scratch_shapes=[
                pltpu.VMEM((TBM * Ks[k],) + tuple(srcs[k].shape[1:]),
                           srcs[k].dtype)
                for k in man_ids for _par in (0, 1)
            ] + [pltpu.SemaphoreType.DMA((2, max(n_man, 1)))],
        )
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((t,) + s, jnp.float32)
                       for s in out_specs_shapes],
        )(*srcs)

    # 2D slab copies made OUTSIDE the timed jits (in production the gather /
    # builders emit 2D directly; here a reshape would bill variant B an
    # artificial relayout)
    static2 = jax.block_until_ready(static_slab.reshape(t * 5, slab))
    pos2 = jax.block_until_ready(pos_slabT.reshape(t * 3, slab))
    srT2 = jax.block_until_ready(srT_slab.reshape(t * 16, slab))

    @jax.jit
    def k1_manual(rr, st2, ps2):
        body = functools.partial(pk._moments_kernel, h=h)
        return manual_call(body, [rr, st2, ps2], [None, 5, 3],
                           [(rows, 18)], 1)[0]

    @jax.jit
    def k2_manual(rr, st2, fm, srT2):
        body = functools.partial(pk._forces_warp_kernel_v2, h=h,
                                 chunks=pk._WARP_CHUNKS)
        return manual_call(body, [rr, st2, fm, srT2],
                           [None, 5, None, 16], [(rows, 3)], 1)[0]

    # correctness cross-check (full size, cheap relative to timing loops)
    a1 = jax.block_until_ready(
        k1_blockspec(restT_rows, static_slab, pos_slabT))
    b1 = jax.block_until_ready(k1_manual(restT_rows, static2, pos2))
    err = float(jnp.abs(a1 - b1).max())
    print(f"K1 manual vs blockspec max|diff|: {err:.3e}")
    a2 = jax.block_until_ready(
        k2_blockspec(restT_rows, static_slab, fm_rows, srT_slab))
    b2 = jax.block_until_ready(k2_manual(restT_rows, static2, fm_rows, srT2))
    err2 = float(jnp.abs(a2 - b2).max())
    print(f"K2 manual vs blockspec max|diff|: {err2:.3e}")

    timeit("K1 blockspec", k1_blockspec, restT_rows, static_slab, pos_slabT)
    timeit("K1 manual-dma", k1_manual, restT_rows, static2, pos2)
    timeit("K2 blockspec", k2_blockspec, restT_rows, static_slab, fm_rows,
           srT_slab)
    timeit("K2 manual-dma", k2_manual, restT_rows, static2, fm_rows, srT2)
    # chunk-count sweep: lane-slice offsets k*L are Mosaic-relayout-free only
    # when 128-multiples (slab=640: chunks=5 -> L=128 all aligned; chunks=1
    # -> no slicing; chunks=3 -> L=213 MISALIGNED)
    for ch in (1, 2, 5):
        if slab % ch == 0:
            timeit(f"K2 blockspec chunks={ch}", k2_blockspec, restT_rows,
                   static_slab, fm_rows, srT_slab, ch)


if __name__ == "__main__":
    main()
