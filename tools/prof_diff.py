#!/usr/bin/env python
"""Differential step-cost decomposition for the sparse-pallas eval.

Each variant runs the FULL elastic eval inside a carry-dependent lax.scan,
but with selected pieces made loop-invariant (computed from rest positions
outside the loop) so XLA hoists them out; the delta to the full eval is that
piece's in-context cost.  This sidesteps two measurement traps on the axon
tunnel (PERF_NOTES.md): ~25ms per-dispatch overhead, and LICM silently
deleting probe bodies that don't depend on the scan carry.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DISPATCH_OVERHEAD = 0.0249  # s, measured empty-scan dispatch cost


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--particles", type=int, default=100_000)
    ap.add_argument("--rows", type=int, default=32)
    ap.add_argument("--iters", type=int, default=100)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from softbody_tpu import warp_parity
    from softbody_tpu.geometry.shapes import inflatable_sphere, suggest_h
    from softbody_tpu.ops import mat3
    from softbody_tpu.ops.elasticity import compute_ratio
    from softbody_tpu.ops.pallas.packed import (
        forces_warp_packed, moments_packed, pack, gather_packed,
    )
    from softbody_tpu.sim.blocked import _mid_section
    from softbody_tpu.sim.sparse import build_sparse_scene, _chunks_for

    probe_n = 1000
    probe, _ = inflatable_sphere(n_outer=probe_n, radius=0.05)
    a = (len(probe) - probe_n) / probe_n**1.5
    n_outer = probe_n
    for _ in range(40):
        n_outer = max(((args.particles - n_outer) / a) ** (2 / 3), 8.0)
    pts, out_num = inflatable_sphere(n_outer=max(int(n_outer), 8), radius=0.05)
    n = len(pts)
    cfg = warp_parity().replace(
        h=suggest_h(pts, 32), dtype="float32", dt=1e-6, target_frames=2,
        backend="pallas",
    )
    t0 = time.perf_counter()
    scene, sop = build_sparse_scene(pts, cfg, out_num=out_num, rows=args.rows)
    sb = scene.blocked
    pairs = sum(b.n_tiles * b.slab_len * sb.rows for b in sb.buckets)
    print(f"N={n} slots={sb.n_slots} tiles={sb.n_tiles} "
          f"build={time.perf_counter()-t0:.1f}s pairs/eval={pairs:.3e} "
          f"({pairs/n:.0f}/particle)", flush=True)

    t, rows = sb.n_tiles, sb.rows
    m = t * rows
    mats = scene.materials
    x = jnp.zeros(sb.n_slots, jnp.float32)
    ratio_const = compute_ratio(x, cfg)
    pos0 = scene.rest_position

    np.asarray(jnp.zeros(()))  # sync mode

    def timed(name, fn):
        @jax.jit
        def run(p):
            def body(c, _):
                return fn(c), None
            out, _ = jax.lax.scan(body, p, None, length=args.iters)
            return out
        r = run(pos0)
        jax.block_until_ready(r)
        best = np.inf
        for _ in range(3):
            tt = time.perf_counter()
            r = run(pos0)
            jax.block_until_ready(r)
            best = min(best, time.perf_counter() - tt)
        per = (best - DISPATCH_OVERHEAD) / args.iters * 1e3
        print(f"{name:36s} {per:8.3f} ms/iter", flush=True)
        return per

    # ---- loop-invariant precomputes (from pos0)
    pos_rows0 = pos0[:m].reshape(t, rows, 3)
    pos_packed0 = pack(pos0, 3, 16, 8)
    pos_slabs0 = [gather_packed(pos_packed0, b.gidx8, b.slab_len, 16)
                  for b in sb.buckets]

    def eval_pipeline(p, *, gathers_live=True, k1_live=True, mid_live=True,
                      k2_live=True, sr_gather_live=True):
        """The elastic_forces_sparse body with switchable live/hoisted pieces."""
        pos_rows = p[:m].reshape(t, rows, 3) if k1_live else pos_rows0
        pos_slots = p if gathers_live else pos0
        a_parts, y_parts = [], []
        for bi, b in enumerate(sb.buckets):
            A9b, Y9b = moments_packed(
                b.restT_rows, b.restT_slab, b.mass_slab, b.vol_slab,
                b.rows_of(pos_rows), pos_slots, b.gidx8,
                cfg.h, False,
            )
            a_parts.append(A9b)
            y_parts.append(Y9b)
        A9 = jnp.concatenate(a_parts, axis=0)
        Y9 = jnp.concatenate(y_parts, axis=0)
        if mid_live and not k1_live:
            # keep mid live even when K1 is hoisted
            A9 = A9 + p[0, 0] * 1e-30
        A = mat3.from_trailing(A9.reshape(m, 3, 3))
        Y = mat3.from_trailing(Y9.reshape(m, 3, 3))
        R, F, S, M, G, vol_m = _mid_section(A, Y, ratio_const, mats, scene,
                                            cfg, m)
        vol_rows = vol_m.reshape(t, rows)
        F9_rows = mat3.to_trailing(F).reshape(t, rows, 9)
        M9_rows = mat3.to_trailing(M).reshape(t, rows, 9)
        if not k2_live:
            return p + 1e-30 * (jnp.zeros_like(p).at[:m].set(F9_rows.reshape(m, 9)[:, :3]))
        sr15 = jnp.stack(
            [S[0, 0], S[0, 1], S[0, 2], S[1, 1], S[1, 2], S[2, 2],
             R[0, 0], R[1, 0], R[2, 0], R[0, 1], R[1, 1], R[2, 1],
             R[0, 2], R[1, 2], R[2, 2]], axis=-1)
        sr_slots = jnp.zeros((sb.n_slots, 15), p.dtype).at[:m].set(sr15)
        f_parts = []
        for b in sb.buckets:
            f_parts.append(forces_warp_packed(
                b.restT_rows, b.restT_slab, b.vol_slab,
                b.rows_of(F9_rows),
                b.rows_of(M9_rows), sr_slots,
                b.rows_of(vol_rows), b.gidx8,
                cfg.h, False, chunks=_chunks_for(b.slab_len),
            ))
        f = jnp.concatenate(f_parts, axis=0)
        return p + 1e-30 * (jnp.zeros_like(p).at[:m].set(f.reshape(m, 3)))

    full = timed("full eval", lambda p: eval_pipeline(p))
    ng = timed("pos-gather hoisted", lambda p: eval_pipeline(p, gathers_live=False))
    print(f"  -> pos slab gather in context: {full-ng:.3f} ms", flush=True)
    nk2 = timed("K2 skipped", lambda p: eval_pipeline(p, k2_live=False))
    print(f"  -> K2 (incl sr pack+gather): {full-nk2:.3f} ms", flush=True)
    nk1 = timed("K1+gathers hoisted, mid+K2 live",
                lambda p: eval_pipeline(p, k1_live=False, gathers_live=False))
    print(f"  -> K1+pos-gather in context: {full-nk1:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
