#!/usr/bin/env python
"""Decompose the sparse-pallas step cost on the real TPU.

Measurement discipline (PERF_NOTES.md): force sync mode with one tiny D2H,
then amortize each piece inside a single dispatch with a lax.scan of >= 30
iterations.  Pieces are composed as position -> position maps so the scan
carry shape stays fixed.
"""

import argparse
import os
import sys
import time

import numpy as np

# run from anywhere without PYTHONPATH (which breaks axon plugin discovery)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from softbody_tpu.utils.hostmem import enable_heap_reuse

    enable_heap_reuse()
    ap = argparse.ArgumentParser()
    ap.add_argument("--particles", type=int, default=100_000)
    ap.add_argument("--rows", type=int, default=32)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--mode", choices=["warp", "taichi"], default="warp")
    ap.add_argument("--pieces", default="",
                    help="comma list: integ,gather,srgather,k1,k1mid,k2,elastic,step")
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
    from softbody_tpu.sim.rollout import rollout, step
    from softbody_tpu.sim.sparse import build_sparse_scene, elastic_forces_sparse, _chunks_for
    from softbody_tpu.core.types import ParticleState

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
        backend="pallas", pair_def_grad="i" if args.mode == "warp" else "j",
    )
    t0 = time.perf_counter()
    scene, sop = build_sparse_scene(pts, cfg, out_num=out_num, rows=args.rows)
    sb = scene.blocked
    print(f"N={n} slots={sb.n_slots} tiles={sb.n_tiles} "
          f"buckets={[(b.n_tiles, b.slab_len) for b in sb.buckets]} "
          f"build={time.perf_counter()-t0:.1f}s")
    pairs = sum(b.n_tiles * b.slab_len * sb.rows for b in sb.buckets)
    print(f"pairs/eval={pairs:.3e} ({pairs/n:.0f}/particle)")

    t, rows = sb.n_tiles, sb.rows
    m = t * rows
    dtype = jnp.float32
    x = jnp.zeros(sb.n_slots, dtype)
    ratio = compute_ratio(x, cfg)
    mats = scene.materials
    pos0 = scene.rest_position

    # sync mode
    np.asarray(jnp.zeros(()))

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
        per = best / args.iters * 1e3
        print(f"{name:28s} {per:8.3f} ms/iter")
        return per

    # --- full elastic eval
    def full_eval(p):
        f = elastic_forces_sparse(p, ratio, mats, scene, cfg)
        return p + 1e-12 * f

    rs6 = sb.rs6

    def moments_all(p):
        parts = [moments_packed(
            b.restT_rows, b.static_slab, b.static2,
            p, b.gidx8, cfg.h, False) for b in sb.buckets]
        return jnp.concatenate(parts, axis=0).reshape(m, 18)

    # --- K1 only (raw moment dots per bucket, combined)
    def k1_only(p):
        ay = moments_all(p)
        return p.at[:m].add(1e-12 * ay[:, :3])

    # --- K1 + mid-section
    def k1_mid(p):
        ay = moments_all(p)
        pos_m = p[:m]
        A_raw = mat3.transpose3(mat3.from_trailing(ay[:, :9].reshape(m, 3, 3)))
        Y_raw = mat3.transpose3(mat3.from_trailing(ay[:, 9:18].reshape(m, 3, 3)))
        A = mat3.pack([[A_raw[a, b] - pos_m[:, a] * rs6[:, b]
                        for b in range(3)] for a in range(3)])
        Y = mat3.pack([[Y_raw[a, b] - pos_m[:, a] * rs6[:, 3 + b]
                        for b in range(3)] for a in range(3)])
        R, F, S, M, G, vol_m = _mid_section(A, Y, ratio, mats, scene, cfg, m)
        return p.at[:m].add(1e-12 * mat3.to_trailing(M).reshape(m, 9)[:, :3])

    # --- pos slab gather only (the packed take per bucket)
    def gather_only(p):
        packed = pack(p, 3, 16, 8)
        acc = 0.0
        for b in sb.buckets:
            g = gather_packed(packed, b.gidx8, b.slab_len, 16)
            acc = acc + jnp.sum(g[:, ::64, 0])
        return p + 1e-18 * acc

    # --- S+R slab gathers (2x 16 f/slot via gidx8)
    def sr_gather_only(p):
        s9 = jnp.concatenate([p, p, p], axis=1)           # (ns, 9)
        packed = pack(s9, 9, 16, 8)
        acc = 0.0
        for b in sb.buckets:
            g = gather_packed(packed, b.gidx8, b.slab_len, 16)
            g2 = gather_packed(packed, b.gidx8, b.slab_len, 16)
            acc = acc + jnp.sum(g[:, ::64, 0]) + jnp.sum(g2[:, ::64, 1])
        return p + 1e-18 * acc

    # --- K2 warp forces only (fixed cheap F/M/SR derived from p)
    def k2_only(p):
        from softbody_tpu.ops.pallas.packed import (
            pack_components, rows_from_components,
        )

        pm = p[:m]
        comps19 = [pm[:, k % 3] for k in range(18)] + [mats.volume[:m]]
        fm_rows = rows_from_components(comps19, t, rows)
        sr_packed = pack_components(
            [p[:, k % 3] for k in range(15)], 16, 8, n_total=sb.n_slots)
        f_parts = []
        for b in sb.buckets:
            f_parts.append(forces_warp_packed(
                b.restT_rows, b.static_slab,
                b.rows_of(fm_rows), sr_packed, b.gidx8,
                cfg.h, False, chunks=_chunks_for(b.slab_len),
            ))
        f = jnp.concatenate(f_parts, axis=0)
        return p.at[:m].add(1e-12 * f.reshape(m, 3))

    # --- integrator shell without elastic forces
    def integ_only(p):
        vel = jnp.zeros_like(p)
        fz = jnp.zeros_like(p)
        st = ParticleState(p, vel, fz)
        cfg_g = cfg.replace(backend="gather")
        # emulate: total_force + 2x position update without _elastic
        from softbody_tpu.sim.rollout import total_force
        f1 = total_force(p, vel, fz, mats, cfg, scene)
        pn = p + (cfg.dt * vel + 0.5 * cfg.dt**2 * f1 / mats.mass[:, None]) * mats.free
        return pn

    # --- full step: carry the WHOLE ParticleState through the scan.  A
    # position-only carry lets XLA dead-code-eliminate the elastic eval
    # (st2.position alone doesn't depend on it under the trapezoidal order).
    def timed_step(name):
        @jax.jit
        def run(p):
            st0 = ParticleState(p, jnp.zeros_like(p), jnp.zeros_like(p))

            def body(c, _):
                return step(c, ratio, scene, cfg), None

            out, _ = jax.lax.scan(body, st0, None, length=args.iters)
            return out.position
        r = run(pos0)
        jax.block_until_ready(r)
        best = np.inf
        for _ in range(3):
            tt = time.perf_counter()
            r = run(pos0)
            jax.block_until_ready(r)
            best = min(best, time.perf_counter() - tt)
        per = best / args.iters * 1e3
        print(f"{name:28s} {per:8.3f} ms/iter")
        return per

    def full_step(p):
        raise SystemExit("use timed_step")

    pieces = {
        "integ": ("integrator-shell", integ_only),
        "gather": ("pos-slab-gather", gather_only),
        "srgather": ("sr-slab-gather", sr_gather_only),
        "k1": ("K1 moments", k1_only),
        "k1mid": ("K1+mid", k1_mid),
        "k2": ("K2 warp forces", k2_only),
        "elastic": ("full elastic eval", full_eval),
    }
    sel = args.pieces.split(",") if args.pieces else list(pieces) + ["step"]
    for key in sel:
        if key == "step":
            per = timed_step("full step")
            print(f"-> {n / (per/1e3):.3e} particle-steps/s at N={n}")
        else:
            name, fn = pieces[key]
            timed(name, fn)


if __name__ == "__main__":
    main()
