#!/usr/bin/env python
"""Multi-chip communication model for both SPMD paths (no multi-chip hardware
is available in this environment, so this quantifies exactly what each chip
must move per step and predicts scaling efficiency from the measured
single-chip step time).

Paths:
* gather backend + halo exchange (parallel/halo.py): per force eval each chip
  sends/receives its static halo blocks (2*hops*halo rows) twice (positions,
  then G slabs) via ppermute rings.
* sparse/pallas backend (parallel/sparse_shard.py): per force eval each chip
  all-gathers two packed sources — positions (8 f/slot) and [S|R] (16 f/slot)
  over the body slots m; received bytes per chip = (S-1)/S * m * 96 B.

ICI model (v5e): ~45 GB/s usable per link per direction, 1-D ring topology —
an all-gather of B bytes completes in B * (S-1)/S / 45e9 seconds; halo
ppermutes of b bytes per hop direction take b / 45e9 (both directions move in
parallel on a bidirectional ring).

Usage: python tools/comm_model.py [--ns 21000,112000,500000,1000000]
Writes a markdown table to stdout (paste into PERF_NOTES.md).
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ICI_BW = 45e9          # bytes/s per link per direction (v5e, public figures)
S = 8                  # modeled pod slice size


def body(n_target):
    from softbody_tpu.geometry.shapes import inflatable_sphere

    probe_n = 1000
    probe, _ = inflatable_sphere(n_outer=probe_n, radius=0.05)
    a = (len(probe) - probe_n) / probe_n**1.5
    n_outer = probe_n
    for _ in range(40):
        n_outer = max(((n_target - n_outer) / a) ** (2 / 3), 8.0)
    return inflatable_sphere(n_outer=max(int(n_outer), 8), radius=0.05)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ns", default="21000,50000,112000,500000,1000000")
    ap.add_argument("--halo-max", type=int, default=200_000,
                    help="largest N for the halo-plan build (gather backend)")
    ap.add_argument("--step-ns", type=float, default=74.0,
                    help="measured single-chip ns per particle-step (bench.py)")
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")

    from softbody_tpu import warp_parity
    from softbody_tpu.geometry.shapes import suggest_h
    from softbody_tpu.topology.sparse import build_sparse_layout

    rows_md = []
    print("| N | m slots | sparse AG MB/step/chip | t_comm ms | t_comp ms "
          "| eff (overlap) | sparse-halo MB | sp-halo eff "
          "| gather-halo MB | g-halo eff |")
    print("|---|---|---|---|---|---|---|---|---|---|")
    for n_s in args.ns.split(","):
        n_target = int(n_s)
        pts, out_num = body(n_target)
        n = len(pts)
        h = suggest_h(pts, 32)
        t0 = time.perf_counter()
        lay = build_sparse_layout(np.asarray(pts, np.float64), 2 * h,
                                  rows=32, n_shards=S)
        build_s = time.perf_counter() - t0
        m = lay.n_tiles * lay.rows
        # one force eval per trapezoidal step; two all-gathered sources
        bytes_recv = (S - 1) / S * m * (8 + 16) * 4
        t_comm = bytes_recv / ICI_BW * 1e3                      # ms
        t_comp = args.step_ns * 1e-9 * n / S * 1e3              # ms per chip
        eff = t_comp / max(t_comp, t_comm)                      # overlapped

        # sparse halo-only exchange (parallel/sparse_shard.build_halo_plan):
        # per eval each chip moves halo_rows packed rows of both sources
        # (pos 256 B/row + sr 512 B/row)
        from softbody_tpu.sim.sparse import build_sparse_scene
        from softbody_tpu.parallel import sparse_shard as ssh

        cfg_s = warp_parity().replace(h=h, dtype="float32", backend="pallas")
        scene_s, _ = build_sparse_scene(pts, cfg_s, out_num=out_num,
                                        layout=lay, n_shards=S)
        plan, _, _ = ssh.build_halo_plan(scene_s.blocked)
        shb = plan.halo_rows * (256 + 512)
        sp_halo_mb = f"{shb / 1e6:.2f}"
        sp_halo_eff = f"{t_comp / max(t_comp, shb / ICI_BW * 1e3):.2f}"
        halo_mb = halo_eff = ""
        if n <= args.halo_max:
            from softbody_tpu.config import SimConfig
            from softbody_tpu.native import hashgrid
            from softbody_tpu.topology.neighbors import build_topology
            from softbody_tpu.parallel.halo import build_halo_plan

            cfg = warp_parity().replace(h=h, dtype="float32", max_neighbors=64)
            topo, _, _ = build_topology(np.asarray(pts), np.full(n, cfg.mass), cfg)
            idx = np.asarray(topo.idx)
            pad = (-len(idx)) % S
            if pad:
                idx = np.vstack([idx, np.tile(np.arange(len(idx), len(idx) + pad)
                                              [:, None], (1, idx.shape[1]))])
            plan = build_halo_plan(idx, S)
            # per eval: positions (3 f) + G (9 f) halo rows each way
            hb = plan.send_idx.shape[1] * plan.halo * (3 + 9) * 4
            halo_mb = f"{hb / 1e6:.2f}"
            t_comm_h = hb / ICI_BW * 1e3
            halo_eff = f"{t_comp / max(t_comp, t_comm_h):.2f}"
        print(f"| {n} | {m} | {bytes_recv / 1e6:.2f} | {t_comm:.3f} "
              f"| {t_comp:.3f} | {eff:.2f} | {sp_halo_mb} | {sp_halo_eff} "
              f"| {halo_mb} | {halo_eff} |"
              f"  <!-- layout build {build_s:.1f}s -->")


if __name__ == "__main__":
    main()
