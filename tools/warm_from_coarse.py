#!/usr/bin/env python
"""Coarse-to-fine warm start: interpolate a converged low-N inverse-design
solution onto a higher-N body (nearest-neighbor in rest space) and emit a
slot-space x0 for examples/inverse_design_100k.py --x0.

The reference warm-starts L-BFGS from a previous run's x the same way
(sim.py:454, opt/pear/x.npy + noise); this is the resolution-crossing version:
the procedural bodies at different N sample the SAME geometry, and the
inflation field is a smooth function of rest position, so a coarse optimum
CAN transfer.

MEASURED OUTCOME for the drop scenario (round 5, out/drop100k_warm_probe.log):
it does NOT transfer there — f(x_20k->100k) = 0.071 vs f(0) = 0.0327.  The
20k drop optimum is a small-amplitude (|x| ~ 0.006 vs the x* bands' ~1)
resolution-specific correction — its ratio-distance to x* barely moved
(59.63 -> 59.41) — i.e. the drop landscape's loss floor is reachable without
recovering the field, and what it finds is discretization-specific.  The tool
remains for scenarios with strong identifiability (e.g. stretch, whose
100k run moved ratio-distance 140 -> 98).

Usage: python tools/warm_from_coarse.py --coarse out/drop20k
           --coarse-particles 20000 --particles 100000
           --out out/drop100k_warm_x0.npy [--scenario drop]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coarse", required=True, help="finished coarse run dir")
    ap.add_argument("--coarse-particles", type=int, default=20_000)
    ap.add_argument("--particles", type=int, default=100_000)
    ap.add_argument("--scenario", default="drop", choices=["drop", "stretch"])
    ap.add_argument("--out", required=True, help="slot-space x0 .npy to write")
    args = ap.parse_args()

    from scipy.spatial import cKDTree

    from softbody_tpu.geometry.shapes import suggest_h
    from softbody_tpu.scenarios import drop_gap, fit_body
    from softbody_tpu.topology.sparse import build_sparse_layout

    # rebuild both layouts host-side (deterministic, same parameters as
    # examples/inverse_design_100k.py)
    def layout_for(n):
        pts, _ = fit_body(n)
        pts = drop_gap(pts, args.scenario)
        lay = build_sparse_layout(pts, 2.0 * suggest_h(pts, 32), rows=32)
        return pts, lay

    pts_c, lay_c = layout_for(args.coarse_particles)
    x_slots_c = np.load(os.path.join(args.coarse, "x.npy"))
    assert x_slots_c.shape == (lay_c.n_slots,), (
        x_slots_c.shape, lay_c.n_slots)
    x_p_c = x_slots_c[lay_c.slot_of_particle]

    pts_f, lay_f = layout_for(args.particles)
    _, idx = cKDTree(pts_c).query(pts_f)
    x_p_f = x_p_c[idx]

    x0 = np.zeros(lay_f.n_slots)
    x0[lay_f.slot_of_particle] = x_p_f
    np.save(args.out, x0)
    print(f"coarse {len(pts_c)} -> fine {len(pts_f)}: wrote {args.out} "
          f"(slots={lay_f.n_slots}, |x| mean {np.abs(x_p_f).mean():.4f})")


if __name__ == "__main__":
    main()
