#!/usr/bin/env python
"""Render a completed inverse-design run (examples/inverse_design_100k.py out
dir) with the software preview renderer.

Re-rolls the optimized ``x.npy`` through the same scenario, writes preview
PNGs + mp4 (particles colored by the optimized inflation ratio — the
recovered bands are directly visible) under ``{out}/preview/``, and a
side-by-side final-frame image for x_opt vs x*.  The .pbrt scene files remain
the production render path (render/pbrt.py); this exists because the
environment ships no pbrt binary (see render/preview.py).

Usage: python tools/render_result.py --out out/drop100k --particles 100000
           --scenario drop [--every 500]
"""

import argparse
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from softbody_tpu.utils.hostmem import enable_compilation_cache, enable_heap_reuse

    enable_heap_reuse()
    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--particles", type=int, default=100_000)
    ap.add_argument("--scenario", default="drop", choices=["stretch", "drop"])
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--every", type=int, default=500)
    ap.add_argument("--rows", type=int, default=32,
                    help="slot rows of the ORIGINAL run's layout (x.npy is "
                         "slot-space; round-4 runs used rows=64)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from softbody_tpu import warp_parity
    from softbody_tpu.geometry.shapes import suggest_h
    from softbody_tpu.ops.elasticity import compute_ratio
    from softbody_tpu.render.preview import (render_preview_episode,
                                             render_preview_frame)
    from softbody_tpu.scenarios import (_SCENARIOS, dirichlet_mask, drop_gap,
                                        fit_body, scale_mass_for_resolution)
    from softbody_tpu.sim.rollout import rollout
    from softbody_tpu.sim.sparse import build_sparse_scene

    out = Path(args.out)
    x_opt = np.load(out / "x.npy")

    pts, out_num = fit_body(args.particles)
    pts = drop_gap(pts, args.scenario)
    cfg = warp_parity().replace(
        h=suggest_h(pts, 32), dtype="float32", frames=args.steps,
        target_frames=100, backend="pallas", **_SCENARIOS[args.scenario])
    cfg = scale_mass_for_resolution(cfg, len(pts), args.scenario)
    scene, sop = build_sparse_scene(
        pts, cfg, out_num=out_num, rows=args.rows,
        dirichlet_mask=dirichlet_mask(pts, args.scenario))
    ns = scene.blocked.n_slots
    assert x_opt.shape == (ns,), (x_opt.shape, ns)
    sl = np.asarray(sop)

    ratio = np.asarray(compute_ratio(jnp.asarray(x_opt), cfg))[sl]
    run = jax.jit(lambda xv, sc: rollout(
        xv, sc, cfg, n_steps=args.steps, record_every=args.every)[2])
    rec = run(jnp.asarray(x_opt, cfg.dtype), scene)
    frames = np.asarray(rec[0])[:, sl]
    ground = 0.0 if cfg.collision else None
    names = render_preview_episode(frames, out / "preview", color=ratio,
                                   every=1, ground_y=ground,
                                   label=f"{args.scenario}_opt")

    # recovered vs target inflation field on the rest shape
    xs_file = out / "x_star.npy"
    if xs_file.exists():
        x_star_p = np.load(xs_file)
        r_star = np.asarray(compute_ratio(jnp.asarray(x_star_p), cfg))
        render_preview_frame(pts, out / "preview" / "field_opt.png",
                             color=ratio, title="recovered inflation ratio")
        render_preview_frame(pts, out / "preview" / "field_target.png",
                             color=r_star, title="target inflation ratio")
    print(f"wrote {len(names)} preview frames under {out / 'preview'}")


if __name__ == "__main__":
    main()
