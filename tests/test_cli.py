"""CLI end-to-end flows (reference entry point parity, sim.py:29-35,440-476).

Covers the --render artifact path: the reference renders the deformed body of
the CURRENT iterate (sim.py:385-395) — after optimization the `_opt` artifacts
must come from the OPTIMIZED x, not x0; procedural bodies (no mesh) fall back
to the sphere-cloud adapter (sim_taichi.py:300-315).  pbrt/ffmpeg binaries are
absent in CI, so assertions check the written .pbrt scene files (render()
degrades gracefully, test_render_io.py).
"""

import numpy as np
import pytest

from softbody_tpu.cli import main


def run(tmp_path, *extra):
    main(["-n", "demo", "--procedural", "300", "--frames", "8",
          "--backend", "gather", "--dtype", "float64",
          "--out-dir", str(tmp_path), *extra])


def scene_files(tmp_path, sub):
    d = tmp_path / "render" / f"demo{sub}" / ".pbrt"
    return sorted(d.glob("*.pbrt")) if d.exists() else []


def test_set_target_render_sphere_cloud(tmp_path):
    run(tmp_path, "--set_target", "--render")
    # targets written in particle space
    tdir = tmp_path / "target" / "demo"
    assert (tdir / "position_1.npy").exists()
    # sphere-cloud scenes written for the init rollout
    files = scene_files(tmp_path, "")
    assert files, "no .pbrt scenes written for procedural (meshless) body"
    text = files[0].read_text().lower()
    assert "sphere" in text and "trianglemesh" not in text


def test_optimize_renders_optimized_x(tmp_path, monkeypatch):
    run(tmp_path, "--set_target")

    # capture the x the render rollout receives
    seen = {"calls": 0}
    import softbody_tpu.render.adapters as adapters
    real = adapters.render_episode

    def spy(frames, out_num, faces, uv, tex, folder, **kw):
        seen["frames"] = np.asarray(frames)
        seen["folder"] = str(folder)
        seen["calls"] += 1
        return real(frames, out_num, faces, uv, tex, folder, **kw)

    monkeypatch.setattr(adapters, "render_episode", spy)
    # warm-start away from the target solution (targets came from x0 = -1)
    # so the optimizer has real work and the rendered x != the warm start
    ws = tmp_path / "warm.npy"
    np.save(ws, np.full(300 * 3, 0.5)[:_n_particles(tmp_path)])
    run(tmp_path, "--maxiter", "3", "--render", "--warm-start", str(ws))

    assert seen, "render path not exercised"
    assert seen["folder"].endswith("demo_opt")
    # reference renders inside EVERY loss eval (sim.py:385-395) plus our final
    # render of the optimized x: > 1 call proves the during-optimization path
    assert seen["calls"] > 1, seen["calls"]
    assert scene_files(tmp_path, "_opt")
    opt_x = np.load(tmp_path / "opt" / "demo" / "x.npy")
    assert np.any(np.abs(opt_x - 0.5) > 1e-6), "optimizer did not move off the warm start"


def _n_particles(tmp_path):
    return np.load(tmp_path / "target" / "demo" / "position_1.npy").shape[0]
