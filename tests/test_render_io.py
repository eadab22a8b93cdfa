"""Render stack, asset IO, and Eigen-binary utils."""

import shutil

import numpy as np
import pytest

from softbody_tpu.geometry import io as gio
from softbody_tpu.render.adapters import mesh_frame_scene, sphere_cloud_scene
from softbody_tpu.render.pbrt import PbrtScene
from softbody_tpu.render.video import collect_frames, export_mp4
from softbody_tpu.utils import io as uio


def test_pbrt_scene_text_structure(tmp_path):
    r = PbrtScene(workdir=tmp_path / ".pbrt")
    r.set_camera(eye=[0, 1, 8], look_at=[0, 0, 0], up=[0, 1, 0], fov=40)
    r.set_image(pixel_samples=64, file_name="img.png", resolution=[1000, 800])
    r.add_infinite_light({"rgb L": (1.0, 1.0, 1.0)})
    r.add_distant_light([0, 10, 0], [0, 0, 0], [0.5, 0.5, 0.5])
    r.add_spherical_area_light([30, 10, 40], 3, [1, 1, 1], 3e4)
    r.add_sphere([1, 2, 3], 0.1, ("diffuse", {"rgb reflectance": (1, 0, 0)}))
    r.add_cylinder(np.array([0.0, 0, 0]), np.array([0.0, 1, 0]), 0.05, ("diffuse", {}))
    r.add_plane([0, 0, 0], [0, 1, 0], 10, ("diffuse", {"rgb reflectance": [0.2, 0.3, 0.2]}))
    r.add_curve(np.zeros((4, 3)), 3, 0.01, ("diffuse", {}))
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0.0]])
    r.add_triangle_mesh(verts, np.array([[0, 1, 2]]), np.array([[0, 0], [1, 0], [0, 1.0]]),
                        "tex.png", ("diffuse", {"rgb reflectance": (1, 1, 1)}))
    txt = r.scene_text()

    # camera handedness flip: -z on all three LookAt rows (pbrt_renderer.py:185-187)
    assert "LookAt 0.0 1.0 -8.0" in txt
    # world handedness flip (pbrt_renderer.py:204)
    assert "Scale 1 1 -1" in txt
    assert 'Sampler "halton" "integer pixelsamples" 64' in txt
    assert 'Integrator "volpath"' in txt
    assert '"integer xresolution" [1000] "integer yresolution" [800]' in txt
    for kind in ("infinite", "distant"):
        assert f'LightSource "{kind}"' in txt
    assert 'AreaLightSource "diffuse"' in txt
    for kind in ("sphere", "cylinder", "curve", "trianglemesh"):
        assert f'Shape "{kind}"' in txt
    # textured shape: texture declared and referenced, reflectance dropped
    assert '"spectrum" "imagemap" "string filename" "tex.png"' in txt
    assert '"texture reflectance"' in txt
    # write + render gating (no pbrt binary in the test image -> False, file kept)
    assert r.write().exists()
    assert r.render(pbrt_binary="definitely-not-a-binary") is False


def test_frame_adapters(tmp_path):
    pos = np.random.default_rng(0).normal(size=(20, 3))
    faces = np.array([[0, 1, 2], [2, 3, 4]])
    uv = np.random.default_rng(1).random((10, 2))
    s1 = mesh_frame_scene(pos, 10, faces, uv, "t.png", str(tmp_path / "a.png"),
                          workdir=tmp_path / ".p1")
    txt = s1.scene_text()
    assert 'Shape "trianglemesh"' in txt and "metal-Au-eta" in txt
    s2 = sphere_cloud_scene(pos, str(tmp_path / "b.png"), workdir=tmp_path / ".p2")
    assert s2.scene_text().count('Shape "sphere"') == 20 + 1  # + area light sphere


def test_video_collect_and_export(tmp_path):
    import imageio

    for i in (3, 1, 2):
        imageio.imwrite(tmp_path / f"sim_{i:04d}.png",
                        np.zeros((16, 16, 3), np.uint8))
    (tmp_path / "other.txt").write_text("x")
    frames = collect_frames(tmp_path, "sim_", ".png")
    assert [f.name for f in frames] == ["sim_0001.png", "sim_0002.png", "sim_0003.png"]
    if shutil.which("ffmpeg"):
        assert export_mp4(tmp_path, tmp_path / "out.mp4", 5, "sim_", ".png")
        assert (tmp_path / "out.mp4").stat().st_size > 0


def test_ply_roundtrip_and_binary(tmp_path):
    pts = np.random.default_rng(2).normal(size=(17, 3))
    gio.write_ply_points(tmp_path / "a.ply", pts)
    out = gio.read_ply_points(tmp_path / "a.ply")
    np.testing.assert_allclose(out, pts, atol=1e-5)

    # binary_little_endian with an extra property
    n = 5
    data = np.zeros(n, dtype=[("x", "<f4"), ("y", "<f4"), ("z", "<f4"), ("q", "<u1")])
    ref = np.random.default_rng(3).normal(size=(n, 3)).astype(np.float32)
    data["x"], data["y"], data["z"] = ref.T
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        "property float x\nproperty float y\nproperty float z\nproperty uchar q\n"
        "end_header\n"
    )
    (tmp_path / "b.ply").write_bytes(header.encode() + data.tobytes())
    out = gio.read_ply_points(tmp_path / "b.ply")
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_obj_parse(tmp_path):
    (tmp_path / "m.obj").write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "f 1/1/1 2/2/2 3/3/3 4/4/4\n"   # quad -> 2 triangles
    )
    v, f = gio.read_obj(tmp_path / "m.obj")
    assert v.shape == (4, 3)
    np.testing.assert_array_equal(f, [[0, 1, 2], [0, 2, 3]])


def test_reference_body_transform(tmp_path):
    # sim.py:41-53 semantics: x0.01 scale, R rotation, +0.07 y offset
    d = tmp_path / "pear"
    d.mkdir()
    outer = np.array([[100.0, 0.0, 0.0]])
    inner = np.array([[0.0, 100.0, 0.0], [0.0, 0.0, 100.0]])
    gio.write_ply_points(d / "point_cloud_downsampled.ply", outer)
    gio.write_ply_points(d / "pear_inner.ply", inner)
    body = gio.load_reference_body(tmp_path, "pear")
    assert body["out_num"] == 1
    np.testing.assert_allclose(body["raw_points"][0], [1.0, 0, 0], atol=1e-5)
    # R maps (1,0,0)->(1,0,0); (0,1,0)->(0,0,-1)... applied as points @ R
    np.testing.assert_allclose(body["points"][0], [1.0, 0.07, 0.0], atol=1e-5)
    np.testing.assert_allclose(body["points"][1], [0.0, 0.07, -1.0], atol=1e-5)
    np.testing.assert_allclose(body["points"][2], [0.0, 1.07, 0.0], atol=1e-5)


def test_eigen_binary_io(tmp_path):
    v = np.random.default_rng(4).normal(size=31)
    uio.save_real_vector(tmp_path / "v.bin", v)
    np.testing.assert_allclose(uio.load_real_vector(tmp_path / "v.bin"), v)

    from scipy.sparse import random as sprandom

    m = sprandom(13, 7, density=0.3, random_state=5, format="csr")
    uio.save_real_sparse_matrix(tmp_path / "m.bin", m)
    out = uio.load_real_sparse_matrix(tmp_path / "m.bin")
    np.testing.assert_allclose(out.toarray(), m.toarray())
    trips = uio.sparse_matrix_to_triplets(m)
    back = uio.triplets_to_sparse_matrix(13, 7, trips)
    np.testing.assert_allclose(back.toarray(), m.toarray())


def test_preview_renderer_writes_pngs(tmp_path):
    """Software preview fallback (render/preview.py): PNGs must exist and be
    nonempty for a tiny episode, with a scalar color field (inflation ratio)."""
    from softbody_tpu.render.preview import render_preview_episode

    rng = __import__("numpy").random.default_rng(0)
    frames = 0.05 * rng.normal(size=(3, 200, 3))
    names = render_preview_episode(frames, tmp_path / "prev",
                                   color=rng.random(200), every=1,
                                   ground_y=-0.1)
    assert len(names) == 3
    for n in names:
        import os
        assert os.path.getsize(n) > 5000
