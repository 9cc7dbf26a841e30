"""Mesh I/O: GLB write->read roundtrip, animated GLB structure, OBJ parsing,
normalisation and sampling semantics."""

import json
import struct

import numpy as np
import pytest

from motion324_tpu.io.glb import export_animated_glb, export_glb, load_glb
from motion324_tpu.io.mesh import (TriMesh, load_mesh, nearest_colors,
                                   normalize_unit_cube, sample_surface,
                                   sample_with_albedo, vertex_normals)

CUBE_V = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                   [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]], np.float32)
CUBE_F = np.array([[0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7],
                   [0, 1, 5], [0, 5, 4], [2, 3, 7], [2, 7, 6],
                   [1, 2, 6], [1, 6, 5], [3, 0, 4], [3, 4, 7]], np.int64)


def test_glb_roundtrip(tmp_path):
    path = str(tmp_path / "cube.glb")
    uv = np.random.RandomState(0).rand(8, 2).astype(np.float32)
    tex = np.random.RandomState(1).rand(16, 16, 3).astype(np.float32)
    export_glb(path, CUBE_V, CUBE_F, uv=uv, texture=tex)
    data = load_glb(path)
    np.testing.assert_allclose(data["vertices"], CUBE_V, atol=1e-6)
    np.testing.assert_array_equal(data["faces"], CUBE_F)
    np.testing.assert_allclose(data["uv"], uv, atol=1e-6)
    assert data["texture"].shape == (16, 16, 3)
    np.testing.assert_allclose(data["texture"], tex, atol=2/255)


def test_animated_glb_structure(tmp_path):
    path = str(tmp_path / "anim.glb")
    t_frames = 5
    trajs = CUBE_V[None] + np.linspace(0, 1, t_frames)[:, None, None].astype(np.float32)
    export_animated_glb(path, CUBE_V, CUBE_F, trajs, fps=12)

    with open(path, "rb") as f:
        raw = f.read()
    _, _, _ = struct.unpack_from("<III", raw, 0)
    jlen, jtype = struct.unpack_from("<II", raw, 12)
    gltf = json.loads(raw[20:20 + jlen].decode())
    prim = gltf["meshes"][0]["primitives"][0]
    assert len(prim["targets"]) == t_frames
    assert gltf["meshes"][0]["weights"] == [0.0] * t_frames
    anim = gltf["animations"][0]
    assert anim["samplers"][0]["interpolation"] == "STEP"
    assert anim["channels"][0]["target"]["path"] == "weights"

    # morph target displacements: target t + base == trajs[t]
    data = load_glb(path)
    np.testing.assert_allclose(data["vertices"], CUBE_V, atol=1e-6)


def test_obj_load(tmp_path):
    p = tmp_path / "tri.obj"
    p.write_text("""v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\nvt 0 0\nvt 1 0\nvt 0 1\nvt 1 1\nf 1/1 2/2 3/3\nf 2/2 4/4 3/3\n""")
    mesh = load_mesh(str(p))
    assert mesh.vertices.shape == (4, 3)
    assert mesh.faces.shape == (2, 3)
    np.testing.assert_array_equal(mesh.faces[0], [0, 1, 2])
    assert mesh.uv is not None


def test_normalize_unit_cube():
    v = np.array([[2, 2, 2], [4, 6, 2], [4, 2, 10]], np.float32)
    out, center, scale = normalize_unit_cube(v)
    # matches reference math: center = bbox midpoint, scale = 2*max_abs
    np.testing.assert_allclose(center, [3, 4, 6], atol=1e-6)
    assert abs(np.abs(out).max() - 0.5) < 1e-5
    np.testing.assert_allclose(out * scale + center, v, atol=1e-4)


def test_sample_surface_uniform_on_cube():
    mesh = TriMesh(vertices=CUBE_V, faces=CUBE_F)
    pts, fidx, bary = sample_surface(mesh, 6000, seed=0)
    assert pts.shape == (6000, 3)
    np.testing.assert_allclose(bary.sum(-1), 1.0, atol=1e-5)
    assert pts.min() >= -1e-6 and pts.max() <= 1 + 1e-6
    # every face of the cube gets sampled roughly equally (1/12 each)
    counts = np.bincount(fidx, minlength=12)
    assert counts.min() > 300  # expectation 500

def test_sample_with_albedo_vertex_colors():
    cols = np.zeros((8, 3), np.float32)
    cols[:, 0] = 1.0  # all red
    mesh = TriMesh(vertices=CUBE_V, faces=CUBE_F, vertex_colors=cols)
    pts, normals, colors = sample_with_albedo(mesh, 100)
    np.testing.assert_allclose(colors, [[1, 0, 0]] * 100, atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(normals, axis=-1), 1.0, atol=1e-5)


def test_sample_with_albedo_texture():
    uv = np.zeros((8, 2), np.float32)
    uv[:, 0] = 0.3  # all corners sample the same texel (off grid boundaries)
    uv[:, 1] = 0.7
    tex = np.zeros((4, 4, 3), np.float32)
    tex[1, 1] = [0.0, 1.0, 0.0]  # u=0.3->col 1, v: (1-0.7)*4 = row 1
    mesh = TriMesh(vertices=CUBE_V, faces=CUBE_F, uv=uv, texture=tex)
    _, _, colors = sample_with_albedo(mesh, 50)
    np.testing.assert_allclose(colors, [[0, 1, 0]] * 50, atol=1e-6)


def test_vertex_normals_cube():
    vn = vertex_normals(CUBE_V, CUBE_F)
    assert vn.shape == (8, 3)
    np.testing.assert_allclose(np.linalg.norm(vn, axis=-1), 1.0, atol=1e-5)


def test_nearest_colors():
    pts = np.array([[0, 0, 0], [1, 0, 0]], np.float32)
    cols = np.array([[1, 0, 0], [0, 1, 0]], np.float32)
    out = nearest_colors(pts, cols, np.array([[0.1, 0, 0], [0.9, 0, 0]], np.float32))
    np.testing.assert_array_equal(out, [[1, 0, 0], [0, 1, 0]])


def test_video_roundtrip(tmp_path):
    from motion324_tpu.io.video import read_video, write_video
    # structured frames (random noise is the lossy-codec worst case)
    frames = np.zeros((5, 32, 32, 3), np.uint8)
    for t in range(5):
        frames[t, :, :, 0] = 40 * t
        frames[t, 8:24, 8:24, 1] = 200
    path = write_video(str(tmp_path / "v.mp4"), frames, fps=8)
    back = read_video(path)
    assert back.shape == (5, 32, 32, 3)
    assert np.abs(back * 255 - frames).mean() < 15
