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


def _raw_glb(gltf: dict, binary: bytes) -> bytes:
    """Assemble a GLB container independently of io.glb's writer (so loader
    tests do not share code with the code under test)."""
    pad = (-len(binary)) % 4
    binary = binary + b"\x00" * pad
    js = json.dumps(gltf).encode()
    js = js + b" " * ((-len(js)) % 4)
    total = 12 + 8 + len(js) + 8 + len(binary)
    return (struct.pack("<III", 0x46546C67, 2, total)
            + struct.pack("<II", len(js), 0x4E4F534A) + js
            + struct.pack("<II", len(binary), 0x004E4942) + binary)


def _gltf_prim_doc(positions: np.ndarray, indices: np.ndarray | None,
                   mode: int) -> tuple[dict, bytes]:
    binary = positions.astype("<f4").tobytes()
    accessors = [{"bufferView": 0, "componentType": 5126,
                  "count": len(positions), "type": "VEC3",
                  "min": positions.min(0).tolist(),
                  "max": positions.max(0).tolist()}]
    views = [{"buffer": 0, "byteOffset": 0, "byteLength": len(binary)}]
    prim = {"attributes": {"POSITION": 0}, "mode": mode}
    if indices is not None:
        idx_bytes = indices.astype("<u2").tobytes()
        views.append({"buffer": 0, "byteOffset": len(binary),
                      "byteLength": len(idx_bytes)})
        binary += idx_bytes + b"\x00" * ((-len(idx_bytes)) % 4)
        accessors.append({"bufferView": 1, "componentType": 5123,
                          "count": len(indices), "type": "SCALAR"})
        prim["indices"] = 1
    gltf = {"asset": {"version": "2.0"}, "scene": 0,
            "scenes": [{"nodes": [0]}], "nodes": [{"mesh": 0}],
            "meshes": [{"primitives": [prim]}],
            "buffers": [{"byteLength": len(binary)}],
            "bufferViews": views, "accessors": accessors}
    return gltf, binary


def test_glb_triangle_strip(tmp_path):
    """Mode-5 strips convert with alternating winding (reference loader
    handles non-TRIANGLES modes: custom_rasterizer/io_glb.py:134-230)."""
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float32)
    gltf, binary = _gltf_prim_doc(pos, np.arange(4, dtype=np.uint16), 5)
    path = str(tmp_path / "strip.glb")
    with open(path, "wb") as f:
        f.write(_raw_glb(gltf, binary))
    data = load_glb(path)
    np.testing.assert_array_equal(data["faces"],
                                  [[0, 1, 2], [2, 1, 3]])


def test_glb_triangle_fan_and_nonindexed(tmp_path):
    pos = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                    [-1, 0.5, 0]], np.float32)
    gltf, binary = _gltf_prim_doc(pos, None, 6)  # fan, no index accessor
    path = str(tmp_path / "fan.glb")
    with open(path, "wb") as f:
        f.write(_raw_glb(gltf, binary))
    data = load_glb(path)
    np.testing.assert_array_equal(
        data["faces"], [[0, 1, 2], [0, 2, 3], [0, 3, 4]])


def test_glb_strip_degenerate_restart(tmp_path):
    """Strips that restart by repeating an index emit no degenerate faces."""
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float32)
    idx = np.array([0, 1, 2, 2, 3, 3, 1, 0], np.uint16)
    gltf, binary = _gltf_prim_doc(pos, idx, 5)
    path = str(tmp_path / "strip_restart.glb")
    with open(path, "wb") as f:
        f.write(_raw_glb(gltf, binary))
    faces = load_glb(path)["faces"]
    assert len(faces) > 0
    assert (np.sort(faces, axis=1)[:, 0] != np.sort(faces, axis=1)[:, 1]).all()
    assert (np.sort(faces, axis=1)[:, 1] != np.sort(faces, axis=1)[:, 2]).all()


def test_glb_multi_primitive_merge(tmp_path):
    """Two primitives in one mesh node merge with vertex offsets."""
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    g1, b1 = _gltf_prim_doc(pos, np.array([0, 1, 2], np.uint16), 4)
    g2, b2 = _gltf_prim_doc(pos + 5.0, np.array([0, 1, 2], np.uint16), 4)
    # merge doc 2's primitive into doc 1 with re-based views/accessors
    off_views = len(g1["bufferViews"])
    off_acc = len(g1["accessors"])
    for v in g2["bufferViews"]:
        v["byteOffset"] += len(b1)
        g1["bufferViews"].append(v)
    for a in g2["accessors"]:
        a["bufferView"] += off_views
        g1["accessors"].append(a)
    prim2 = g2["meshes"][0]["primitives"][0]
    prim2["attributes"]["POSITION"] += off_acc
    prim2["indices"] += off_acc
    g1["meshes"][0]["primitives"].append(prim2)
    binary = b1 + b2
    g1["buffers"][0]["byteLength"] = len(binary)
    path = str(tmp_path / "multi.glb")
    with open(path, "wb") as f:
        f.write(_raw_glb(g1, binary))
    data = load_glb(path)
    assert data["vertices"].shape == (6, 3)
    np.testing.assert_array_equal(data["faces"], [[0, 1, 2], [3, 4, 5]])
    np.testing.assert_allclose(data["vertices"][3:], pos + 5.0)


CHILI = "/root/reference/examples/chili.glb"


@pytest.mark.skipif(not __import__("os").path.exists(CHILI),
                    reason="reference examples not mounted")
def test_glb_real_world_chili():
    """chili.glb — a real-world GLB our writer did NOT produce — loads with
    sane geometry, UVs in range, and its 2048^2 texture."""
    data = load_glb(CHILI)
    v, f = data["vertices"], data["faces"]
    assert len(v) == 13465
    assert f.min() >= 0 and f.max() < len(v)
    assert np.isfinite(v).all()
    assert "texture" in data and data["texture"].shape[0] >= 1024
    assert "uv" in data and -1e-3 <= data["uv"].min() and \
        data["uv"].max() <= 1 + 1e-3
    # mesh spans a nonzero volume (not collapsed by a bad transform chain)
    ext = v.max(0) - v.min(0)
    assert (ext > 1e-3).all()


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


def test_read_video_fused_resize(tmp_path):
    """resize_to fused into the decode loop == resizing the full-res stack
    afterwards (channel permutation commutes with resize), for u8 and f32."""
    from motion324_tpu.inference.pipeline import resize_frames
    from motion324_tpu.io.video import read_video, write_video
    rng = np.random.default_rng(0)
    frames = (rng.random((4, 48, 64, 3)) * 255).astype(np.uint8)
    path = write_video(str(tmp_path / "v.mp4"), frames, fps=8)
    for dtype in (np.uint8, np.float32):
        full = read_video(path, dtype=dtype)
        fused = read_video(path, dtype=dtype, resize_to=16)
        assert fused.shape == (4, 16, 16, 3) and fused.dtype == dtype
        np.testing.assert_array_equal(fused, resize_frames(full, 16))
    # max_frames still honoured with the fused resize
    assert read_video(path, 2, resize_to=16).shape == (2, 16, 16, 3)
