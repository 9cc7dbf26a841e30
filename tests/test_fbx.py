"""Binary FBX writer/reader round-trip (mesh + UV + animated blend shapes)."""

import numpy as np

from motion324_tpu.io.fbx import export_animated_fbx, load_fbx

V = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0], [0.5, 0.5, 1]],
             np.float32)
F = np.array([[0, 1, 4], [1, 2, 4], [2, 3, 4], [3, 0, 4]], np.int64)
UV = np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0.5, 0.5]], np.float32)


def test_fbx_static_roundtrip(tmp_path):
    path = str(tmp_path / "static.fbx")
    export_animated_fbx(path, V, F, uv=UV)
    out = load_fbx(path)
    np.testing.assert_allclose(out["vertices"], V, atol=1e-12)
    np.testing.assert_array_equal(out["faces"], F)
    np.testing.assert_allclose(out["uv"], UV, atol=1e-12)
    assert out["shapes"] == []


def test_fbx_animated_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    frames = V[None] + rng.randn(3, len(V), 3).astype(np.float32) * 0.1
    frames[0] = V  # rest frame: empty delta
    path = str(tmp_path / "anim.fbx")
    export_animated_fbx(path, V, F, frames=frames, fps=12, uv=UV)
    out = load_fbx(path)
    assert len(out["shapes"]) == 3
    # reconstruct each frame from base + sparse deltas
    for t, (name, idx, deltas) in enumerate(out["shapes"]):
        assert name == f"frame_{t:04d}"
        recon = out["vertices"].copy()
        recon[idx] += deltas
        np.testing.assert_allclose(recon, frames[t], atol=1e-6)


def test_fbx_header_magic(tmp_path):
    path = str(tmp_path / "m.fbx")
    export_animated_fbx(path, V, F)
    head = open(path, "rb").read(27)
    assert head[:21] == b"Kaydara FBX Binary  \x00"
    assert head[21:23] == b"\x1a\x00"
    import struct
    assert struct.unpack("<I", head[23:27])[0] == 7400
