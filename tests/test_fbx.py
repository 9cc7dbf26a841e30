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


# --------------------------------------------------------- independent parse

def test_fbx_external_parser_static(tmp_path):
    """A strict from-the-spec parser (tests/fbx_oracle.py — shares no code
    with io/fbx.py) recovers the mesh, validating every record's EndOffset /
    PropertyListLen / NULL-terminator arithmetic along the way."""
    import fbx_oracle

    path = str(tmp_path / "oracle_static.fbx")
    export_animated_fbx(path, V, F, uv=UV)
    sc = fbx_oracle.scene(path)
    assert sc["version"] == 7400
    np.testing.assert_allclose(sc["vertices"], V, atol=1e-12)
    assert [list(f) for f in sc["faces"]] == F.tolist()
    np.testing.assert_allclose(sc["uv"], UV, atol=1e-12)
    assert sc["shapes"] == {}
    # geometry is connected to a model, model to the scene root (id 0)
    oo = [(a, b) for (kind, a, b, *_) in
          [(c[0], c[1], c[2]) + tuple(c[3:]) for c in sc["connections"]]
          if kind == "OO"]
    geo_ids = [i for i, (cls, _, sub) in sc["ids"].items()
               if cls == "Geometry" and sub == "Mesh"]
    model_ids = [i for i, (cls, _, _) in sc["ids"].items() if cls == "Model"]
    assert (geo_ids[0], model_ids[0]) in oo
    assert (model_ids[0], 0) in oo


def test_fbx_external_parser_animated(tmp_path):
    """The oracle recovers blend shapes AND verifies the animation wiring:
    every Shape -> BlendShapeChannel -> BlendShape deformer -> Geometry chain
    and a stepped DeformPercent curve peaking at 100 on its own frame."""
    import fbx_oracle

    rng = np.random.RandomState(1)
    frames = V[None] + rng.randn(4, len(V), 3).astype(np.float32) * 0.1
    path = str(tmp_path / "oracle_anim.fbx")
    export_animated_fbx(path, V, F, frames=frames, fps=12, uv=UV)
    sc = fbx_oracle.scene(path)
    assert set(sc["shapes"]) == {f"frame_{t:04d}" for t in range(4)}
    for t in range(4):
        idx, deltas = sc["shapes"][f"frame_{t:04d}"]
        recon = sc["vertices"].copy()
        recon[idx] += deltas
        np.testing.assert_allclose(recon, frames[t], atol=1e-6)

    ids = sc["ids"]
    oo = {(c[1], c[2]) for c in sc["connections"] if c[0] == "OO"}
    op = {(c[1], c[2], c[3]) for c in sc["connections"] if c[0] == "OP"}
    geo = next(i for i, (cls, _, sub) in ids.items()
               if cls == "Geometry" and sub == "Mesh")
    deformer = next(i for i, (cls, _, sub) in ids.items()
                    if cls == "Deformer" and sub == "BlendShape")
    assert (deformer, geo) in oo
    for t in range(4):
        shape = next(i for i, (cls, nm, sub) in ids.items()
                     if cls == "Geometry" and sub == "Shape"
                     and nm.endswith(f"frame_{t:04d}"))
        chan = next(i for i, (cls, nm, sub) in ids.items()
                    if cls == "Deformer" and sub == "BlendShapeChannel"
                    and nm.endswith(f"frame_{t:04d}"))
        assert (shape, chan) in oo
        assert (chan, deformer) in oo
        # a curve node drives this channel's DeformPercent...
        cnode = next(a for (a, b, prop) in op
                     if b == chan and prop == "DeformPercent")
        # ...fed by an AnimationCurve whose keys step 0 -> 100 -> 0 at frame t
        curve = next(a for (a, b, prop) in op
                     if b == cnode and prop == "d|DeformPercent")
        times_sec, values = sc["curves"][curve]
        peak = values.argmax()
        assert values[peak] == 100.0
        assert abs(times_sec[peak] - t / 12.0) < 1e-6
        assert all(v == 0.0 for k, v in enumerate(values) if k != peak)


def test_convert_fbx_cli(tmp_path):
    """scripts/convert_fbx.py: static GLB and animated GLB -> valid FBX
    (verified through the writer-independent strict parser)."""
    import sys
    sys.path.insert(0, "scripts")
    import convert_fbx
    from fbx_oracle import scene
    from motion324_tpu.io.glb import export_animated_glb, export_glb

    static_glb = str(tmp_path / "static.glb")
    export_glb(static_glb, V, F, uv=UV)
    out = convert_fbx.convert(static_glb, str(tmp_path / "static.fbx"))
    doc = scene(out)
    np.testing.assert_allclose(doc["vertices"], V, atol=1e-6)

    rng = np.random.RandomState(1)
    frames = (V[None] + rng.randn(4, len(V), 3) * 0.1).astype(np.float32)
    anim_glb = str(tmp_path / "anim.glb")
    export_animated_glb(anim_glb, V, F, frames, fps=12)
    out = convert_fbx.convert(anim_glb, str(tmp_path / "anim.fbx"), fps=12)
    doc = scene(out)
    assert len(doc["shapes"]) == 4
