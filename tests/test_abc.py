"""Alembic (Ogawa) codec: container invariants + archive round-trip.

The independent parser in io/abc.py re-derives everything from bytes —
the same writer/external-validator pattern as the FBX codec tests. External
Alembic readers are unavailable in this environment (no bpy/alembic/egress);
see the io/abc.py docstring's validation-boundary note.
"""

import struct

import numpy as np

from motion324_tpu.io.abc import export_animated_abc, read_abc

V = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
F = np.array([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]], np.int64)


def _frames(t=5):
    rng = np.random.RandomState(0)
    return V[None] + 0.1 * rng.randn(t, len(V), 3).astype(np.float32)


def test_ogawa_container_invariants(tmp_path):
    path = str(tmp_path / "a.abc")
    export_animated_abc(path, V, F, _frames())
    buf = open(path, "rb").read()
    assert buf[:5] == b"Ogawa"
    assert buf[5] == 0xFF  # frozen
    assert struct.unpack_from("<H", buf, 6)[0] == 1
    (root,) = struct.unpack_from("<Q", buf, 8)
    assert 16 <= root < len(buf)
    # root: 6 children, data/group bits as documented
    (n,) = struct.unpack_from("<Q", buf, root)
    kids = struct.unpack_from(f"<{n}Q", buf, root + 8)
    assert n == 6
    data_bit = 1 << 63
    assert [bool(k & data_bit) for k in kids] == [True, True, False,
                                                  True, True, True]
    # every address lands inside the file
    for k in kids:
        assert (k & ~data_bit) < len(buf)


def test_animated_roundtrip(tmp_path):
    path = str(tmp_path / "anim.abc")
    frames = _frames(5)
    export_animated_abc(path, V, F, frames, fps=24.0, name="blob")
    arc = read_abc(path)

    assert "blob" in arc["objects"]
    obj = arc["objects"]["blob"]
    assert "AbcGeom_PolyMesh" in obj["meta"]
    geom = obj["props"][".geom"]["children"]

    p = geom["P"]
    assert p["nsamples"] == 5 and p["extent"] == 3 and p["tsidx"] == 1
    for t in range(5):
        np.testing.assert_allclose(p["samples"][t].reshape(-1, 3),
                                   frames[t], atol=0)
    np.testing.assert_array_equal(
        geom[".faceIndices"]["samples"][0], F.reshape(-1))
    np.testing.assert_array_equal(
        geom[".faceCounts"]["samples"][0], np.full(len(F), 3))

    bnds = geom[".selfBnds"]
    assert bnds["extent"] == 6 and bnds["nsamples"] == 5
    np.testing.assert_allclose(bnds["samples"][2][:3], frames[2].min(0),
                               rtol=1e-6)

    # uniform time sampling at 24 fps in slot 1
    ts = arc["time_samplings"][1]
    assert abs(ts["time_per_cycle"] - 1 / 24.0) < 1e-12
    assert ts["max_samples"] == 5


def test_static_roundtrip(tmp_path):
    path = str(tmp_path / "static.abc")
    export_animated_abc(path, V, F)
    arc = read_abc(path)
    geom = arc["objects"]["mesh"]["props"][".geom"]["children"]
    assert geom["P"]["nsamples"] == 1
    assert geom["P"]["tsidx"] == 0  # static: default time sampling
    np.testing.assert_allclose(geom["P"]["samples"][0].reshape(-1, 3), V)


def test_sample_keys_are_payload_hashes(tmp_path):
    """Each sample blob = 16-byte key + payload; the key is the Alembic
    ArraySample key: MurmurHash3_x64_128(payload, seed=POD byte size)."""
    from motion324_tpu.native import murmur3_x64_128
    path = str(tmp_path / "k.abc")
    export_animated_abc(path, V, F, _frames(2))
    buf = open(path, "rb").read()
    payload = np.ascontiguousarray(F.reshape(-1).astype("<i4")).tobytes()
    key = murmur3_x64_128(payload, seed=4)  # int32 POD -> seed 4
    at = buf.find(key)
    assert at > 0 and buf[at + 16:at + 16 + len(payload)] == payload
    # f64 bounds sample seeds with 8
    bpayload = np.concatenate(
        [_frames(2)[0].min(0), _frames(2)[0].max(0)]).astype("<f8").tobytes()
    bkey = murmur3_x64_128(bpayload, seed=8)
    assert buf.find(bkey) > 0


def test_object_hash_trailer(tmp_path):
    """Every object's child-headers data carries the mandatory 32-byte
    [properties|children] hash trailer and the reader exposes it."""
    path = str(tmp_path / "t.abc")
    export_animated_abc(path, V, F, _frames(2), name="blob")
    arc = read_abc(path)
    obj = arc["objects"]["blob"]
    assert len(obj["properties_hash"]) == 16
    assert len(obj["children_hash"]) == 16
    # a leaf object's children hash is the spooky digest of empty input
    from motion324_tpu.native import spooky_hash128
    assert obj["children_hash"] == spooky_hash128(b"")
    assert obj["properties_hash"] != obj["children_hash"]


def test_convert_cli_writes_abc(tmp_path):
    """convert_fbx CLI routes .abc outputs through the Alembic writer."""
    import sys
    sys.path.insert(0, "scripts")
    import convert_fbx

    from motion324_tpu.io.glb import export_animated_glb
    glb = str(tmp_path / "in.glb")
    frames = _frames(3)
    export_animated_glb(glb, V, F, frames, fps=12)
    out = str(tmp_path / "out.abc")
    convert_fbx.main([glb, "-o", out])
    arc = read_abc(out)
    p = arc["objects"]["in"]["props"][".geom"]["children"]["P"]
    assert p["nsamples"] == 3
    np.testing.assert_allclose(p["samples"][1].reshape(-1, 3), frames[1],
                               atol=1e-6)
