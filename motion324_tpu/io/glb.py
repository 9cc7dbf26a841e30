"""GLB (binary glTF 2.0) reader and writer, dependency-free (numpy + PIL).

Replaces two reference components with one host library:
- mesh loading (the reference uses trimesh/pygltflib —
  scripts/hy3dgen/texgen/custom_rasterizer/custom_rasterizer/io_glb.py:134 and
  scripts/inference_with_video_mesh.py:78-88);
- animated-mesh export (the reference drives Blender shape keys with CONSTANT
  interpolation and exports merged-mesh morph targets — utils/render.py:117-345).
  Here the same artefact — one mesh with T morph targets and a STEP-interpolated
  weights animation — is written directly as glTF, no Blender process needed.
"""

from __future__ import annotations

import io as _io
import json
import struct
from typing import Any

import numpy as np

__all__ = ["load_glb", "export_glb", "export_animated_glb", "load_animated_glb"]

_MAGIC = 0x46546C67
_JSON_CHUNK = 0x4E4F534A
_BIN_CHUNK = 0x004E4942

_COMPONENT_DTYPES = {
    5120: np.int8, 5121: np.uint8, 5122: np.int16,
    5123: np.uint16, 5125: np.uint32, 5126: np.float32,
}
_TYPE_COUNTS = {"SCALAR": 1, "VEC2": 2, "VEC3": 3, "VEC4": 4,
                "MAT2": 4, "MAT3": 9, "MAT4": 16}


# --------------------------------------------------------------------------- #
# Reading
# --------------------------------------------------------------------------- #
def _read_chunks(data: bytes):
    magic, version, _length = struct.unpack_from("<III", data, 0)
    if magic != _MAGIC:
        raise ValueError("not a GLB file (bad magic)")
    if version != 2:
        raise ValueError(f"unsupported GLB version {version}")
    offset, gltf, binary = 12, None, b""
    while offset < len(data):
        clen, ctype = struct.unpack_from("<II", data, offset)
        chunk = data[offset + 8: offset + 8 + clen]
        if ctype == _JSON_CHUNK:
            gltf = json.loads(chunk.decode("utf-8"))
        elif ctype == _BIN_CHUNK:
            binary = chunk
        offset += 8 + clen  # chunkLength includes the 4-byte padding per spec
    if gltf is None:
        raise ValueError("GLB missing JSON chunk")
    return gltf, binary


def _accessor_data(gltf: dict, binary: bytes, idx: int) -> np.ndarray:
    acc = gltf["accessors"][idx]
    view = gltf["bufferViews"][acc["bufferView"]]
    dtype = _COMPONENT_DTYPES[acc["componentType"]]
    ncomp = _TYPE_COUNTS[acc["type"]]
    count = acc["count"]
    start = view.get("byteOffset", 0) + acc.get("byteOffset", 0)
    itemsize = np.dtype(dtype).itemsize * ncomp
    stride = view.get("byteStride", itemsize)
    if stride == itemsize:
        arr = np.frombuffer(binary, dtype=dtype, count=count * ncomp,
                            offset=start).reshape(count, ncomp)
    else:
        raw = np.frombuffer(binary, dtype=np.uint8,
                            count=stride * (count - 1) + itemsize, offset=start)
        rows = np.lib.stride_tricks.as_strided(
            raw, shape=(count, itemsize), strides=(stride, 1))
        arr = rows.view(dtype).reshape(count, ncomp)
    if acc.get("normalized") and dtype != np.float32:
        arr = arr.astype(np.float32) / np.iinfo(dtype).max
    return np.ascontiguousarray(arr)


def _node_transform(node: dict) -> np.ndarray:
    if "matrix" in node:
        return np.asarray(node["matrix"], np.float32).reshape(4, 4).T
    m = np.eye(4, dtype=np.float32)
    t = node.get("translation", [0, 0, 0])
    q = node.get("rotation", [0, 0, 0, 1])  # xyzw
    s = node.get("scale", [1, 1, 1])
    x, y, z, w = q
    rot = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ], dtype=np.float32)
    m[:3, :3] = rot * np.asarray(s, np.float32)
    m[:3, 3] = t
    return m


def _decode_image(gltf: dict, binary: bytes, image_idx: int):
    from PIL import Image
    img = gltf["images"][image_idx]
    if "bufferView" in img:
        view = gltf["bufferViews"][img["bufferView"]]
        start = view.get("byteOffset", 0)
        raw = binary[start:start + view["byteLength"]]
        pil = Image.open(_io.BytesIO(raw))
    elif "uri" in img and img["uri"].startswith("data:"):
        import base64
        raw = base64.b64decode(img["uri"].split(",", 1)[1])
        pil = Image.open(_io.BytesIO(raw))
    else:
        return None
    if pil.mode not in ("RGB", "RGBA"):
        pil = pil.convert("RGB")
    arr = np.asarray(pil).astype(np.float32) / 255.0
    return arr[..., :3]


def load_glb(path: str):
    """Load a GLB into merged-mesh arrays (world-space, all primitives).

    Returns a dict: ``vertices (V,3) f32``, ``faces (F,3) i64``, and optionally
    ``uv (V,2)``, ``vertex_colors (V,3)``, ``normals (V,3)``, ``texture (H,W,3)``
    (first baseColorTexture found).
    """
    with open(path, "rb") as f:
        gltf, binary = _read_chunks(f.read())

    # world transforms via scene graph
    world: dict[int, np.ndarray] = {}

    def visit(node_idx: int, parent: np.ndarray):
        node = gltf["nodes"][node_idx]
        m = parent @ _node_transform(node)
        world[node_idx] = m
        for ch in node.get("children", []):
            visit(ch, m)

    scene = gltf.get("scenes", [{}])[gltf.get("scene", 0)]
    for root in scene.get("nodes", range(len(gltf.get("nodes", [])))):
        visit(root, np.eye(4, dtype=np.float32))

    verts, faces, uvs, cols, norms = [], [], [], [], []
    texture = None
    voffset = 0
    for node_idx, m in world.items():
        node = gltf["nodes"][node_idx]
        if "mesh" not in node:
            continue
        mesh = gltf["meshes"][node["mesh"]]
        for prim in mesh.get("primitives", []):
            mode = prim.get("mode", 4)
            if mode not in (4, 5, 6):  # TRIANGLES / STRIP / FAN
                continue
            attrs = prim["attributes"]
            pos = _accessor_data(gltf, binary, attrs["POSITION"]).astype(np.float32)
            pos_w = pos @ m[:3, :3].T + m[:3, 3]
            n = len(pos_w)
            if "indices" in prim:
                idx = _accessor_data(gltf, binary, prim["indices"]).reshape(-1)
            else:
                idx = np.arange(n, dtype=np.uint32)
            idx = idx.astype(np.int64)
            # strip/fan conversion mirrors the reference's loader
            # (reference: .../custom_rasterizer/custom_rasterizer/io_glb.py:
            # 134-230 handles non-TRIANGLES modes)
            if mode == 5:  # TRIANGLE_STRIP: flip winding on odd triangles
                a, b, c = idx[:-2], idx[1:-1], idx[2:]
                odd = np.arange(len(a)) % 2 == 1
                tri = np.stack([np.where(odd, b, a),
                                np.where(odd, a, b), c], axis=1)
            elif mode == 6:  # TRIANGLE_FAN: all triangles share vertex 0
                tri = np.stack([np.broadcast_to(idx[0], idx[2:].shape),
                                idx[1:-1], idx[2:]], axis=1)
            else:
                tri = idx[:len(idx) - len(idx) % 3].reshape(-1, 3)
            # drop degenerate triangles (strips commonly restart by
            # repeating an index)
            keep = ((tri[:, 0] != tri[:, 1]) & (tri[:, 1] != tri[:, 2])
                    & (tri[:, 0] != tri[:, 2]))
            tri = tri[keep] + voffset
            verts.append(pos_w)
            faces.append(tri)
            uvs.append(_accessor_data(gltf, binary, attrs["TEXCOORD_0"])[:, :2]
                       .astype(np.float32) if "TEXCOORD_0" in attrs
                       else np.zeros((n, 2), np.float32))
            if "COLOR_0" in attrs:
                c = _accessor_data(gltf, binary, attrs["COLOR_0"])
                if c.dtype != np.float32:
                    c = c.astype(np.float32) / np.iinfo(c.dtype).max
                cols.append(c[:, :3].astype(np.float32))
            else:
                cols.append(np.full((n, 3), np.nan, np.float32))
            if "NORMAL" in attrs:
                nm = _accessor_data(gltf, binary, attrs["NORMAL"]).astype(np.float32)
                inv = np.linalg.inv(m[:3, :3]).T
                norms.append(nm @ inv.T)
            else:
                norms.append(np.full((n, 3), np.nan, np.float32))
            if texture is None and "material" in prim:
                mat = gltf.get("materials", [])[prim["material"]]
                tex_info = mat.get("pbrMetallicRoughness", {}).get(
                    "baseColorTexture")
                if tex_info is not None:
                    src = gltf["textures"][tex_info["index"]].get("source")
                    if src is not None:
                        texture = _decode_image(gltf, binary, src)
            voffset += n

    if not verts:
        raise ValueError(f"no triangle meshes in {path}")
    out = {
        "vertices": np.concatenate(verts, axis=0),
        "faces": np.concatenate(faces, axis=0),
        "uv": np.concatenate(uvs, axis=0),
    }
    colors = np.concatenate(cols, axis=0)
    if not np.isnan(colors).all():
        out["vertex_colors"] = np.nan_to_num(colors, nan=0.5)
    normals = np.concatenate(norms, axis=0)
    if not np.isnan(normals).all():
        out["normals"] = np.nan_to_num(normals, nan=0.0)
    if texture is not None:
        out["texture"] = texture
    return out


def load_animated_glb(path: str):
    """Reconstruct per-frame vertices from a morph-target weights animation.

    Replaces the reference's Blender depsgraph frame extraction
    (reference: evaluation/evaluation_pcd.py:19-170). Returns
    ``(base_vertices (V,3), faces (F,3), frames (T,V,3), times (T,))`` for the
    first animated mesh node; each frame applies that keyframe's morph weights.
    """
    with open(path, "rb") as f:
        gltf, binary = _read_chunks(f.read())
    anims = gltf.get("animations", [])
    if not anims:
        raise ValueError(f"{path} has no animations")
    anim = anims[0]
    channel = next(c for c in anim["channels"]
                   if c["target"].get("path") == "weights")
    sampler = anim["samplers"][channel["sampler"]]
    times = _accessor_data(gltf, binary, sampler["input"]).reshape(-1)
    weights_flat = _accessor_data(gltf, binary, sampler["output"]).reshape(-1)

    node = gltf["nodes"][channel["target"]["node"]]
    mesh = gltf["meshes"][node["mesh"]]
    prim = mesh["primitives"][0]
    base = _accessor_data(gltf, binary, prim["attributes"]["POSITION"]).astype(np.float32)
    faces = _accessor_data(gltf, binary, prim["indices"]).reshape(-1, 3).astype(np.int64) \
        if "indices" in prim else np.arange(len(base)).reshape(-1, 3)
    targets = prim.get("targets", [])
    n_targets = len(targets)
    disps = np.stack([
        _accessor_data(gltf, binary, t["POSITION"]).astype(np.float32)
        for t in targets]) if n_targets else np.zeros((0, *base.shape), np.float32)

    weights = weights_flat.reshape(len(times), n_targets) if n_targets else \
        np.zeros((len(times), 0), np.float32)
    frames = base[None] + np.einsum("tk,kvd->tvd", weights, disps) \
        if n_targets else np.broadcast_to(base[None], (len(times), *base.shape))
    return base, faces, frames.astype(np.float32), times


# --------------------------------------------------------------------------- #
# Writing
# --------------------------------------------------------------------------- #
def _pad4(b: bytes, fill: bytes = b"\x00") -> bytes:
    return b + fill * (-len(b) % 4)


class _BinBuilder:
    def __init__(self):
        self.parts: list[bytes] = []
        self.views: list[dict] = []
        self.accessors: list[dict] = []
        self.offset = 0

    def add(self, arr: np.ndarray, gltf_type: str, component: int,
            target: int | None = None, minmax: bool = False) -> int:
        raw = _pad4(np.ascontiguousarray(arr).tobytes())
        view = {"buffer": 0, "byteOffset": self.offset, "byteLength": len(raw)}
        if target is not None:
            view["target"] = target
        self.parts.append(raw)
        self.offset += len(raw)
        self.views.append(view)
        acc: dict[str, Any] = {
            "bufferView": len(self.views) - 1,
            "componentType": component,
            "count": int(arr.shape[0]) if arr.ndim > 1 else int(arr.size),
            "type": gltf_type,
        }
        if minmax:
            a2 = arr.reshape(acc["count"], -1)
            acc["min"] = [float(x) for x in a2.min(axis=0)]
            acc["max"] = [float(x) for x in a2.max(axis=0)]
        self.accessors.append(acc)
        return len(self.accessors) - 1

    def add_raw(self, raw: bytes) -> dict:
        raw_p = _pad4(raw)
        view = {"buffer": 0, "byteOffset": self.offset, "byteLength": len(raw)}
        self.parts.append(raw_p)
        self.offset += len(raw_p)
        self.views.append(view)
        return view


def _write_glb(path: str, gltf: dict, binary: bytes) -> None:
    gltf.setdefault("asset", {"version": "2.0", "generator": "motion324_tpu"})
    json_bytes = _pad4(json.dumps(gltf, separators=(",", ":")).encode(), b" ")
    binary = _pad4(binary)
    total = 12 + 8 + len(json_bytes) + 8 + len(binary)
    with open(path, "wb") as f:
        f.write(struct.pack("<III", _MAGIC, 2, total))
        f.write(struct.pack("<II", len(json_bytes), _JSON_CHUNK))
        f.write(json_bytes)
        f.write(struct.pack("<II", len(binary), _BIN_CHUNK))
        f.write(binary)


_TEX_ENCODE_CACHE: dict = {}


def _encode_texture(texture) -> tuple[bytes, str]:
    """Image-encode a texture atlas, memoised on content.

    PNG-encoding a 2048^2 atlas costs ~1 s of host time per export (it
    dominated the product path's export phase); JPEG q95 is ~25x faster and
    both are valid glTF mime types — PNG (lossless) is kept for small
    textures. Even the JPEG encode is ~0.15 s and spikes to ~0.8 s under
    host CPU contention, so repeated exports of the same atlas (every clip
    of a video, every window of a batch) hit a small content-keyed cache:
    the key combines a strided pixel subsample with a full-array checksum,
    so any pixel change re-encodes.
    """
    t = np.asarray(texture)
    key = (t.shape, str(t.dtype), t[::109, ::113].tobytes(),
           float(t.sum(dtype=np.float64)))
    hit = _TEX_ENCODE_CACHE.get(key)
    if hit is not None:
        return hit
    from PIL import Image
    img = Image.fromarray((np.clip(t, 0, 1) * 255).astype(np.uint8))
    buf = _io.BytesIO()
    if img.width * img.height >= 1024 * 1024:
        img.save(buf, format="JPEG", quality=95)
        mime = "image/jpeg"
    else:
        img.save(buf, format="PNG")
        mime = "image/png"
    if len(_TEX_ENCODE_CACHE) >= 4:
        _TEX_ENCODE_CACHE.pop(next(iter(_TEX_ENCODE_CACHE)))
    _TEX_ENCODE_CACHE[key] = (buf.getvalue(), mime)
    return _TEX_ENCODE_CACHE[key]


def _base_mesh_json(b: _BinBuilder, vertices, faces, uv=None, texture=None,
                    vertex_colors=None):
    pos_acc = b.add(vertices.astype(np.float32), "VEC3", 5126, target=34962,
                    minmax=True)
    idx_acc = b.add(faces.astype(np.uint32).reshape(-1), "SCALAR", 5125,
                    target=34963)
    attributes = {"POSITION": pos_acc}
    gltf: dict[str, Any] = {}
    prim: dict[str, Any] = {"attributes": attributes, "indices": idx_acc,
                            "mode": 4}
    if uv is not None:
        attributes["TEXCOORD_0"] = b.add(uv.astype(np.float32), "VEC2", 5126,
                                         target=34962)
    if vertex_colors is not None:
        attributes["COLOR_0"] = b.add(vertex_colors.astype(np.float32), "VEC3",
                                      5126, target=34962)
    if texture is not None and uv is not None:
        raw_tex, mime = _encode_texture(texture)
        b.add_raw(raw_tex)
        gltf["images"] = [{"bufferView": len(b.views) - 1,
                           "mimeType": mime}]
        gltf["samplers"] = [{"magFilter": 9729, "minFilter": 9729,
                             "wrapS": 10497, "wrapT": 10497}]
        gltf["textures"] = [{"sampler": 0, "source": 0}]
        gltf["materials"] = [{"pbrMetallicRoughness": {
            "baseColorTexture": {"index": 0},
            "metallicFactor": 0.0, "roughnessFactor": 1.0}}]
        prim["material"] = 0
    return gltf, prim


def export_glb(path: str, vertices, faces, uv=None, texture=None,
               vertex_colors=None) -> None:
    """Write a static single-mesh GLB."""
    b = _BinBuilder()
    gltf, prim = _base_mesh_json(b, vertices, faces, uv, texture, vertex_colors)
    gltf.update({
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0, "name": "mesh"}],
        "meshes": [{"primitives": [prim]}],
        "buffers": [{"byteLength": b.offset}],
        "bufferViews": b.views,
        "accessors": b.accessors,
    })
    _write_glb(path, gltf, b"".join(b.parts))


def export_animated_glb(path: str, vertices, faces, trajectories, fps: int = 12,
                        uv=None, texture=None, vertex_colors=None) -> None:
    """Write an animated GLB: T morph targets + STEP-interpolated weights.

    ``trajectories``: (T, N, 3) absolute per-frame vertex positions. Frame t's
    morph target stores ``trajectories[t] - vertices``; the weights animation
    switches exactly one target on per frame with STEP interpolation —
    the same artefact the reference produces via Blender CONSTANT-keyframe
    shape keys (reference utils/render.py:117-200, 222-345).
    """
    trajectories = np.asarray(trajectories, np.float32)
    t_frames = trajectories.shape[0]
    b = _BinBuilder()
    gltf, prim = _base_mesh_json(b, vertices, faces, uv, texture, vertex_colors)

    targets = []
    base = np.asarray(vertices, np.float32)
    for t in range(t_frames):
        disp = trajectories[t] - base
        targets.append({"POSITION": b.add(disp, "VEC3", 5126, target=34962,
                                          minmax=True)})
    prim["targets"] = targets

    times = (np.arange(t_frames, dtype=np.float32) / float(fps))
    time_acc = b.add(times, "SCALAR", 5126, minmax=True)
    weights = np.zeros((t_frames, t_frames), np.float32)
    np.fill_diagonal(weights, 1.0)
    weights_acc = b.add(weights.reshape(-1), "SCALAR", 5126)

    gltf.update({
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0, "name": "animated_mesh"}],
        "meshes": [{"primitives": [prim], "weights": [0.0] * t_frames}],
        "animations": [{
            "samplers": [{"input": time_acc, "output": weights_acc,
                          "interpolation": "STEP"}],
            "channels": [{"sampler": 0,
                          "target": {"node": 0, "path": "weights"}}],
        }],
        "buffers": [{"byteLength": b.offset}],
        "bufferViews": b.views,
        "accessors": b.accessors,
    })
    _write_glb(path, gltf, b"".join(b.parts))
