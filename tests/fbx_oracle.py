"""Independent binary-FBX parser used as a third-party oracle in tests.

Written from the publicly documented Kaydara binary FBX format (the format
description published on the Blender developer blog, "FBX binary file format
specification"), deliberately sharing no code with
``motion324_tpu/io/fbx.py``: this module is a STRICT validating parser — it
checks the header magic, version, every node record's EndOffset arithmetic,
the PropertyListLen byte counts, the 13-byte NULL terminator records, array
encodings, and the footer layout — so structural bugs in the writer that a
lenient reader (like the writer's own ``load_fbx``) would silently absorb
fail loudly here.

The reference's product contract is "an FBX other tools can open"
(reference: utils/render.py:117-200, utils/convert_fbx.py:95-180).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

MAGIC = b"Kaydara FBX Binary  \x00\x1a\x00"

_SCALAR = {
    b"Y": ("<h", 2), b"C": ("<b", 1), b"I": ("<i", 4), b"F": ("<f", 4),
    b"D": ("<d", 8), b"L": ("<q", 8),
}
_ARRAY = {
    b"f": np.dtype("<f4"), b"d": np.dtype("<f8"),
    b"l": np.dtype("<i8"), b"i": np.dtype("<i4"), b"b": np.dtype("<i1"),
}


class FBXFormatError(ValueError):
    pass


class Node:
    __slots__ = ("name", "props", "children")

    def __init__(self, name, props):
        self.name = name
        self.props = props
        self.children = []

    def first(self, name):
        for c in self.children:
            if c.name == name:
                return c
        return None

    def all(self, name):
        return [c for c in self.children if c.name == name]


def _parse_property(buf: memoryview, at: int):
    code = bytes(buf[at:at + 1])
    at += 1
    if code in _SCALAR:
        fmt, size = _SCALAR[code]
        if at + size > len(buf):
            raise FBXFormatError("scalar property overruns buffer")
        return struct.unpack_from(fmt, buf, at)[0], at + size
    if code in (b"S", b"R"):
        (length,) = struct.unpack_from("<I", buf, at)
        at += 4
        if at + length > len(buf):
            raise FBXFormatError("string/raw property overruns buffer")
        data = bytes(buf[at:at + length])
        return (data.decode("utf-8", "strict") if code == b"S" else data), \
            at + length
    if code in _ARRAY:
        count, encoding, byte_len = struct.unpack_from("<III", buf, at)
        at += 12
        if encoding not in (0, 1):
            raise FBXFormatError(f"unknown array encoding {encoding}")
        if at + byte_len > len(buf):
            raise FBXFormatError("array property overruns buffer")
        payload = bytes(buf[at:at + byte_len])
        at += byte_len
        if encoding == 1:
            payload = zlib.decompress(payload)
        dt = _ARRAY[code]
        if len(payload) != count * dt.itemsize:
            raise FBXFormatError(
                f"array byte length {len(payload)} != count {count} x "
                f"itemsize {dt.itemsize}")
        return np.frombuffer(payload, dt, count=count), at
    raise FBXFormatError(f"unknown property type code {code!r}")


def _parse_node(buf: memoryview, at: int):
    """Returns (node_or_None, next_offset). None = 13-byte NULL record."""
    end_offset, num_props, prop_list_len = struct.unpack_from("<III", buf, at)
    name_len = buf[at + 12]
    if end_offset == 0:
        if num_props or prop_list_len or name_len:
            raise FBXFormatError("corrupt NULL record")
        return None, at + 13
    name = bytes(buf[at + 13:at + 13 + name_len]).decode("ascii", "strict")
    at2 = at + 13 + name_len
    props = []
    prop_start = at2
    for _ in range(num_props):
        p, at2 = _parse_property(buf, at2)
        props.append(p)
    if at2 - prop_start != prop_list_len:
        raise FBXFormatError(
            f"node {name}: PropertyListLen {prop_list_len} != actual "
            f"{at2 - prop_start}")
    node = Node(name, props)
    if at2 < end_offset:
        # nested scope: child records then a NULL terminator
        while at2 < end_offset:
            child, at2 = _parse_node(buf, at2)
            if child is None:
                break
            node.children.append(child)
        if at2 != end_offset:
            raise FBXFormatError(
                f"node {name}: children end at {at2}, EndOffset says "
                f"{end_offset}")
    elif at2 != end_offset:
        raise FBXFormatError(f"node {name}: EndOffset mismatch")
    return node, end_offset


def parse(path: str):
    """Strictly parse a binary FBX file -> (version, top-level Node list)."""
    with open(path, "rb") as f:
        data = f.read()
    buf = memoryview(data)
    if bytes(buf[:23]) != MAGIC:
        raise FBXFormatError("bad header magic")
    (version,) = struct.unpack_from("<I", buf, 23)
    if version < 7100:
        raise FBXFormatError(f"unsupported version {version}")
    if version >= 7500:
        raise FBXFormatError("64-bit offset variant not handled by oracle")
    at = 27
    roots = []
    while at < len(buf):
        node, at = _parse_node(buf, at)
        if node is None:
            break
    # the top-level scope also terminates with a NULL record
        roots.append(node)
    # footer: opaque 16 bytes, pad to 16, 4 zero bytes, version, 120 zeros,
    # fixed 16-byte magic — check gross layout
    rest = bytes(buf[at:])
    if len(rest) < 16 + 4 + 4 + 120 + 16:
        raise FBXFormatError("footer truncated")
    return version, roots


def scene(path: str):
    """Parse + semantic extraction: mesh, UV, blend shapes, connections.

    Returns a dict with vertices (V,3), faces (list of index tuples,
    polygon-decoded from PolygonVertexIndex), uv (N,2) or None, shapes
    {name: (indexes, deltas)}, connections (list of tuples), and
    curve data {curve_id: (times_sec, values)}.
    """
    version, roots = parse(path)
    by_name = {}
    for r in roots:
        by_name.setdefault(r.name, []).append(r)
    if "Objects" not in by_name or "Connections" not in by_name:
        raise FBXFormatError("missing Objects/Connections sections")
    objects = by_name["Objects"][0]

    vertices = None
    faces = []
    uv = None
    shapes = {}
    ids = {}  # id -> (class, name)
    for node in objects.children:
        if len(node.props) >= 3 and isinstance(node.props[0], int):
            ids[node.props[0]] = (node.name, node.props[1], node.props[2])
        if node.name == "Geometry" and node.props[2] == "Mesh":
            v = node.first("Vertices").props[0]
            if len(v) % 3:
                raise FBXFormatError("Vertices not a multiple of 3")
            vertices = np.asarray(v, np.float64).reshape(-1, 3)
            pvi = np.asarray(node.first("PolygonVertexIndex").props[0])
            poly = []
            for x in pvi:
                if x < 0:
                    poly.append(~int(x))  # bitwise-NOT end-of-polygon marker
                    faces.append(tuple(poly))
                    poly = []
                else:
                    poly.append(int(x))
            if poly:
                raise FBXFormatError("PolygonVertexIndex missing terminator")
            if any(i >= len(vertices) or i < 0
                   for f_ in faces for i in f_):
                raise FBXFormatError("face index out of range")
            layer = node.first("LayerElementUV")
            if layer is not None:
                vals = np.asarray(layer.first("UV").props[0],
                                  np.float64).reshape(-1, 2)
                ref = layer.first("ReferenceInformationType").props[0]
                if ref == "IndexToDirect":
                    idx = np.asarray(layer.first("UVIndex").props[0])
                    if idx.max() >= len(vals):
                        raise FBXFormatError("UVIndex out of range")
                uv = vals
        elif node.name == "Geometry" and node.props[2] == "Shape":
            sname = str(node.props[1]).split("::")[-1]
            idx = np.asarray(node.first("Indexes").props[0], np.int64)
            deltas = np.asarray(node.first("Vertices").props[0],
                                np.float64).reshape(-1, 3)
            if len(idx) != len(deltas):
                raise FBXFormatError("Shape Indexes/Vertices length mismatch")
            shapes[sname] = (idx, deltas)

    connections = []
    for c in by_name["Connections"][0].all("C"):
        connections.append(tuple(c.props))

    curves = {}
    for node in objects.children:
        if node.name == "AnimationCurve":
            cid = node.props[0]
            t = np.asarray(node.first("KeyTime").props[0], np.int64)
            vals = np.asarray(node.first("KeyValueFloat").props[0],
                              np.float32)
            if len(t) != len(vals):
                raise FBXFormatError("KeyTime/KeyValueFloat length mismatch")
            curves[cid] = (t / 46186158000.0, vals)

    return {"version": version, "vertices": vertices, "faces": faces,
            "uv": uv, "shapes": shapes, "connections": connections,
            "curves": curves, "ids": ids}
