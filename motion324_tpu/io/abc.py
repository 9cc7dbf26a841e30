"""Alembic (.abc, Ogawa container) export of animated meshes — no Blender.

Fills the reference's third export format: ``bpy.ops.wm.alembic_export`` of
the per-frame shape-key animation (reference utils/render.py:158-163,
316-321; GLB and FBX are covered by :mod:`motion324_tpu.io.glb` /
:mod:`motion324_tpu.io.fbx`).

Two layers, like Alembic itself:

**Ogawa container** (spec-exact; the simple part): little-endian file of
groups and data blobs.

  header   = "Ogawa" + frozen byte (0xff complete / 0x00 writing)
             + uint16 version (1) + uint64 root-group offset
  group    = uint64 child_count + child_count x uint64 addresses;
             an address with bit 63 SET points at a data blob (mask the bit),
             CLEAR at a group. 0 encodes the empty group, 0x8000... empty data.
  data     = uint64 byte_size + payload

**Alembic archive layer** (AbcCoreOgawa): the object/property encoding on
top of the container, written here to the published AbcCoreOgawa layout:

  root group children:
    [0] data  uint32: Ogawa file version (0)
    [1] data  uint32: writing-library version tag
    [2] group: top object
    [3] data : archive metadata string
    [4] data : time samplings (per sampling: uint32 max_samples,
               float64 time_per_cycle, uint32 samples_per_cycle,
               samples_per_cycle x float64 sample times)
    [5] data : indexed metadata (sequence of uint8-length-prefixed strings)

  object group:
    [0]    group: the object's top compound property
    [1..n] group: child objects
    [last] data : child-object headers — per child:
                  uint32 name_len + name + uint8 metadata_index
                  (0xff = inline: uint32 len + bytes) —
                  followed by a 32-byte trailer: the object's
                  [properties hash | children hash], 16 bytes each
                  (AbcCoreOgawa exposes these as getPropertiesHash /
                  getChildrenHash; readers parse headers from
                  [0, size-32))

  compound property group:
    [0..m-1] group: one per sub-property (compound -> same layout;
             scalar/array -> sample group)
    [last]   data : property headers — per property:
             uint32 info (bit table below) + [uint32 num_samples if simple]
             + [uint32 time_sampling_index if bit 6] + name + metadata
             (same encoding as object headers)

    info bits: 0-1 property type (0 compound / 1 scalar / 2 array);
               2-5 POD type (Alembic PlainOldDataType: bool=0, u8, i8, u16,
               i16, u32, i32, u64, i64, f16, f32=10, f64=11, string=12);
               6 has explicit time-sampling index; 8-15 extent.

  scalar/array property group: one data blob per sample =
    16-byte sample key + raw little-endian payload. The key is
    **MurmurHash3_x64_128(payload, seed=POD byte size)** — the hash
    Alembic >= 1.5 computes in ArraySample::getKey (our implementation is
    golden-tested against the canonical MurmurHash3.cpp,
    tests/test_hashes.py). Array samples of rank > 1 are followed by a
    dims data (uint64 per dim); rank-1 dims are derived from the byte
    size, as in AbcCoreOgawa.

  Hash trailer values: the 16-byte properties/children hashes in the
  object trailer are SpookyHash-V2 digests (the algorithm AbcCoreOgawa
  uses) over this writer's serialized header blobs; Alembic's own trailer
  values come from a recursive per-sample accumulation we do not
  replicate, but readers treat these digests as OPAQUE identity tokens
  (archive-diffing), so only presence + size are load-bearing.

The animated mesh is written as the AbcGeom PolyMesh schema property set:
object "mesh" with compound ".geom" holding time-sampled "P" (float32x3),
static ".faceIndices" (int32), ".faceCounts" (int32), and per-frame
"self_bnds" (float64x6 box), over a uniform time sampling at ``fps``.

VALIDATION BOUNDARY (honest): this environment has no Alembic library, no
Blender, and no egress, so byte-level acceptance by external readers cannot
be tested here; the layout above follows the published AbcCoreOgawa
structure, and :func:`read_abc` is an INDEPENDENT parser (container +
archive layer) used by the round-trip tests. A conformance corpus of tiny
golden archives plus the first-contact validation checklist lives in
``tests/goldens/`` (see ``tests/goldens/FIRST_CONTACT.md``).
"""

from __future__ import annotations

import struct

import numpy as np

from ..native import murmur3_x64_128, spooky_hash128

__all__ = ["export_animated_abc", "read_abc"]

_DATA_BIT = 1 << 63

# Alembic PlainOldDataType enum values
POD_INT32 = 6
POD_FLOAT32 = 10
POD_FLOAT64 = 11

PTYPE_COMPOUND = 0
PTYPE_SCALAR = 1
PTYPE_ARRAY = 2

LIB_VERSION = 10712  # "written by lib version" tag (1.7.12-era layout)


# --------------------------------------------------------------------------- #
# Ogawa container writer
# --------------------------------------------------------------------------- #
class _Writer:
    def __init__(self):
        self.parts: list[bytes] = []
        self.offset = 16  # header size

    def _append(self, b: bytes) -> int:
        at = self.offset
        self.parts.append(b)
        self.offset += len(b)
        return at

    def data(self, payload: bytes) -> int:
        """Write a data blob, return its child address (bit 63 set)."""
        if len(payload) == 0:
            return _DATA_BIT  # canonical empty data
        at = self._append(struct.pack("<Q", len(payload)) + payload)
        return at | _DATA_BIT

    def group(self, children: list[int]) -> int:
        """Write a group from already-written child addresses."""
        if not children:
            return 0  # canonical empty group
        return self._append(struct.pack(f"<Q{len(children)}Q",
                                        len(children), *children))

    def finish(self, root: int) -> bytes:
        header = b"Ogawa" + b"\xff" + struct.pack("<H", 1) \
            + struct.pack("<Q", root)
        return header + b"".join(self.parts)


# bytes per element of each PlainOldDataType we write — the murmur seed
# Alembic uses for sample keys (ArraySample::getKey seeds with PODNumBytes)
_POD_BYTES = {POD_INT32: 4, POD_FLOAT32: 4, POD_FLOAT64: 8}


def _key(payload: bytes, pod: int) -> bytes:
    return murmur3_x64_128(payload, seed=_POD_BYTES[pod])


def _name_meta(name: str, meta: str, meta_index: dict) -> bytes:
    out = struct.pack("<I", len(name)) + name.encode()
    if meta in meta_index:
        out += struct.pack("<B", meta_index[meta])
    else:
        out += b"\xff" + struct.pack("<I", len(meta)) + meta.encode()
    return out


class _Prop:
    """One property: compound (children) or simple (samples)."""

    def __init__(self, name: str, ptype: int, pod: int = 0, extent: int = 1,
                 tsidx: int = 0, meta: str = ""):
        self.name = name
        self.ptype = ptype
        self.pod = pod
        self.extent = extent
        self.tsidx = tsidx
        self.meta = meta
        self.children: list[_Prop] = []
        self.samples: list[np.ndarray] = []

    def add(self, child: "_Prop") -> "_Prop":
        self.children.append(child)
        return child

    def write(self, w: _Writer, meta_index: dict) -> int:
        if self.ptype == PTYPE_COMPOUND:
            kids = [c.write(w, meta_index) for c in self.children]
            hdr = b"".join(c.header(meta_index) for c in self.children)
            kids.append(w.data(hdr))
            return w.group(kids)
        entries = []
        for s in self.samples:
            payload = np.ascontiguousarray(s).tobytes()
            entries.append(w.data(_key(payload, self.pod) + payload))
            if s.ndim > 1 and self.ptype == PTYPE_ARRAY:
                # rank-1 dims are size-derived; higher ranks get a dims blob
                pass  # our schema writes flat (N*extent,) arrays: rank 1
        return w.group(entries)

    def header(self, meta_index: dict) -> bytes:
        info = (self.ptype & 0x3) | ((self.pod & 0xf) << 2) \
            | ((self.extent & 0xff) << 8)
        if self.tsidx:
            info |= 1 << 6
        out = struct.pack("<I", info)
        if self.ptype != PTYPE_COMPOUND:
            out += struct.pack("<I", len(self.samples))
            if self.tsidx:
                out += struct.pack("<I", self.tsidx)
        out += _name_meta(self.name, self.meta, meta_index)
        return out


# --------------------------------------------------------------------------- #
# Export
# --------------------------------------------------------------------------- #
def export_animated_abc(path: str, vertices, faces, trajectories=None,
                        fps: float = 12.0, name: str = "mesh") -> None:
    """Write an Ogawa/Alembic archive with one (optionally animated) PolyMesh.

    ``trajectories``: optional (T, V, 3) absolute per-frame vertex positions
    (the same artefact the GLB/FBX writers take); omitted = static mesh.
    Counterpart of the reference's ``bpy.ops.wm.alembic_export`` call
    (utils/render.py:158-163).
    """
    v = np.asarray(vertices, np.float32)
    f = np.asarray(faces, np.int64)
    frames = (np.asarray(trajectories, np.float32)
              if trajectories is not None else v[None])
    n_frames = len(frames)

    w = _Writer()
    meta_index: dict[str, int] = {"": 0}

    geom = _Prop(".geom", PTYPE_COMPOUND,
                 meta="schema=AbcGeom_PolyMesh_v1;schemaBaseType="
                      "AbcGeom_GeomBase_v1")
    p = geom.add(_Prop("P", PTYPE_ARRAY, POD_FLOAT32, extent=3,
                       tsidx=1 if n_frames > 1 else 0,
                       meta="interpretation=point"))
    for t in range(n_frames):
        p.samples.append(frames[t].reshape(-1).astype("<f4"))
    fi = geom.add(_Prop(".faceIndices", PTYPE_ARRAY, POD_INT32))
    fi.samples.append(f.reshape(-1).astype("<i4"))
    fc = geom.add(_Prop(".faceCounts", PTYPE_ARRAY, POD_INT32))
    fc.samples.append(np.full(len(f), 3, "<i4"))
    bnds = geom.add(_Prop(".selfBnds", PTYPE_SCALAR, POD_FLOAT64, extent=6,
                          tsidx=1 if n_frames > 1 else 0))
    for t in range(n_frames):
        lo, hi = frames[t].min(axis=0), frames[t].max(axis=0)
        bnds.samples.append(np.concatenate([lo, hi]).astype("<f8"))

    top_props = _Prop("", PTYPE_COMPOUND)
    top_props.add(geom)

    # mesh object group: [.prop group, child-headers data]. The headers
    # data ends with the 32-byte [properties|children] spooky hash trailer
    # (see module docstring); no children -> headers are trailer-only.
    mesh_props_at = top_props.write(w, meta_index)
    mesh_props_hdr = b"".join(c.header(meta_index)
                              for c in top_props.children)
    mesh_trailer = spooky_hash128(mesh_props_hdr) + spooky_hash128(b"")
    mesh_obj_at = w.group([mesh_props_at, w.data(mesh_trailer)])

    # top object: one child ("mesh"), empty own property set
    empty_props = w.group([w.data(b"")])  # compound with zero properties
    child_hdr = _name_meta(
        name, "schema=AbcGeom_PolyMesh_v1;schemaObjTitle="
              f"AbcGeom_PolyMesh_v1:{name}", meta_index)
    top_trailer = spooky_hash128(b"") \
        + spooky_hash128(child_hdr + mesh_trailer)
    top_obj_at = w.group([empty_props, mesh_obj_at,
                          w.data(child_hdr + top_trailer)])

    # time samplings: [0] identity (1 sample per cycle, cycle 1.0),
    # [1] uniform at 1/fps
    ts = struct.pack("<IdI", 1, 1.0, 1) + struct.pack("<d", 0.0)
    ts += struct.pack("<IdI", max(n_frames, 1), 1.0 / fps, 1) \
        + struct.pack("<d", 0.0)

    indexed_meta = struct.pack("<B", 0)  # [0] = the empty string

    root = w.group([
        w.data(struct.pack("<I", 0)),
        w.data(struct.pack("<I", LIB_VERSION)),
        top_obj_at,
        w.data(b"_ai_AlembicVersion=motion324_tpu io.abc"),
        w.data(ts),
        w.data(indexed_meta),
    ])
    with open(path, "wb") as fh:
        fh.write(w.finish(root))


# --------------------------------------------------------------------------- #
# Independent reader (round-trip validator)
# --------------------------------------------------------------------------- #
class _Reader:
    def __init__(self, buf: bytes):
        if buf[:5] != b"Ogawa":
            raise ValueError("not an Ogawa archive")
        if buf[5] != 0xFF:
            raise ValueError("archive not frozen (incomplete write)")
        (self.version,) = struct.unpack_from("<H", buf, 6)
        (self.root,) = struct.unpack_from("<Q", buf, 8)
        self.buf = buf

    def group(self, at: int) -> list[int]:
        if at == 0:
            return []
        (n,) = struct.unpack_from("<Q", self.buf, at)
        return list(struct.unpack_from(f"<{n}Q", self.buf, at + 8))

    def data(self, addr: int) -> bytes:
        at = addr & ~_DATA_BIT
        if at == 0:
            return b""
        (n,) = struct.unpack_from("<Q", self.buf, at)
        return self.buf[at + 8:at + 8 + n]

    @staticmethod
    def is_data(addr: int) -> bool:
        return bool(addr & _DATA_BIT)


def _parse_name_meta(b: bytes, off: int):
    (nlen,) = struct.unpack_from("<I", b, off)
    off += 4
    name = b[off:off + nlen].decode()
    off += nlen
    midx = b[off]
    off += 1
    meta = ""
    if midx == 0xFF:
        (mlen,) = struct.unpack_from("<I", b, off)
        off += 4
        meta = b[off:off + mlen].decode()
        off += mlen
    return name, meta, off


def _parse_prop_headers(b: bytes):
    out = []
    off = 0
    while off < len(b):
        (info,) = struct.unpack_from("<I", b, off)
        off += 4
        ptype = info & 0x3
        pod = (info >> 2) & 0xF
        extent = (info >> 8) & 0xFF
        nsamples = tsidx = 0
        if ptype != PTYPE_COMPOUND:
            (nsamples,) = struct.unpack_from("<I", b, off)
            off += 4
            if info & (1 << 6):
                (tsidx,) = struct.unpack_from("<I", b, off)
                off += 4
        name, meta, off = _parse_name_meta(b, off)
        out.append(dict(name=name, ptype=ptype, pod=pod, extent=extent,
                        nsamples=nsamples, tsidx=tsidx, meta=meta))
    return out


_POD_NP = {POD_INT32: "<i4", POD_FLOAT32: "<f4", POD_FLOAT64: "<f8"}


def _read_compound(r: _Reader, at: int) -> dict:
    kids = r.group(at)
    headers = _parse_prop_headers(r.data(kids[-1]))
    props = {}
    for child, hdr in zip(kids[:-1], headers):
        if hdr["ptype"] == PTYPE_COMPOUND:
            props[hdr["name"]] = dict(hdr, children=_read_compound(r, child))
        else:
            samples = []
            for s_addr in r.group(child):
                blob = r.data(s_addr)
                samples.append(np.frombuffer(blob[16:],
                                             _POD_NP[hdr["pod"]]))
            props[hdr["name"]] = dict(hdr, samples=samples)
    return props


def read_abc(path: str) -> dict:
    """Parse an archive written by :func:`export_animated_abc`.

    Returns ``{"objects": {name: {"props": ...}}, "time_samplings": [...],
    "lib_version": int}``. Independent of the writer's in-memory structures —
    it re-derives everything from bytes (the same external-validator pattern
    as tests/fbx_oracle.py for the FBX codec).
    """
    with open(path, "rb") as fh:
        r = _Reader(fh.read())
    root = r.group(r.root)
    if len(root) != 6:
        raise ValueError(f"root group has {len(root)} children, expected 6")
    (file_version,) = struct.unpack("<I", r.data(root[0]))
    (lib_version,) = struct.unpack("<I", r.data(root[1]))

    # time samplings
    ts_raw = r.data(root[4])
    samplings = []
    off = 0
    while off < len(ts_raw):
        max_s, tpc, spc = struct.unpack_from("<IdI", ts_raw, off)
        off += 16
        times = struct.unpack_from(f"<{spc}d", ts_raw, off)
        off += 8 * spc
        samplings.append(dict(max_samples=max_s, time_per_cycle=tpc,
                              sample_times=list(times)))

    def read_object(at: int) -> dict:
        kids = r.group(at)
        props = _read_compound(r, kids[0]) if kids[0] else {}
        children = {}
        hdr_blob = r.data(kids[-1])
        if len(hdr_blob) < 32:
            raise ValueError(
                f"object headers data is {len(hdr_blob)} bytes; the 32-byte"
                " [properties|children] hash trailer is mandatory")
        hashes = hdr_blob[-32:]
        hdr_blob = hdr_blob[:-32]
        off = 0
        names = []
        while off < len(hdr_blob):
            nm, meta, off = _parse_name_meta(hdr_blob, off)
            names.append((nm, meta))
        for (nm, meta), child_at in zip(names, kids[1:-1]):
            children[nm] = dict(read_object(child_at), meta=meta)
        return {"props": props, "children": children,
                "properties_hash": hashes[:16], "children_hash": hashes[16:]}

    top = read_object(root[2])
    return {"file_version": file_version, "lib_version": lib_version,
            "objects": top["children"], "time_samplings": samplings}
