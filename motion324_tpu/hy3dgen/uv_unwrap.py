"""UV atlas generation: normal-clustered box projection with shelf packing.

Fills the role of the reference's xatlas unwrap (reference:
scripts/hy3dgen/texgen/utils/uv_warp_utils.py:20-36 ``mesh_uv_wrap``): give
every face a UV coordinate so textures can be baked and exported. Faces are
clustered into six axis-aligned charts by dominant normal, each chart's
connected components are projected orthographically along their axis, and the
resulting islands are shelf-packed into [0, 1]^2 with a texel margin.
Like xatlas (which returns a ``vmapping``), vertices shared between charts are
duplicated, and a vertex remap is returned.
"""

from __future__ import annotations

import numpy as np

from motion324_tpu.io.mesh import TriMesh, face_normals

__all__ = ["unwrap_uv"]

_AXES = np.array([
    [1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1],
], np.float32)
# projection basis (u_axis, v_axis) per direction
_BASIS = [
    ((0, 1, 0), (0, 0, 1)), ((0, 1, 0), (0, 0, 1)),
    ((1, 0, 0), (0, 0, 1)), ((1, 0, 0), (0, 0, 1)),
    ((1, 0, 0), (0, 1, 0)), ((1, 0, 0), (0, 1, 0)),
]


def _connected_components(faces_subset: np.ndarray) -> np.ndarray:
    """Label faces by vertex-connected component within a chart."""
    idx_map: dict[int, int] = {}
    parent: list[int] = []

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra

    def vid(v):
        if v not in idx_map:
            idx_map[v] = len(parent)
            parent.append(len(parent))
        return idx_map[v]

    for f in faces_subset:
        a, b, c = (vid(int(x)) for x in f)
        union(a, b)
        union(a, c)
    labels = np.empty(len(faces_subset), np.int64)
    for i, f in enumerate(faces_subset):
        labels[i] = find(idx_map[int(f[0])])
    _, labels = np.unique(labels, return_inverse=True)
    return labels


def unwrap_uv(mesh: TriMesh, texture_size: int = 1024, margin_px: int = 4):
    """Unwrap a mesh into a packed UV atlas.

    Returns a new :class:`TriMesh` with per-corner-duplicated vertices, filled
    ``uv``, plus ``vmapping`` (new-vertex -> original-vertex indices), the
    analogue of xatlas' vmapping used by the reference to remap baked results
    back onto the watertight mesh (utils/convert_fbx.py:252-340).
    """
    v = mesh.vertices
    fn = face_normals(v, mesh.faces)
    chart_of_face = np.argmax(fn @ _AXES.T, axis=1)

    islands = []  # (face_indices, uv_per_corner (F,3,2))
    for chart in range(6):
        fsel = np.where(chart_of_face == chart)[0]
        if len(fsel) == 0:
            continue
        faces_c = mesh.faces[fsel]
        labels = _connected_components(faces_c)
        u_ax = np.asarray(_BASIS[chart][0], np.float32)
        v_ax = np.asarray(_BASIS[chart][1], np.float32)
        for comp in range(labels.max() + 1):
            fc = fsel[labels == comp]
            tri = v[mesh.faces[fc]]  # (F, 3, 3)
            uu = tri @ u_ax
            vv = tri @ v_ax
            if chart % 2 == 1:  # mirror odd directions for consistent winding
                uu = -uu
            uv = np.stack([uu, vv], axis=-1)  # (F, 3, 2)
            uv -= uv.reshape(-1, 2).min(axis=0)
            islands.append((fc, uv))

    # shelf packing by island height
    sizes = [isl[1].reshape(-1, 2).max(axis=0) + 1e-8 for isl in islands]
    order = np.argsort([-s[1] for s in sizes])
    total_area = float(sum(s[0] * s[1] for s in sizes))
    scale = 0.9 / np.sqrt(total_area)  # initial guess; shrink until it fits
    margin = margin_px / texture_size

    for _ in range(20):
        placements, ok = _shelf_pack([sizes[i] * scale for i in order], margin)
        if ok:
            break
        scale *= 0.92
    else:
        raise RuntimeError("uv packing failed")

    new_faces = []
    new_uv = []
    new_vmap = []
    cursor = 0
    for rank, isl_idx in enumerate(order):
        fc, uv = islands[isl_idx]
        off = placements[rank]
        uv_scaled = uv * scale + off
        n_f = len(fc)
        corner_ids = cursor + np.arange(n_f * 3).reshape(n_f, 3)
        new_faces.append(corner_ids)
        new_uv.append(uv_scaled.reshape(-1, 2))
        new_vmap.append(mesh.faces[fc].reshape(-1))
        cursor += n_f * 3

    vmapping = np.concatenate(new_vmap)
    out = TriMesh(
        vertices=v[vmapping],
        faces=np.concatenate(new_faces),
        uv=np.clip(np.concatenate(new_uv), 0.0, 1.0).astype(np.float32),
        vertex_colors=None if mesh.vertex_colors is None
        else mesh.vertex_colors[vmapping],
        texture=mesh.texture,
    )
    return out, vmapping


def _shelf_pack(sizes, margin):
    """Simple shelf packer in [0,1]^2; returns (offsets, fits)."""
    placements = []
    x = margin
    y = margin
    shelf_h = 0.0
    for w, h in sizes:
        if x + w + margin > 1.0:
            y += shelf_h + margin
            x = margin
            shelf_h = 0.0
        if y + h + margin > 1.0 or w + 2 * margin > 1.0:
            return placements, False
        placements.append(np.array([x, y], np.float32))
        x += w + margin
        shelf_h = max(shelf_h, h)
    return placements, True
