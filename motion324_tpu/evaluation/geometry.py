"""Geometry evaluation: Chamfer / F-score@0.02 / voxel IoU@128 with
scale-clipped point-to-point ICP alignment.

Metric-parity port of the reference's geometry evaluation protocol
(reference: evaluation/evaluation_pcd.py):

- bidirectional Chamfer as the SUM of mean NN distances (:575-588);
- F-score at threshold 0.02 (:591-609);
- voxel IoU at resolution 128 (:612-637) — here via surface-point voxelisation
  (the reference voxelises with trimesh at pitch 1/128; with dense enough
  samples the occupied-surface-voxel sets agree);
- ICP (:205-503): bbox-ratio initial scale clipped to [0.95, 1.05] (x/y extents
  only), NN correspondences + Kabsch updates, optional smoothed scale
  re-estimation clipped to the same range;
- per-frame evaluation over animated sequences with unit-cube normalisation
  driven by the first frame (:171-203, 746-917).
"""

from __future__ import annotations

import numpy as np
from scipy.spatial import cKDTree

__all__ = ["chamfer_distance", "fscore", "voxel_iou", "icp_align",
           "apply_icp", "evaluate_sequence", "sample_frame_points"]


def chamfer_distance(points1: np.ndarray, points2: np.ndarray) -> float:
    """Sum of the two mean nearest-neighbour distances."""
    d1, _ = cKDTree(points1).query(points2, k=1)
    d2, _ = cKDTree(points2).query(points1, k=1)
    return float(np.mean(d1) + np.mean(d2))


def fscore(points1: np.ndarray, points2: np.ndarray,
           threshold: float = 0.02) -> float:
    d1, _ = cKDTree(points1).query(points2, k=1)
    d2, _ = cKDTree(points2).query(points1, k=1)
    precision = float(np.mean(d1 < threshold))
    recall = float(np.mean(d2 < threshold))
    if precision + recall == 0:
        return 0.0
    return 2 * precision * recall / (precision + recall)


def _voxel_keys(points: np.ndarray, pitch: float, origin: np.ndarray):
    keys = np.floor((points - origin) / pitch).astype(np.int64)
    packed = (keys[:, 0] << 42) | (keys[:, 1] << 21) | keys[:, 2]
    return np.unique(packed)


def voxelize_surface(vertices: np.ndarray, faces: np.ndarray, pitch: float,
                     origin: np.ndarray) -> np.ndarray:
    """Occupied surface-voxel keys via dense deterministic triangle sampling.

    Each triangle is covered with a barycentric grid at ~pitch/2 spacing, so
    every voxel the surface passes through is marked (the trimesh
    ``.voxelized`` equivalent the reference relies on at
    evaluation_pcd.py:612-637, without the trimesh dependency).
    """
    tri = vertices[faces].astype(np.float64)  # (F, 3, 3)
    edge = np.maximum(np.linalg.norm(tri[:, 1] - tri[:, 0], axis=-1),
                      np.maximum(np.linalg.norm(tri[:, 2] - tri[:, 1], axis=-1),
                                 np.linalg.norm(tri[:, 0] - tri[:, 2], axis=-1)))
    levels = np.clip(np.ceil(2.0 * edge / pitch).astype(np.int64) + 1, 1, 512)
    chunks = []
    for k in np.unique(levels):
        sub = tri[levels == k]
        ij = np.stack(np.meshgrid(np.arange(k + 1), np.arange(k + 1),
                                  indexing="ij"), -1).reshape(-1, 2)
        ij = ij[ij.sum(-1) <= k]
        u = ij[:, 0] / k
        v = ij[:, 1] / k
        bary = np.stack([1 - u - v, u, v], axis=-1)  # (P, 3)
        pts = np.einsum("pk,fkd->fpd", bary, sub).reshape(-1, 3)
        chunks.append(_voxel_keys(pts, pitch, origin))
    return np.unique(np.concatenate(chunks))


def voxel_iou(points1, points2, resolution: int = 128,
              faces1=None, faces2=None) -> float:
    """IoU of occupied surface voxels at pitch ``1/resolution``.

    With ``faces`` given, the true surfaces are voxelised (matches the
    reference's mesh voxelisation); otherwise the point clouds are quantised.
    """
    pitch = 1.0 / resolution
    origin = np.minimum(points1.min(axis=0), points2.min(axis=0)) - 0.5 * pitch
    if faces1 is not None and faces2 is not None:
        k1 = voxelize_surface(points1, faces1, pitch, origin)
        k2 = voxelize_surface(points2, faces2, pitch, origin)
    else:
        k1 = _voxel_keys(points1, pitch, origin)
        k2 = _voxel_keys(points2, pitch, origin)
    union = np.union1d(k1, k2).size
    if union == 0:
        return 0.0
    return float(np.intersect1d(k1, k2).size / union)


def icp_align(source: np.ndarray, target: np.ndarray,
              max_iterations: int = 100, tolerance: float = 1e-7,
              optimize_scale: bool = True):
    """Point-to-point ICP with scale clipped to [0.95, 1.05].

    Returns ``(R, t, s, error)`` such that ``aligned = s * (source @ R.T) + t``.
    """
    src = np.asarray(source, np.float64)
    tgt = np.asarray(target, np.float64)

    def xy_range(p):
        ext = p.max(axis=0) - p.min(axis=0)
        return np.max(ext[:2])

    s_range = xy_range(src)
    scale = np.clip(xy_range(tgt) / s_range, 0.95, 1.05) if s_range > 1e-10 else 1.0

    r_mat = np.eye(3)
    t_vec = np.zeros(3)
    prev_error = np.inf
    error = np.inf
    tree = cKDTree(tgt)

    for _ in range(max_iterations):
        moved = scale * (src @ r_mat.T) + t_vec
        dists, idx = tree.query(moved)
        matched = tgt[idx]
        error = float(np.mean(dists))
        if abs(prev_error - error) < tolerance:
            break
        prev_error = error

        mc, tc = moved.mean(axis=0), matched.mean(axis=0)
        h = (moved - mc).T @ (matched - tc)
        u, _, vt = np.linalg.svd(h)
        r_delta = vt.T @ u.T
        if np.linalg.det(r_delta) < 0:
            vt[-1] *= -1
            r_delta = vt.T @ u.T
        r_mat = r_delta @ r_mat
        t_vec = r_delta @ (t_vec - mc) + tc
        # re-orthogonalise for numerical stability
        u, _, vt = np.linalg.svd(r_mat)
        r_mat = u @ vt

        if optimize_scale:
            rotated = src @ r_mat.T + t_vec
            _, idx2 = tree.query(scale * (src @ r_mat.T) + t_vec)
            num = float(np.sum(tgt[idx2] * rotated))
            den = float(np.sum(rotated * rotated))
            if den > 1e-10:
                scale = np.clip(0.8 * scale + 0.2 * np.clip(num / den, 0.95, 1.05),
                                0.95, 1.05)

    return r_mat, t_vec, float(scale), error


def apply_icp(points: np.ndarray, r_mat, t_vec, scale) -> np.ndarray:
    return scale * (points @ np.asarray(r_mat).T) + np.asarray(t_vec)


def sample_frame_points(vertices: np.ndarray, faces: np.ndarray,
                        num_points: int = 50000, seed: int = 0) -> np.ndarray:
    """Uniform surface samples for one frame (reference :569-572 uses 50k)."""
    from motion324_tpu.io.mesh import TriMesh, sample_surface
    pts, _, _ = sample_surface(TriMesh(vertices=vertices, faces=faces),
                               num_points, seed=seed)
    return pts


def _unit_normalize(frames: np.ndarray) -> np.ndarray:
    """Normalise ALL frames with frame-0's bbox (reference :171-203)."""
    v0 = frames[0]
    center = (v0.max(axis=0) + v0.min(axis=0)) / 2
    scale = 2 * (np.abs(v0 - center).max() + 1e-8)
    return (frames - center) / scale


def evaluate_sequence(gt_frames, gt_faces, pred_frames, pred_faces,
                      num_points: int = 50000, fscore_threshold: float = 0.02,
                      iou_resolution: int = 128, align: bool = True) -> dict:
    """Per-frame Chamfer/F-score/IoU over two animated meshes.

    ICP is solved once on frame 0 and the same transform is applied to every
    predicted frame (reference :746-917 caches frame-0 ICP params).
    """
    gt_frames = _unit_normalize(np.asarray(gt_frames, np.float32))
    pred_frames = _unit_normalize(np.asarray(pred_frames, np.float32))
    t_frames = min(len(gt_frames), len(pred_frames))

    if align:
        src = sample_frame_points(pred_frames[0], pred_faces, num_points, seed=1)
        tgt = sample_frame_points(gt_frames[0], gt_faces, num_points, seed=2)
        r_mat, t_vec, scale, _ = icp_align(src, tgt)
    else:
        r_mat, t_vec, scale = np.eye(3), np.zeros(3), 1.0

    per_frame = {"chamfer": [], "fscore": [], "iou": []}
    for t in range(t_frames):
        gt_pts = sample_frame_points(gt_frames[t], gt_faces, num_points,
                                     seed=100 + t)
        pred_pts = sample_frame_points(pred_frames[t], pred_faces, num_points,
                                       seed=200 + t)
        pred_pts = apply_icp(pred_pts, r_mat, t_vec, scale).astype(np.float32)
        pred_verts = apply_icp(pred_frames[t], r_mat, t_vec, scale).astype(np.float32)
        per_frame["chamfer"].append(chamfer_distance(gt_pts, pred_pts))
        per_frame["fscore"].append(fscore(gt_pts, pred_pts, fscore_threshold))
        per_frame["iou"].append(voxel_iou(gt_frames[t], pred_verts,
                                          iou_resolution,
                                          faces1=gt_faces, faces2=pred_faces))

    return {
        "per_frame": per_frame,
        "chamfer": float(np.mean(per_frame["chamfer"])),
        "fscore": float(np.mean(per_frame["fscore"])),
        "iou": float(np.mean(per_frame["iou"])),
        "icp": {"R": r_mat.tolist(), "t": t_vec.tolist(), "scale": scale},
    }
