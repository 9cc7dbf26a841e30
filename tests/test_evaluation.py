"""Geometry metrics: identity cases, known perturbations, ICP recovery of a
known rigid+scale transform, animated-GLB frame extraction roundtrip."""

import numpy as np
import pytest

from motion324_tpu.evaluation.geometry import (apply_icp, chamfer_distance,
                                               evaluate_sequence, fscore,
                                               icp_align, voxel_iou)
from motion324_tpu.io.glb import export_animated_glb, load_animated_glb

CUBE_V = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                   [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]], np.float32) - 0.5
CUBE_F = np.array([[0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7],
                   [0, 1, 5], [0, 5, 4], [2, 3, 7], [2, 7, 6],
                   [1, 2, 6], [1, 6, 5], [3, 0, 4], [3, 4, 7]], np.int64)


def _cloud(n=2000, seed=0):
    return np.random.RandomState(seed).randn(n, 3).astype(np.float32) * 0.2


def test_chamfer_identity_zero():
    p = _cloud()
    assert chamfer_distance(p, p) == 0.0


def test_chamfer_known_offset():
    p = _cloud()
    q = p + np.array([0.1, 0, 0], np.float32)
    # every NN distance is <= 0.1; sum-of-means is <= 0.2 and > 0
    c = chamfer_distance(p, q)
    assert 0 < c <= 0.2 + 1e-6


def test_fscore_identity_and_far():
    p = _cloud()
    assert fscore(p, p) == 1.0
    assert fscore(p, p + 10.0) == 0.0


def test_voxel_iou_identity_and_disjoint():
    p = _cloud()
    assert voxel_iou(p, p) == 1.0
    assert voxel_iou(p, p + 100.0) == 0.0


def test_icp_recovers_known_transform():
    rng = np.random.RandomState(3)
    src = rng.randn(3000, 3).astype(np.float64) * 0.3
    theta = 0.3
    r_true = np.array([[np.cos(theta), -np.sin(theta), 0],
                       [np.sin(theta), np.cos(theta), 0],
                       [0, 0, 1.0]])
    t_true = np.array([0.05, -0.02, 0.03])
    s_true = 1.03
    tgt = s_true * (src @ r_true.T) + t_true

    r, t, s, err = icp_align(src, tgt, max_iterations=200)
    aligned = apply_icp(src, r, t, s)
    assert err < 1e-3
    np.testing.assert_allclose(aligned, tgt, atol=5e-3)
    assert 0.95 <= s <= 1.05


def test_icp_scale_clipped():
    src = _cloud(1000, 5).astype(np.float64)
    tgt = src * 1.5  # true scale far outside the clip range
    _, _, s, _ = icp_align(src, tgt)
    assert 0.95 <= s <= 1.05


def test_evaluate_sequence_perfect_match():
    frames = np.stack([CUBE_V, CUBE_V + 0.1, CUBE_V * 1.1])
    out = evaluate_sequence(frames, CUBE_F, frames, CUBE_F, num_points=20000)
    # chamfer floor is sampling density (~2/sqrt(n/area)); iou is exact surface
    assert out["chamfer"] < 0.025
    assert out["fscore"] > 0.95
    assert out["iou"] > 0.99
    assert len(out["per_frame"]["chamfer"]) == 3


def test_evaluate_sequence_detects_mismatch():
    frames = np.stack([CUBE_V, CUBE_V])
    warped = frames.copy()
    warped[1] = warped[1] * np.array([1.0, 1.0, 2.0], np.float32)  # stretched
    good = evaluate_sequence(frames, CUBE_F, frames, CUBE_F, num_points=5000)
    bad = evaluate_sequence(frames, CUBE_F, warped, CUBE_F, num_points=5000)
    assert bad["chamfer"] > good["chamfer"]
    assert bad["fscore"] < good["fscore"]


def test_animated_glb_frame_extraction(tmp_path):
    path = str(tmp_path / "anim.glb")
    t_frames = 4
    trajs = np.stack([CUBE_V + 0.05 * t for t in range(t_frames)]).astype(np.float32)
    export_animated_glb(path, CUBE_V, CUBE_F, trajs, fps=10)
    base, faces, frames, times = load_animated_glb(path)
    np.testing.assert_allclose(base, CUBE_V, atol=1e-6)
    np.testing.assert_array_equal(faces, CUBE_F)
    assert frames.shape == (t_frames, 8, 3)
    np.testing.assert_allclose(frames, trajs, atol=1e-5)
    np.testing.assert_allclose(times, np.arange(t_frames) / 10.0, atol=1e-6)
