"""Sliding-window stitching semantics and trajectory smoothing."""

import numpy as np
import pytest

from motion324_tpu.inference.smoothing import smooth_trajectories
from motion324_tpu.inference.windowing import sliding_window_predict, window_starts


def _fake_forward(window):
    """Pretend the model returns, per output slot, the global index encoded in
    the input frame (frames are constant images of their index)."""
    t_w = window.shape[0]
    idx = window[:, 0, 0, 0]  # (T_w,)
    return np.broadcast_to(idx[None, :, None, None], (1, t_w, 2, 3)).astype(np.float32)


def _video(total_t):
    return np.broadcast_to(
        np.arange(total_t, dtype=np.float32)[:, None, None, None],
        (total_t, 4, 4, 3)).copy()


REF = np.full((1, 2, 3), -7.0, np.float32)


def test_short_video_single_window():
    out = sliding_window_predict(_fake_forward, _video(5), chunk=8, ref_pcd=REF)
    assert out.shape == (1, 5, 2, 3)
    np.testing.assert_array_equal(out[0, :, 0, 0], np.arange(5))


@pytest.mark.parametrize("total_t,chunk", [(23, 12), (100, 12), (12, 12),
                                           (13, 12), (24, 12), (257, 256),
                                           (30, 16)])
def test_stitched_frames_cover_video(total_t, chunk):
    """Every output slot t>0 must carry frame t's prediction; frame 0 = rest pose."""
    out = sliding_window_predict(_fake_forward, _video(total_t), chunk=chunk,
                                 ref_pcd=REF)
    assert out.shape[1] == total_t, (out.shape, total_t)
    if total_t <= chunk:
        np.testing.assert_array_equal(out[0, :, 0, 0], np.arange(total_t))
    else:
        np.testing.assert_array_equal(out[0, 0], REF[0])
        np.testing.assert_array_equal(out[0, 1:, 0, 0], np.arange(1, total_t))


def test_window_starts_tail():
    # 0..11, then stride-11 windows, tail adjusted
    assert window_starts(23, 12) == [0, 11]
    assert window_starts(24, 12) == [0, 11, 12]
    assert window_starts(12, 12) == [0]
    assert window_starts(100, 12) == [0, 11, 22, 33, 44, 55, 66, 77, 88]


def test_threshold_freezes_static_points():
    t = 6
    trajs = np.zeros((1, t, 2, 3), np.float32)
    # point 0 jitters below threshold; point 1 moves clearly
    rng = np.random.RandomState(0)
    trajs[0, :, 0] = rng.randn(t, 3) * 1e-4
    trajs[0, :, 1, 0] = np.linspace(0, 1, t)
    out = smooth_trajectories(trajs, method="threshold", motion_threshold=0.002)
    np.testing.assert_array_equal(out[0, :, 0], np.tile(trajs[0, 0, 0], (t, 1)))
    np.testing.assert_array_equal(out[0, :, 1], trajs[0, :, 1])


def test_gaussian_smoothing_reduces_jitter():
    t = 32
    rng = np.random.RandomState(1)
    base = np.sin(np.linspace(0, 3, t))[None, :, None, None]
    noisy = base + rng.randn(1, t, 4, 3) * 0.05
    out = smooth_trajectories(noisy.astype(np.float32), method="gaussian", sigma=1.0)
    assert np.abs(np.diff(out, axis=1)).mean() < np.abs(np.diff(noisy, axis=1)).mean()


def test_combined_matches_reference_order():
    """combined = threshold first, then gaussian over the frozen result."""
    t = 8
    trajs = np.random.RandomState(2).randn(1, t, 3, 3).astype(np.float32) * 0.2
    manual = smooth_trajectories(trajs, method="threshold", motion_threshold=0.01)
    from scipy.ndimage import gaussian_filter1d
    manual = gaussian_filter1d(manual, sigma=1.0, axis=1, mode="nearest")
    combined = smooth_trajectories(trajs, method="combined", motion_threshold=0.01)
    np.testing.assert_allclose(combined, manual, atol=1e-6)


def test_oneeuro_runs():
    trajs = np.random.RandomState(3).randn(1, 10, 4, 3).astype(np.float32)
    out = smooth_trajectories(trajs, method="oneeuro")
    assert out.shape == trajs.shape
    assert np.isfinite(out).all()
