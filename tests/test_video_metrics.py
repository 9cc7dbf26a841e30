"""Video metrics: protocol, PSNR/SSIM, Fréchet distance, LPIPS behaviour."""

import numpy as np
import pytest

from motion324_tpu.evaluation.video_metrics import (LPIPSVGG, compute_fvd,
                                                    frechet_distance,
                                                    lpips_distance,
                                                    prepare_video, psnr, ssim,
                                                    split_subvideos)


def test_prepare_video_resizes_and_pads():
    frames = np.random.RandomState(0).rand(5, 16, 20, 3).astype(np.float32)
    out = prepare_video(frames, size=32, min_frames=12)
    assert out.shape == (12, 32, 32, 3)
    # reflect padding: frame 5 == frame 3 (reflection about the last frame)
    np.testing.assert_allclose(out[5], out[3], atol=1e-6)


def test_split_subvideos():
    frames = np.zeros((70, 8, 8, 3), np.float32)
    subs = split_subvideos(frames, length=32)
    assert len(subs) == 2
    assert all(s.shape[0] == 32 for s in subs)


def test_psnr_known_values():
    a = np.zeros((8, 8, 3))
    assert psnr(a, a) == float("inf")
    b = a + 0.1
    np.testing.assert_allclose(psnr(a, b), 20.0, atol=1e-6)  # 10*log10(1/0.01)


def test_ssim_bounds():
    rng = np.random.RandomState(1)
    a = rng.rand(32, 32, 3)
    assert ssim(a, a) == pytest.approx(1.0, abs=1e-6)
    assert ssim(a, 1 - a) < 0.5


def test_frechet_distance_identity_and_shift():
    rng = np.random.RandomState(2)
    f = rng.randn(500, 8)
    assert frechet_distance(f, f) == pytest.approx(0.0, abs=1e-6)
    shift = np.full(8, 2.0)
    d = frechet_distance(f, f + shift)
    # pure mean shift: FD = ||shift||^2 = 32
    assert d == pytest.approx(32.0, rel=0.05)


def test_compute_fvd_with_plug_features():
    rng = np.random.RandomState(3)
    v1 = [rng.rand(4, 8, 8, 3) for _ in range(20)]
    v2 = [rng.rand(4, 8, 8, 3) + 0.5 for _ in range(20)]
    feat = lambda v: v.mean(axis=(0, 1, 2))
    same = compute_fvd(v1, v1, feat)
    diff = compute_fvd(v1, v2, feat)
    assert same == pytest.approx(0.0, abs=1e-8)
    assert diff > same


def test_lpips_zero_for_identical_and_positive_for_different():
    model = LPIPSVGG()
    rng = np.random.RandomState(4)
    a = rng.rand(64, 64, 3).astype(np.float32)
    b = rng.rand(64, 64, 3).astype(np.float32)
    assert model(a, a) == pytest.approx(0.0, abs=1e-5)
    assert model(a, b) > 1e-4


def test_lpips_distance_video():
    model = LPIPSVGG()
    v1 = np.random.RandomState(5).rand(2, 64, 64, 3).astype(np.float32)
    d = lpips_distance(v1, v1, model)
    assert d == pytest.approx(0.0, abs=1e-5)


def test_i3d_features_and_fvd():
    """I3D video features: deterministic, clip-sensitive, and pluggable into
    the FVD protocol (reference fvd.py:9-18, calculate_fvd.py:15-80)."""
    from motion324_tpu.evaluation.i3d import I3D, i3d_feature_fn
    fn = i3d_feature_fn(size=64)  # small crop: CI-cheap, same architecture
    rng = np.random.RandomState(0)
    v1 = rng.rand(8, 64, 64, 3).astype(np.float32)
    v2 = rng.rand(8, 64, 64, 3).astype(np.float32)
    f1 = fn(v1)
    assert f1.shape == (400,)
    np.testing.assert_allclose(f1, fn(v1), atol=1e-6)  # deterministic
    assert not np.allclose(f1, fn(v2))                  # content-sensitive

    vids1 = [rng.rand(8, 64, 64, 3).astype(np.float32) for _ in range(4)]
    vids2 = [v + 0.05 for v in vids1]
    d_same = compute_fvd(vids1, vids1, fn)
    d_diff = compute_fvd(vids1, vids2, fn)
    assert d_same == pytest.approx(0.0, abs=1e-4)
    assert d_diff > d_same
