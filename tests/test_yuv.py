"""I420 wire-format codec: round-trip accuracy + pipeline wiring."""

import numpy as np
import pytest

from motion324_tpu.inference.yuv import rgb_to_yuv420, yuv420_to_rgb


def _smooth_frames(t=2, h=32, w=32, seed=0):
    """Low-pass random frames: the content class the codec is built for
    (decoded mp4 chroma is already 4:2:0-smooth)."""
    rng = np.random.RandomState(seed)
    x = rng.rand(t, h // 4, w // 4, 3).astype(np.float32)
    x = np.repeat(np.repeat(x, 4, axis=1), 4, axis=2)
    from scipy.ndimage import gaussian_filter
    x = gaussian_filter(x, sigma=(0, 2, 2, 0))
    return (x * 255).astype(np.uint8)


def test_roundtrip_real_product_video():
    """Wire error statistics on the real product content class (decoded
    mp4, resized to the model input size): sub-1/255 on average; local
    error concentrates at sharp chroma edges (measured: chili mean
    0.6/255, p99 14/255, max 72/255 — why the flag defaults OFF)."""
    import os
    path = "/root/reference/examples/chili.mp4"
    if not os.path.exists(path):
        pytest.skip("reference examples not mounted")
    from motion324_tpu.inference.pipeline import load_video, resize_frames
    video = resize_frames(load_video(path, 8, dtype=np.uint8), 224)
    rgb = np.asarray(yuv420_to_rgb(rgb_to_yuv420(video)))
    err = np.abs(rgb - video.astype(np.float32) / 255.0)
    assert err.mean() <= 1.5 / 255.0
    assert np.percentile(err, 99) <= 20.0 / 255.0


def test_gray_content_near_exact():
    """Chroma-free content survives with only the u8 rounding of Y."""
    g = np.linspace(0, 255, 32, dtype=np.uint8)
    video = np.broadcast_to(g[None, :, None, None], (1, 32, 32, 3)).copy()
    rgb = np.asarray(yuv420_to_rgb(rgb_to_yuv420(video)))
    err = np.abs(rgb - video.astype(np.float32) / 255.0)
    assert err.max() <= 1.5 / 255.0


def test_plane_shapes_and_sizes():
    video = _smooth_frames(t=3, h=28, w=28)
    planes = rgb_to_yuv420(video)
    assert planes["y"].shape == (3, 28, 28)
    assert planes["u"].shape == planes["v"].shape == (3, 14, 14)
    raw = sum(p.nbytes for p in planes.values())
    assert raw * 2 == video.nbytes  # 1.5 B/px vs 3 B/px

    # leading batch axis passes through
    planes_b = rgb_to_yuv420(video[None])
    assert planes_b["y"].shape == (1, 3, 28, 28)
    np.testing.assert_array_equal(planes_b["y"][0], planes["y"])
    rgb_b = np.asarray(yuv420_to_rgb(planes_b))
    np.testing.assert_allclose(rgb_b[0], np.asarray(yuv420_to_rgb(planes)),
                               atol=1e-6)


def test_pipeline_yuv_close_to_rgb():
    """predict() with yuv420_upload tracks the RGB-upload trajectories on
    smooth video (identical model, wire-format error only)."""
    import jax
    from motion324_tpu.inference.pipeline import (MotionPipeline,
                                                  prepare_mesh_inputs)
    from motion324_tpu.io.mesh import TriMesh
    from motion324_tpu.models.motion_model import ModelConfig, MotionLatentModel
    from tests.test_pipeline import CUBE_F, CUBE_V, SMALL

    mesh = TriMesh(vertices=CUBE_V, faces=CUBE_F)
    inputs, _, _ = prepare_mesh_inputs(mesh, num_shape_samples=64)
    model = MotionLatentModel(SMALL)
    sample = dict(inputs, rgb_video=np.zeros((1, 3, 28, 28, 3), np.float32))
    params = model.init(jax.random.PRNGKey(0), sample)

    video = _smooth_frames(t=3, h=28, w=28, seed=2)
    rgb_pipe = MotionPipeline(SMALL, params, window=3, decode_chunk=16)
    yuv_pipe = MotionPipeline(SMALL, params, window=3, decode_chunk=16,
                              yuv420_upload=True)
    want = rgb_pipe.predict(inputs, video)
    got = yuv_pipe.predict(inputs, video)
    assert got.shape == want.shape
    assert np.isfinite(got).all()
    # wire-format error stays small through the (random-weight) model
    assert np.abs(got - want).max() < 0.05
    assert np.abs(got - want).mean() < 5e-3

    # float input bypasses the wire format entirely
    got_f = yuv_pipe.predict(inputs, video.astype(np.float32) / 255.0)
    want_f = rgb_pipe.predict(inputs, video.astype(np.float32) / 255.0)
    np.testing.assert_allclose(got_f, want_f, atol=2e-5)
