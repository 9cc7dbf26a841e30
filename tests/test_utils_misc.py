"""Visualization, profiling, delight, images2video utilities."""

import os

import numpy as np
import pytest


def test_visualize_input_data(tmp_path):
    from motion324_tpu.utils.visualization import visualize_input_data
    inputs = {
        "ref_shape_pcd": np.random.RandomState(0).randn(1, 100, 3),
        "ref_pcd": np.random.RandomState(1).randn(1, 50, 3),
        "ref_shape_rgbs": np.random.RandomState(2).rand(1, 100, 3),
        "ref_shape_normals": np.random.RandomState(3).randn(1, 100, 3),
    }
    out = visualize_input_data(inputs, str(tmp_path / "vis.png"))
    assert os.path.getsize(out) > 1000


def test_visualize_motion_gif(tmp_path):
    from motion324_tpu.utils.visualization import visualize_point_cloud_motion
    trajs = np.random.RandomState(0).randn(1, 3, 50, 3).astype(np.float32)
    out = visualize_point_cloud_motion(trajs, str(tmp_path / "m.gif"),
                                       gt=trajs)
    assert os.path.getsize(out) > 1000


def test_plot_smoothing_comparison(tmp_path):
    from motion324_tpu.utils.visualization import plot_smoothing_comparison
    t = np.random.RandomState(0).randn(1, 5, 30, 3).astype(np.float32)
    out = plot_smoothing_comparison(t, t * 0.5, 0.002,
                                    str(tmp_path / "s.png"))
    assert os.path.getsize(out) > 1000


def test_phase_timer_noop_when_disabled():
    from motion324_tpu.utils.profiling import phase_timer, timed
    with phase_timer("x"):
        pass

    @timed("y")
    def f():
        return 1

    assert f() == 1


def test_color_recorrection_matches_stats():
    from motion324_tpu.hy3dgen.delight import color_recorrection
    rng = np.random.RandomState(0)
    orig = rng.rand(32, 32, 3).astype(np.float32) * 0.5 + 0.25
    edited = orig * 0.5 + 0.3  # shifted/scaled
    out = color_recorrection(edited, orig)
    for c in range(3):
        assert abs(out[..., c].mean() - orig[..., c].mean()) < 0.02
        assert abs(out[..., c].std() - orig[..., c].std()) < 0.02


def test_delight_flattens_shading():
    from motion324_tpu.hy3dgen.delight import delight_image
    rng = np.random.RandomState(1)
    base = np.full((64, 64, 3), 0.5, np.float32)
    shade = np.linspace(0.4, 1.0, 64)[:, None, None].astype(np.float32)
    shaded = np.clip(base * shade, 0, 1)
    out = delight_image(shaded)
    # shading gradient reduced: column-mean variance shrinks
    var_in = np.var(shaded.mean(axis=(1, 2)))
    var_out = np.var(out.mean(axis=(1, 2)))
    assert var_out < var_in


def test_images2video_natural_sort(tmp_path):
    import sys
    sys.path.insert(0, "scripts")
    from images2video import natural_key
    names = ["frame_10.png", "frame_2.png", "frame_1.png"]
    assert sorted(names, key=natural_key) == ["frame_1.png", "frame_2.png",
                                              "frame_10.png"]
