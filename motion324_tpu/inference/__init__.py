"""Inference: sliding-window long-video pipeline, smoothing, export."""

from motion324_tpu.inference.smoothing import smooth_trajectories, OneEuroFilter  # noqa: F401
from motion324_tpu.inference.windowing import sliding_window_predict  # noqa: F401
