"""Data pipeline: Dyscene16k dataset, barycentric tracking, prefetch loader."""

from motion324_tpu.data.tracking import track_points, sample_texture_colors  # noqa: F401
from motion324_tpu.data.dyscene import DysceneDataset, PrefetchLoader, collate  # noqa: F401
