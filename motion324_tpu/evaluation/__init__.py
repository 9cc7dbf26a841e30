"""Evaluation: geometry metrics (Chamfer / F-score / voxel IoU with ICP) and
video metrics harness."""

from motion324_tpu.evaluation.geometry import (  # noqa: F401
    chamfer_distance,
    fscore,
    voxel_iou,
    icp_align,
    evaluate_sequence,
)
