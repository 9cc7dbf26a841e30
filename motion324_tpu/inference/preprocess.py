"""Video preprocessing: frame extraction, background removal, global crop.

Equivalent of the reference's ``utils/rmbg_for_black_bg.py`` CLI (reference:
rmbg_for_black_bg.py:29-381): per-frame foreground segmentation, a binary
mask at alpha > 0.8, a GLOBAL bounding box over all frames (so the subject
does not jitter across crops), square crop centred on that box with padding,
and resize to 512x512 on black background.
"""

from __future__ import annotations

import os

import numpy as np

from motion324_tpu.inference.segmentation import segment_frames

__all__ = ["global_bbox", "crop_and_center", "preprocess_video_frames"]


def global_bbox(masks: np.ndarray, margin: float = 0.05):
    """Union bounding box over all frame masks, expanded by ``margin``.

    masks: (T, H, W) in {0, 1}. Returns (y0, y1, x0, x1).
    """
    any_mask = masks.max(axis=0) > 0.5
    if not any_mask.any():
        h, w = any_mask.shape
        return 0, h, 0, w
    ys, xs = np.where(any_mask)
    y0, y1 = ys.min(), ys.max() + 1
    x0, x1 = xs.min(), xs.max() + 1
    h, w = any_mask.shape
    my = int((y1 - y0) * margin)
    mx = int((x1 - x0) * margin)
    return max(0, y0 - my), min(h, y1 + my), max(0, x0 - mx), min(w, x1 + mx)


def crop_and_center(frame: np.ndarray, bbox, size: int = 512) -> np.ndarray:
    """Crop to bbox, pad to square, resize to ``size`` (black background)."""
    import cv2
    y0, y1, x0, x1 = bbox
    crop = frame[y0:y1, x0:x1]
    h, w = crop.shape[:2]
    side = max(h, w)
    pad_y, pad_x = (side - h) // 2, (side - w) // 2
    sq = np.zeros((side, side, crop.shape[2]), crop.dtype)
    sq[pad_y:pad_y + h, pad_x:pad_x + w] = crop
    return cv2.resize(sq, (size, size), interpolation=cv2.INTER_AREA)


def preprocess_video_frames(frames: np.ndarray, params=None,
                            alpha_threshold: float = 0.8,
                            size: int = 512, model=None):
    """frames (T, H, W, 3) in [0,1] -> (masked 512^2 frames, masks, bbox).

    Background pixels are blacked out (the model is trained on black-background
    renders — reference rmbg_for_black_bg.py:29-70). ``model`` selects the
    segmentation network for converted ``params`` (U2Net default; pass an
    :class:`~motion324_tpu.inference.segmentation.ISNet` to match the
    reference CLI's isnet-general-use session, rmbg_for_black_bg.py:26).
    """
    masks = segment_frames(frames, params=params, model=model,
                           threshold=alpha_threshold
                           if params is not None else 0.5)
    bbox = global_bbox(masks)
    out_frames = []
    out_masks = []
    for t in range(len(frames)):
        fg = frames[t] * masks[t][..., None]
        out_frames.append(crop_and_center(fg.astype(np.float32), bbox, size))
        m = crop_and_center(masks[t][..., None].astype(np.float32), bbox, size)
        out_masks.append(m[..., 0] if m.ndim == 3 else m)  # cv2 drops C=1
    return np.stack(out_frames), np.stack(out_masks), bbox
