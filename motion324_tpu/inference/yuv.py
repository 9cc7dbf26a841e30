"""YUV 4:2:0 video upload codec: halve host->device tunnel traffic again.

Product videos arrive as mp4 (chroma already 4:2:0), so shipping frames as
I420 planes (1.5 bytes/pixel) instead of interleaved RGB u8 (3 bytes/pixel)
carries essentially the same information the source encoded — the chroma
detail RGB upload would preserve never existed in the file. The host side
converts decoded RGB u8 to BT.601 full-range Y + 2x2-box-subsampled U/V;
the device side (traced into the video-encode program) bilinearly upsamples
U/V and inverts the matrix. Measured wire error on the real product videos
(chili/tiger/wolf at the 224^2 model input size): MEAN 0.4-1.2/255 but up
to ~70/255 locally at sharp chroma edges (INTER_LINEAR downscaling aliases
chroma back above the 4:2:0 Nyquist) — which is why the flag defaults OFF;
it is an opt-in bandwidth/fidelity trade for tunnel-bound deployments.

Reference context: the reference uploads f32 RGB frames to the GPU over
PCIe (scripts/inference_with_video_mesh.py:357-392); over a ~25 MB/s TPU
tunnel the video transfer is a first-order e2e term, so the wire format is
a real knob here. Opt-in via ``MotionPipeline(yuv420_upload=True)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["rgb_to_yuv420", "yuv420_to_rgb"]

# BT.601 full-range (JPEG/JFIF) coefficients
_KR, _KG, _KB = 0.299, 0.587, 0.114


def rgb_to_yuv420(video: np.ndarray) -> dict:
    """(..., H, W, 3) uint8 RGB -> {"y": (...,H,W), "u": (...,H/2,W/2), "v"}.

    H and W must be even (the model input sizes are). U/V are 2x2 box means
    of the full-resolution chroma, offset-128, rounded to uint8. Leading
    dims (frames, batch) pass through unchanged.
    """
    assert video.dtype == np.uint8, "yuv420 upload expects uint8 frames"
    *lead, h, w, _ = video.shape
    assert h % 2 == 0 and w % 2 == 0, "yuv420 needs even frame dims"
    f = video.astype(np.float32)
    y = _KR * f[..., 0] + _KG * f[..., 1] + _KB * f[..., 2]
    # chroma is linear in RGB, so the 2x2 box mean commutes with the
    # transform: compute U/V from quarter-size averaged planes (4x less math
    # on the per-window upload path)
    sub = lambda p: p.reshape(*lead, h // 2, 2, w // 2, 2).mean(axis=(-3, -1))
    ys, rs, bs = sub(y), sub(f[..., 0]), sub(f[..., 2])
    u = (bs - ys) / (2.0 * (1.0 - _KB)) + 128.0
    v = (rs - ys) / (2.0 * (1.0 - _KR)) + 128.0
    to_u8 = lambda p: np.clip(np.rint(p), 0, 255).astype(np.uint8)
    return {"y": to_u8(y), "u": to_u8(u), "v": to_u8(v)}


def yuv420_to_rgb(planes: dict) -> jnp.ndarray:
    """Device-side inverse: I420 planes -> (..., H, W, 3) float32 in [0, 1].

    Traceable (used inside the jitted video-encode program). U/V upsample
    bilinearly; leading dims are untouched (matched sizes are identity
    under ``jax.image.resize``).
    """
    y = planes["y"].astype(jnp.float32)
    *lead, h, w = y.shape
    up = lambda p: jax.image.resize(p.astype(jnp.float32), (*lead, h, w),
                                    method="bilinear")
    u = up(planes["u"]) - 128.0
    v = up(planes["v"]) - 128.0
    r = y + 2.0 * (1.0 - _KR) * v
    b = y + 2.0 * (1.0 - _KB) * u
    g = (y - _KR * r - _KB * b) / _KG
    rgb = jnp.stack([r, g, b], axis=-1)
    return jnp.clip(rgb / 255.0, 0.0, 1.0)
