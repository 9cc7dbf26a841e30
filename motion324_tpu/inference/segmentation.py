"""Foreground segmentation: U2Net in flax + heuristic fallback.

Fills the role of the reference's rembg-based segmentation (reference:
utils/inference_utils.py:198-289 ``segment_foreground_with_u2net`` and
utils/rmbg_for_black_bg.py — U2Net / isnet-general-use ONNX sessions). The
classic U2Net architecture (RSU-blocks U-net of U-nets) is implemented as a
jittable flax module so weights converted from the public checkpoints run as
part of the fused preprocessing graph; when no weights are supplied, a
border-statistics color-distance fallback provides mask estimates so the
pipeline stays runnable end-to-end.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = ["U2Net", "ISNet", "segment_frames", "threshold_segment"]

Dtype = Any


class _ConvBNReLU(nn.Module):
    features: int
    dilation: int = 1
    strides: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(self.features, (3, 3), padding=self.dilation,
                    strides=(self.strides, self.strides),
                    kernel_dilation=(self.dilation, self.dilation),
                    dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, dtype=self.dtype,
                         name="bn")(x)
        return nn.relu(x)


def _down(x):
    return nn.max_pool(x, (2, 2), strides=(2, 2), padding="SAME")


def _up_to(x, target):
    return jax.image.resize(x, (*x.shape[:1], target.shape[1],
                                target.shape[2], x.shape[-1]),
                            method="bilinear")


class RSU(nn.Module):
    """Residual U-block of the given height (U2Net's basic unit)."""

    height: int
    mid: int
    out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        xin = _ConvBNReLU(self.out, dtype=self.dtype, name="conv_in")(x)

        encs = []
        h = _ConvBNReLU(self.mid, dtype=self.dtype, name="enc_0")(xin)
        encs.append(h)
        for i in range(1, self.height - 1):
            h = _ConvBNReLU(self.mid, dtype=self.dtype, name=f"enc_{i}")(_down(h))
            encs.append(h)
        h = _ConvBNReLU(self.mid, dilation=2, dtype=self.dtype,
                        name="bottom")(h)
        for i in range(self.height - 2, -1, -1):
            h = _up_to(h, encs[i]) if h.shape[1] != encs[i].shape[1] else h
            h = _ConvBNReLU(self.out if i == 0 else self.mid,
                            dtype=self.dtype, name=f"dec_{i}")(
                jnp.concatenate([h, encs[i]], axis=-1))
        return h + xin


class RSU4F(nn.Module):
    """Dilated (no-pooling) variant used at the deepest stages."""

    mid: int
    out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        xin = _ConvBNReLU(self.out, dtype=self.dtype, name="conv_in")(x)
        h1 = _ConvBNReLU(self.mid, dilation=1, dtype=self.dtype, name="e1")(xin)
        h2 = _ConvBNReLU(self.mid, dilation=2, dtype=self.dtype, name="e2")(h1)
        h3 = _ConvBNReLU(self.mid, dilation=4, dtype=self.dtype, name="e3")(h2)
        h4 = _ConvBNReLU(self.mid, dilation=8, dtype=self.dtype, name="e4")(h3)
        d3 = _ConvBNReLU(self.mid, dilation=4, dtype=self.dtype, name="d3")(
            jnp.concatenate([h4, h3], -1))
        d2 = _ConvBNReLU(self.mid, dilation=2, dtype=self.dtype, name="d2")(
            jnp.concatenate([d3, h2], -1))
        d1 = _ConvBNReLU(self.out, dilation=1, dtype=self.dtype, name="d1")(
            jnp.concatenate([d2, h1], -1))
        return d1 + xin


class U2Net(nn.Module):
    """U2Net saliency network: (B, H, W, 3) in [0,1] -> (B, H, W) mask in [0,1].

    Standard full-size configuration (stages RSU7..RSU4F, mids 32..256) with
    side outputs fused by a 1x1 conv, sigmoid head.
    """

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h0, w0, _ = x.shape
        s1 = RSU(7, 32, 64, self.dtype, name="stage1")(x)
        s2 = RSU(6, 32, 128, self.dtype, name="stage2")(_down(s1))
        s3 = RSU(5, 64, 256, self.dtype, name="stage3")(_down(s2))
        s4 = RSU(4, 128, 512, self.dtype, name="stage4")(_down(s3))
        s5 = RSU4F(256, 512, self.dtype, name="stage5")(_down(s4))
        s6 = RSU4F(256, 512, self.dtype, name="stage6")(_down(s5))

        d5 = RSU4F(256, 512, self.dtype, name="stage5d")(
            jnp.concatenate([_up_to(s6, s5), s5], -1))
        d4 = RSU(4, 128, 256, self.dtype, name="stage4d")(
            jnp.concatenate([_up_to(d5, s4), s4], -1))
        d3 = RSU(5, 64, 128, self.dtype, name="stage3d")(
            jnp.concatenate([_up_to(d4, s3), s3], -1))
        d2 = RSU(6, 32, 64, self.dtype, name="stage2d")(
            jnp.concatenate([_up_to(d3, s2), s2], -1))
        d1 = RSU(7, 16, 64, self.dtype, name="stage1d")(
            jnp.concatenate([_up_to(d2, s1), s1], -1))

        sides = []
        for name, feat in [("side1", d1), ("side2", d2), ("side3", d3),
                           ("side4", d4), ("side5", d5), ("side6", s6)]:
            s = nn.Conv(1, (3, 3), padding=1, dtype=self.dtype, name=name)(feat)
            if s.shape[1] != h0:
                s = jax.image.resize(s, (b, h0, w0, 1), method="bilinear")
            sides.append(s)
        fused = nn.Conv(1, (1, 1), dtype=self.dtype, name="outconv")(
            jnp.concatenate(sides, -1))
        return jax.nn.sigmoid(fused[..., 0].astype(jnp.float32))


class ISNet(nn.Module):
    """IS-Net ("isnet-general-use") — the reference preprocessing CLI's
    segmentation model (reference: utils/rmbg_for_black_bg.py:26).

    DIS ISNetDIS layout: a stride-2 Conv-BN-ReLU stem, then the U2Net RSU
    encoder/decoder (RSU7..RSU4F) WITHOUT the fused ``outconv`` — the mask is
    the sigmoid of the first side output, bilinearly upsampled to the input
    size (rembg consumes ``sigmoid(d1)``). Channels are parameterised so tiny
    configurations can be parity-tested against a torch oracle; defaults are
    the released isnet-general-use dims.
    """

    mids: tuple = (32, 32, 64, 128, 256, 256)       # stage1..6 mid channels
    outs: tuple = (64, 128, 256, 512, 512, 512)     # stage1..6 out channels
    dec_mids: tuple = (16, 32, 64, 128, 256)        # stage1d..5d
    dec_outs: tuple = (64, 64, 128, 256, 512)       # stage1d..5d
    stem: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h0, w0, _ = x.shape
        m, o, dm, do = self.mids, self.outs, self.dec_mids, self.dec_outs
        hxin = _ConvBNReLU(self.stem, strides=2, dtype=self.dtype,
                           name="conv_in")(x)
        s1 = RSU(7, m[0], o[0], self.dtype, name="stage1")(hxin)
        s2 = RSU(6, m[1], o[1], self.dtype, name="stage2")(_down(s1))
        s3 = RSU(5, m[2], o[2], self.dtype, name="stage3")(_down(s2))
        s4 = RSU(4, m[3], o[3], self.dtype, name="stage4")(_down(s3))
        s5 = RSU4F(m[4], o[4], self.dtype, name="stage5")(_down(s4))
        s6 = RSU4F(m[5], o[5], self.dtype, name="stage6")(_down(s5))

        d5 = RSU4F(dm[4], do[4], self.dtype, name="stage5d")(
            jnp.concatenate([_up_to(s6, s5), s5], -1))
        d4 = RSU(4, dm[3], do[3], self.dtype, name="stage4d")(
            jnp.concatenate([_up_to(d5, s4), s4], -1))
        d3 = RSU(5, dm[2], do[2], self.dtype, name="stage3d")(
            jnp.concatenate([_up_to(d4, s3), s3], -1))
        d2 = RSU(6, dm[1], do[1], self.dtype, name="stage2d")(
            jnp.concatenate([_up_to(d3, s2), s2], -1))
        d1 = RSU(7, dm[0], do[0], self.dtype, name="stage1d")(
            jnp.concatenate([_up_to(d2, s1), s1], -1))

        side = nn.Conv(1, (3, 3), padding=1, dtype=self.dtype,
                       name="side1")(d1)
        side = jax.image.resize(side, (b, h0, w0, 1), method="bilinear")
        return jax.nn.sigmoid(side[..., 0].astype(jnp.float32))


def threshold_segment(frames: np.ndarray, border: int = 8,
                      sigma_factor: float = 4.0) -> np.ndarray:
    """Heuristic fallback: background model from border pixels.

    Estimates a background color distribution from the frame borders and marks
    pixels whose Mahalanobis-ish distance exceeds ``sigma_factor`` deviations
    as foreground. Vectorised over all frames.
    """
    frames = np.asarray(frames, np.float32)
    t, h, w, _ = frames.shape
    bmask = np.zeros((h, w), bool)
    bmask[:border] = bmask[-border:] = True
    bmask[:, :border] = bmask[:, -border:] = True
    border_pix = frames[:, bmask]  # (T, P, 3)
    mean = border_pix.mean(axis=1, keepdims=True)  # (T, 1, 3)
    std = border_pix.std(axis=1, keepdims=True) + 1e-3
    dist = np.abs(frames.reshape(t, -1, 3) - mean) / std
    fg = (dist.max(axis=-1) > sigma_factor).reshape(t, h, w)
    return fg.astype(np.float32)


def segment_frames(frames: np.ndarray, params=None, model: U2Net | None = None,
                   threshold: float = 0.5, batch: int = 8) -> np.ndarray:
    """(T, H, W, 3) frames -> (T, H, W) float mask; U2Net when params given."""
    if params is None:
        return threshold_segment(frames)
    model = model or U2Net()

    @jax.jit
    def run(x):
        return model.apply(params, x)

    t = len(frames)
    outs = []
    for i in range(0, t, batch):
        chunk = frames[i:i + batch]
        pad = batch - len(chunk)
        if pad:
            chunk = np.concatenate([chunk, np.zeros_like(chunk[:1]).repeat(pad, 0)])
        m = np.asarray(run(jnp.asarray(chunk)))
        outs.append(m[:len(frames[i:i + batch])])
    mask = np.concatenate(outs)
    return (mask > threshold).astype(np.float32)
