"""SD AutoencoderKL (image VAE) in flax, NHWC.

Required by the texture-diffusion pipeline (reference:
scripts/hy3dgen/texgen/hunyuanpaint/pipeline.py:231-266 ``encode_images`` —
the reference uses the diffusers AutoencoderKL bundled with HunyuanPaint).
Standard SD topology: 4 resolution stages (128/256/512/512 channels at full
size), GroupNorm/SiLU resnets, a mid block with single-head attention, 8x
spatial downsampling to a 4-channel latent with the usual 0.18215 scaling.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["AutoencoderKL", "SCALING_FACTOR"]

Dtype = Any
SCALING_FACTOR = 0.18215


def _gn(x, name):
    c = x.shape[-1]
    g = min(32, c)
    while c % g:
        g -= 1
    return nn.GroupNorm(num_groups=g, epsilon=1e-6, name=name)(x)


class _Resnet(nn.Module):
    out_ch: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.silu(_gn(x, "norm1"))
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        h = nn.silu(_gn(h, "norm2"))
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype,
                        name="shortcut")(x)
        return x + h


class _MidAttn(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        res = x
        x = _gn(x, "norm")
        flat = x.reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(flat)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(flat)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(flat)
        attn = jax.nn.softmax(
            jnp.einsum("bqc,bkc->bqk", q, k) / jnp.sqrt(c), axis=-1)
        out = jnp.einsum("bqk,bkc->bqc", attn, v)
        out = nn.Dense(c, dtype=self.dtype, name="to_out")(out)
        return res + out.reshape(b, h, w, c)


class AutoencoderKL(nn.Module):
    block_channels: tuple = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    dtype: Dtype = jnp.float32

    def setup(self):
        pass  # compact methods below

    @nn.compact
    def encode(self, x):
        """(B, H, W, 3) -> (mean, logvar) latents at H/8 x W/8."""
        h = nn.Conv(self.block_channels[0], (3, 3), padding=1,
                    dtype=self.dtype, name="enc_conv_in")(x)
        for bi, ch in enumerate(self.block_channels):
            for li in range(self.layers_per_block):
                h = _Resnet(ch, self.dtype, name=f"enc_{bi}_res_{li}")(h)
            if bi < len(self.block_channels) - 1:
                # diffusers' VAE Encoder downsamples with ASYMMETRIC padding:
                # Downsample2D(padding=0) pads (0,1,0,1) right/bottom only —
                # symmetric padding is numerically wrong vs released weights
                h = nn.Conv(ch, (3, 3), strides=2,
                            padding=((0, 1), (0, 1)),
                            dtype=self.dtype, name=f"enc_{bi}_down")(h)
        h = _Resnet(self.block_channels[-1], self.dtype, name="enc_mid_res0")(h)
        h = _MidAttn(self.dtype, name="enc_mid_attn")(h)
        h = _Resnet(self.block_channels[-1], self.dtype, name="enc_mid_res1")(h)
        h = nn.silu(_gn(h, "enc_norm_out"))
        moments = nn.Conv(2 * self.latent_channels, (3, 3), padding=1,
                          dtype=self.dtype, name="enc_conv_out")(h)
        moments = nn.Conv(2 * self.latent_channels, (1, 1), dtype=self.dtype,
                          name="quant_conv")(moments)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, logvar

    @nn.compact
    def decode(self, z):
        """(B, h, w, 4) latents -> (B, 8h, 8w, 3) image."""
        h = nn.Conv(self.latent_channels, (1, 1), dtype=self.dtype,
                    name="post_quant_conv")(z)
        h = nn.Conv(self.block_channels[-1], (3, 3), padding=1,
                    dtype=self.dtype, name="dec_conv_in")(h)
        h = _Resnet(self.block_channels[-1], self.dtype, name="dec_mid_res0")(h)
        h = _MidAttn(self.dtype, name="dec_mid_attn")(h)
        h = _Resnet(self.block_channels[-1], self.dtype, name="dec_mid_res1")(h)
        for i, ch in enumerate(reversed(self.block_channels)):
            for li in range(self.layers_per_block + 1):
                h = _Resnet(ch, self.dtype, name=f"dec_{i}_res_{li}")(h)
            if i < len(self.block_channels) - 1:
                b, hh, ww, c = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, c),
                                     method="nearest")
                h = nn.Conv(c, (3, 3), padding=1, dtype=self.dtype,
                            name=f"dec_{i}_up")(h)
        h = nn.silu(_gn(h, "dec_norm_out"))
        return nn.Conv(3, (3, 3), padding=1, dtype=self.dtype,
                       name="dec_conv_out")(h).astype(jnp.float32)

    def __call__(self, x):
        mean, _ = self.encode(x)
        return self.decode(mean * 1.0)
