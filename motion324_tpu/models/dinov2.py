"""DINOv2 ViT-B/14 image encoder in flax (frozen feature extractor).

TPU-native re-implementation of the frozen torch-hub ``dinov2_vitb14`` encoder
used by the reference (reference: model/image_encoder/dinov2.py:39-131). NHWC
layout throughout (TPU-friendly convs). Returns the 256 patch tokens for a
224x224 input (CLS token dropped), matching ``x_norm_patchtokens``.

Architecture (torch hub dinov2_vitb14): Conv 14x14/14 patchify -> prepend CLS ->
add interpolated pos-embed (stored at the 37x37 native-518px grid, bicubic
antialiased resize to the runtime grid, as in DINOv2's interpolate_pos_encoding)
-> 12 pre-norm blocks with LayerScale (eps 1e-6, qkv/proj/mlp biases) -> final
LayerNorm. Weights convert 1:1 from the torch checkpoint via
:mod:`motion324_tpu.utils.torch_convert`.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from motion324_tpu.ops.attention import multi_head_attention
from motion324_tpu.models.transformer import gelu

__all__ = ["DinoViT", "IMAGENET_MEAN", "IMAGENET_STD"]

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)

Dtype = Any


class _Attention(nn.Module):
    dim: int
    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, l, _ = x.shape
        hd = self.dim // self.num_heads
        qkv = nn.Dense(3 * self.dim, use_bias=True, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, l, self.num_heads, hd)
        k = k.reshape(b, l, self.num_heads, hd)
        v = v.reshape(b, l, self.num_heads, hd)
        out = multi_head_attention(q, k, v).reshape(b, l, self.dim)
        return nn.Dense(self.dim, use_bias=True, dtype=self.dtype, name="proj")(out)


class _Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: int = 4
    mlp_type: str = "mlp"  # "mlp" (ViT-S/B/L) or "swiglu" (ViT-g conditioner)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ls1 = self.param("ls1_gamma", nn.initializers.constant(1e-5), (self.dim,),
                         jnp.float32)
        ls2 = self.param("ls2_gamma", nn.initializers.constant(1e-5), (self.dim,),
                         jnp.float32)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        h = _Attention(self.dim, self.num_heads, dtype=self.dtype, name="attn")(h)
        x = x + h * ls1.astype(h.dtype)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        if self.mlp_type == "swiglu":
            # DINOv2-giant SwiGLUFFN: hidden = 2/3 * 4d, rounded up to 8
            hidden = ((int(self.dim * self.mlp_ratio * 2 / 3) + 7) // 8) * 8
            h12 = nn.Dense(2 * hidden, use_bias=True, dtype=self.dtype,
                           name="mlp_w12")(h)
            h1, h2 = jnp.split(h12, 2, axis=-1)
            h = nn.Dense(self.dim, use_bias=True, dtype=self.dtype,
                         name="mlp_w3")(nn.silu(h1) * h2)
        else:
            h = nn.Dense(self.dim * self.mlp_ratio, use_bias=True,
                         dtype=self.dtype, name="mlp_fc1")(h)
            h = gelu(h)
            h = nn.Dense(self.dim, use_bias=True, dtype=self.dtype,
                         name="mlp_fc2")(h)
        return x + h * ls2.astype(h.dtype)


class DinoViT(nn.Module):
    """Frozen DINOv2 ViT encoder; callers wrap the output in stop_gradient."""

    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    patch_size: int = 14
    native_grid: int = 37  # pos-embed grid of the 518px pretraining resolution
    mlp_ratio: int = 4
    mlp_type: str = "mlp"  # "swiglu" for the ViT-g conditioner
    keep_cls: bool = False  # True: return [CLS | patches] like the reference
                            # conditioner's last_hidden_state with
                            # use_cls_token (conditioner.py:76-106)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images):
        """images: ``(B, H, W, 3)`` in [0, 1]; returns ``(B, (H/14)*(W/14), C)``
        (or ``(B, 1+P, C)`` with ``keep_cls``)."""
        b, h, w, _ = images.shape
        gh, gw = h // self.patch_size, w // self.patch_size

        mean = jnp.asarray(IMAGENET_MEAN, dtype=images.dtype)
        std = jnp.asarray(IMAGENET_STD, dtype=images.dtype)
        x = (images - mean) / std

        x = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size), padding="VALID",
                    dtype=self.dtype, name="patch_embed")(x)
        x = x.reshape(b, gh * gw, self.embed_dim)

        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.embed_dim),
                         jnp.float32)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, 1 + self.native_grid ** 2, self.embed_dim), jnp.float32)
        pos_patch = _interp_pos(pos[:, 1:], self.native_grid, gh, gw)
        x = x + pos_patch.astype(x.dtype)
        cls_tok = (cls + pos[:, :1]).astype(x.dtype)
        x = jnp.concatenate([jnp.broadcast_to(cls_tok, (b, 1, self.embed_dim)), x],
                            axis=1)

        from motion324_tpu.models.transformer import stack_blocks
        x = stack_blocks(_Block, self.depth, name="blocks",
                         dim=self.embed_dim, num_heads=self.num_heads,
                         mlp_ratio=self.mlp_ratio, mlp_type=self.mlp_type,
                         dtype=self.dtype)(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        if self.keep_cls:
            return x
        return x[:, 1:]  # drop CLS: x_norm_patchtokens


def _interp_pos(pos_patch, native_grid: int, gh: int, gw: int):
    """Bicubic antialiased pos-embed resize (DINOv2 interpolate_pos_encoding)."""
    if (gh, gw) == (native_grid, native_grid):
        return pos_patch
    c = pos_patch.shape[-1]
    grid = pos_patch.reshape(1, native_grid, native_grid, c)
    out = jax.image.resize(grid, (1, gh, gw, c), method="cubic", antialias=True)
    return out.reshape(1, gh * gw, c)
