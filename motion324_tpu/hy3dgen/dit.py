"""Latent-set flow-matching DiT denoiser (Flux-style) in flax.

TPU-native re-implementation of the reference's shape denoiser
(reference: scripts/hy3dgen/shapegen/models/denoisers/hunyuan3ddit.py:284-410):
16 double-stream blocks (separate latent/cond streams with joint attention) +
32 single-stream blocks (fused qkv+MLP), adaLN modulation from the timestep
embedding, QK-RMSNorm (eps 1e-6), tanh-GELU MLPs, final adaLN LastLayer.
Defaults match the Hunyuan3D-2 config (in 64, cond 1536, hidden 1024,
16 heads). Attention routes through the shared dispatcher (Pallas flash on
long sequences).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from motion324_tpu.ops.attention import multi_head_attention

__all__ = ["Hunyuan3DDiT", "timestep_embedding"]

Dtype = Any


def timestep_embedding(t, dim: int, max_period: float = 10000.0,
                       time_factor: float = 1000.0):
    """Sinusoidal timestep embedding, cos-first (reference hunyuan3ddit.py:39-61)."""
    t = time_factor * jnp.asarray(t, jnp.float32)
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = t[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class _RMSNorm(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],),
                           jnp.float32)
        xf = x.astype(jnp.float32)
        out = xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + self.eps)
        return out.astype(x.dtype) * scale.astype(x.dtype)


class _MLPEmbedder(nn.Module):
    hidden: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="in_layer")(x)
        x = nn.silu(x)
        return nn.Dense(self.hidden, dtype=self.dtype, name="out_layer")(x)


class _Modulation(nn.Module):
    dim: int
    double: bool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, vec):
        mult = 6 if self.double else 3
        out = nn.Dense(mult * self.dim, dtype=self.dtype, name="lin")(
            nn.silu(vec))[:, None, :]
        parts = jnp.split(out, mult, axis=-1)
        first = (parts[0], parts[1], parts[2])  # shift, scale, gate
        second = (parts[3], parts[4], parts[5]) if self.double else None
        return first, second


def _norm(x):
    return nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                        dtype=x.dtype)(x)


class _StreamAttention(nn.Module):
    """qkv + per-head QK-RMSNorm; returns (q, k, v) in (B, L, H, D)."""

    dim: int
    num_heads: int
    qkv_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, l, _ = x.shape
        hd = self.dim // self.num_heads
        qkv = nn.Dense(3 * self.dim, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = _RMSNorm(name="q_norm")(q.reshape(b, l, self.num_heads, hd))
        k = _RMSNorm(name="k_norm")(k.reshape(b, l, self.num_heads, hd))
        return q, k, v.reshape(b, l, self.num_heads, hd)


class DoubleStreamBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    dtype: Dtype = jnp.float32
    attn_backend: str | None = None

    @nn.compact
    def __call__(self, img, txt, vec):
        mlp_dim = int(self.dim * self.mlp_ratio)
        (im1_shift, im1_scale, im1_gate), (im2_shift, im2_scale, im2_gate) = \
            _Modulation(self.dim, True, self.dtype, name="img_mod")(vec)
        (tx1_shift, tx1_scale, tx1_gate), (tx2_shift, tx2_scale, tx2_gate) = \
            _Modulation(self.dim, True, self.dtype, name="txt_mod")(vec)

        img_in = (1 + im1_scale) * _norm(img) + im1_shift
        txt_in = (1 + tx1_scale) * _norm(txt) + tx1_shift
        iq, ik, iv = _StreamAttention(self.dim, self.num_heads, self.qkv_bias,
                                      self.dtype, name="img_attn")(img_in)
        tq, tk, tv = _StreamAttention(self.dim, self.num_heads, self.qkv_bias,
                                      self.dtype, name="txt_attn")(txt_in)

        q = jnp.concatenate([tq, iq], axis=1)
        k = jnp.concatenate([tk, ik], axis=1)
        v = jnp.concatenate([tv, iv], axis=1)
        attn = multi_head_attention(q, k, v, backend=self.attn_backend)
        attn = attn.reshape(*attn.shape[:2], self.dim)
        lt = txt.shape[1]
        txt_attn, img_attn = attn[:, :lt], attn[:, lt:]

        img = img + im1_gate * nn.Dense(self.dim, dtype=self.dtype,
                                        name="img_proj")(img_attn)
        h = (1 + im2_scale) * _norm(img) + im2_shift
        h = nn.Dense(mlp_dim, dtype=self.dtype, name="img_mlp_fc1")(h)
        h = nn.gelu(h, approximate=True)
        h = nn.Dense(self.dim, dtype=self.dtype, name="img_mlp_fc2")(h)
        img = img + im2_gate * h

        txt = txt + tx1_gate * nn.Dense(self.dim, dtype=self.dtype,
                                        name="txt_proj")(txt_attn)
        h = (1 + tx2_scale) * _norm(txt) + tx2_shift
        h = nn.Dense(mlp_dim, dtype=self.dtype, name="txt_mlp_fc1")(h)
        h = nn.gelu(h, approximate=True)
        h = nn.Dense(self.dim, dtype=self.dtype, name="txt_mlp_fc2")(h)
        txt = txt + tx2_gate * h
        return img, txt


class SingleStreamBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32
    attn_backend: str | None = None

    @nn.compact
    def __call__(self, x, vec):
        b, l, _ = x.shape
        hd = self.dim // self.num_heads
        mlp_dim = int(self.dim * self.mlp_ratio)
        (shift, scale, gate), _ = _Modulation(self.dim, False, self.dtype,
                                              name="modulation")(vec)
        x_mod = (1 + scale) * _norm(x) + shift
        fused = nn.Dense(3 * self.dim + mlp_dim, dtype=self.dtype,
                         name="linear1")(x_mod)
        qkv, mlp = jnp.split(fused, [3 * self.dim], axis=-1)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = _RMSNorm(name="q_norm")(q.reshape(b, l, self.num_heads, hd))
        k = _RMSNorm(name="k_norm")(k.reshape(b, l, self.num_heads, hd))
        v = v.reshape(b, l, self.num_heads, hd)
        attn = multi_head_attention(q, k, v, backend=self.attn_backend)
        attn = attn.reshape(b, l, self.dim)
        out = nn.Dense(self.dim, dtype=self.dtype, name="linear2")(
            jnp.concatenate([attn, nn.gelu(mlp, approximate=True)], axis=-1))
        return x + gate * out


class Hunyuan3DDiT(nn.Module):
    """x (B, L, 64), t (B,), cond (B, Lc, 1536) -> velocity (B, L, 64)."""

    in_channels: int = 64
    context_in_dim: int = 1536
    hidden_size: int = 1024
    mlp_ratio: float = 4.0
    num_heads: int = 16
    depth: int = 16
    depth_single_blocks: int = 32
    time_factor: float = 1000.0
    qkv_bias: bool = True
    dtype: Dtype = jnp.float32
    attn_backend: str | None = None

    @nn.compact
    def __call__(self, x, t, cond):
        latent = nn.Dense(self.hidden_size, dtype=self.dtype,
                          name="latent_in")(x.astype(self.dtype))
        # QUIRK KEPT FOR PARITY: the reference passes ``self.time_factor``
        # POSITIONALLY into timestep_embedding's ``max_period`` slot
        # (hunyuan3ddit.py:393: ``timestep_embedding(t, 256, self.time_factor)``),
        # so the shipped model runs with max_period = 1000, time_factor = 1000.
        vec = _MLPEmbedder(self.hidden_size, self.dtype, name="time_in")(
            timestep_embedding(t, 256, max_period=self.time_factor,
                               time_factor=1000.0).astype(self.dtype))
        cond = nn.Dense(self.hidden_size, dtype=self.dtype,
                        name="cond_in")(cond.astype(self.dtype))

        # scan over identical blocks: one compiled block program per stack
        double_kw = dict(dim=self.hidden_size, num_heads=self.num_heads,
                         mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                         dtype=self.dtype, attn_backend=self.attn_backend)

        class _DoubleBody(nn.Module):
            @nn.compact
            def __call__(self, carry, _):
                img, txt, v = carry
                img, txt = DoubleStreamBlock(**double_kw, name="block")(
                    img, txt, v)
                return (img, txt, v), None

        (latent, cond, _), _ = nn.scan(
            _DoubleBody, variable_axes={"params": 0},
            split_rngs={"params": True}, length=self.depth,
        )(name="double_blocks")((latent, cond, vec), None)

        single_kw = dict(dim=self.hidden_size, num_heads=self.num_heads,
                         mlp_ratio=self.mlp_ratio, dtype=self.dtype,
                         attn_backend=self.attn_backend)

        class _SingleBody(nn.Module):
            @nn.compact
            def __call__(self, carry, _):
                x, v = carry
                x = SingleStreamBlock(**single_kw, name="block")(x, v)
                return (x, v), None

        merged = jnp.concatenate([cond, latent], axis=1)
        (merged, _), _ = nn.scan(
            _SingleBody, variable_axes={"params": 0},
            split_rngs={"params": True}, length=self.depth_single_blocks,
        )(name="single_blocks")((merged, vec), None)
        latent = merged[:, cond.shape[1]:]

        # LastLayer (adaLN final projection)
        mod = nn.Dense(2 * self.hidden_size, dtype=self.dtype,
                       name="final_mod")(nn.silu(vec))
        shift, scale = jnp.split(mod[:, None, :], 2, axis=-1)
        latent = (1 + scale) * _norm(latent) + shift
        out = nn.Dense(self.in_channels, dtype=self.dtype,
                       name="final_linear")(latent)
        return out.astype(jnp.float32)
