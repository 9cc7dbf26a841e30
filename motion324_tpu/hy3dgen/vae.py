"""ShapeVAE: latent-set decoder producing occupancy fields, in flax.

TPU-native re-implementation of the reference ShapeVAE decoder path
(reference: scripts/hy3dgen/shapegen/models/autoencoders/model.py:132-189,
attention_blocks.py:36-493): ``post_kl`` linear lift, a stack of pre-norm
residual self-attention blocks over the latent set (LayerNorm eps 1e-6,
qkv bias), and a cross-attention ``geo_decoder`` mapping Fourier-embedded
query points against the latents to occupancy logits.

The chunked volume decode (reference volume_decoders.py:141-182) lives in
:mod:`motion324_tpu.hy3dgen.volume`.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from motion324_tpu.models.transformer import gelu
from motion324_tpu.ops.attention import multi_head_attention
from motion324_tpu.ops.embeddings import frequency_embed

__all__ = ["ShapeVAE"]

Dtype = Any


def _ln(name):
    return nn.LayerNorm(epsilon=1e-6, name=name)


class _SelfAttnBlock(nn.Module):
    width: int
    heads: int
    qkv_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, l, _ = x.shape
        hd = self.width // self.heads
        h = _ln("ln_1")(x)
        qkv = nn.Dense(3 * self.width, use_bias=self.qkv_bias,
                       dtype=self.dtype, name="c_qkv")(h)
        # reference QKVMultiheadAttention splits the fused dim per head:
        # (B, L, H, 3*hd) -> q, k, v  (attention_blocks.py:317-328)
        qkv = qkv.reshape(b, l, self.heads, 3 * hd)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        out = multi_head_attention(q, k, v).reshape(b, l, self.width)
        x = x + nn.Dense(self.width, dtype=self.dtype, name="c_proj")(out)
        h = _ln("ln_2")(x)
        h = nn.Dense(4 * self.width, dtype=self.dtype, name="c_fc")(h)
        h = gelu(h)
        h = nn.Dense(self.width, dtype=self.dtype, name="c_proj_mlp")(h)
        return x + h


class _CrossAttnBlock(nn.Module):
    width: int
    heads: int
    mlp_expand: int = 4
    qkv_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q_tokens, data):
        b, lq, _ = q_tokens.shape
        ld = data.shape[1]
        hd = self.width // self.heads
        hq = _ln("ln_1")(q_tokens)
        hk = _ln("ln_2")(data)
        q = nn.Dense(self.width, use_bias=self.qkv_bias, dtype=self.dtype,
                     name="c_q")(hq)
        kv = nn.Dense(2 * self.width, use_bias=self.qkv_bias, dtype=self.dtype,
                      name="c_kv")(hk)
        kv = kv.reshape(b, ld, self.heads, 2 * hd)
        k, v = jnp.split(kv, 2, axis=-1)
        q = q.reshape(b, lq, self.heads, hd)
        out = multi_head_attention(q, k, v).reshape(b, lq, self.width)
        x = q_tokens + nn.Dense(self.width, dtype=self.dtype, name="c_proj")(out)
        h = _ln("ln_3")(x)
        h = nn.Dense(self.mlp_expand * self.width, dtype=self.dtype,
                     name="c_fc")(h)
        h = gelu(h)
        h = nn.Dense(self.width, dtype=self.dtype, name="c_proj_mlp")(h)
        return x + h


class ShapeVAE(nn.Module):
    """Decoder-only usage: ``decode`` lifts latents, ``query`` scores points."""

    num_latents: int = 512
    embed_dim: int = 64
    width: int = 1024
    heads: int = 16
    num_decoder_layers: int = 16
    num_freqs: int = 8
    include_pi: bool = True
    scale_factor: float = 1.0
    dtype: Dtype = jnp.float32

    def setup(self):
        from motion324_tpu.models.transformer import stack_blocks
        self.post_kl = nn.Dense(self.width, dtype=self.dtype, name="post_kl")
        self.blocks = stack_blocks(_SelfAttnBlock, self.num_decoder_layers,
                                   name="blocks", width=self.width,
                                   heads=self.heads, dtype=self.dtype)
        self.query_proj = nn.Dense(self.width, dtype=self.dtype,
                                   name="query_proj")
        self.geo_decoder = _CrossAttnBlock(self.width, self.heads,
                                           dtype=self.dtype, name="geo_decoder")
        self.ln_post = _ln("ln_post")
        self.output_proj = nn.Dense(1, dtype=self.dtype, name="output_proj")

    def decode(self, latents):
        """(B, num_latents, embed_dim) -> (B, num_latents, width) processed set."""
        x = self.post_kl(latents.astype(self.dtype) / self.scale_factor)
        return self.blocks(x)

    def query(self, points, processed_latents):
        """(B, N, 3) points -> (B, N) occupancy logits."""
        # frequencies reach 2^{N-1}*pi (~402 at num_freqs=8): the multiply and
        # sin/cos must run in f32 — bf16 coordinates lose O(1 rad) of phase
        emb = frequency_embed(points.astype(jnp.float32),
                              num_freqs=self.num_freqs,
                              include_pi=self.include_pi).astype(self.dtype)
        q = self.query_proj(emb)
        x = self.geo_decoder(q, processed_latents)
        x = self.ln_post(x)
        return self.output_proj(x)[..., 0].astype(jnp.float32)

    def query_topk(self, points, processed_latents, topk: int = 256,
                   probe_stride: int = 100):
        """FlashVDM-style sparsified query (reference
        scripts/hy3dgen/shapegen/models/autoencoders/attention_processors.py:39-71):
        probe every ``probe_stride``-th query, rank latents by mean similarity
        to the probes, and cross-attend only against the top-k latents. Spatial
        coherence of volume-decode chunks makes the probe ranking accurate;
        with ``topk >= num_latents`` this equals :meth:`query` exactly.
        """
        emb = frequency_embed(points.astype(jnp.float32),
                              num_freqs=self.num_freqs,
                              include_pi=self.include_pi).astype(self.dtype)
        q = self.query_proj(emb)  # (B, N, W)
        k = min(topk, processed_latents.shape[1])
        probes = q[:, ::probe_stride]  # (B, P, W)
        scores = jnp.einsum("bpw,blw->bl", probes, processed_latents)
        _, idx = jax.lax.top_k(scores, k)  # (B, k)
        subset = jnp.take_along_axis(processed_latents, idx[..., None], axis=1)
        x = self.geo_decoder(q, subset)
        x = self.ln_post(x)
        return self.output_proj(x)[..., 0].astype(jnp.float32)

    def __call__(self, latents, points):
        return self.query(points, self.decode(latents))
