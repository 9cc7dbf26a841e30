"""Attention dispatch: Pallas flash kernels on TPU, fused XLA math elsewhere.

Public entry point for all attention in the framework (self, cross, encoder,
decoder). The reference routes everything through xformers flash-attn v2
(reference: model/transformer.py:134-139); here the hot long-sequence paths hit
the Pallas kernel while small-KV cross-attention (e.g. decoding 4096 query
points against 64 mesh tokens) stays in plain XLA where a flash schedule would
only add overhead.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from motion324_tpu.ops.flash_attention import flash_attention
from motion324_tpu.ops.folded_attention import folded_attention
from motion324_tpu.ops.short_attention import short_attention

__all__ = ["multi_head_attention", "mha_reference"]

# KV length routing on TPU:
#   >= _FLASH_MIN_KV          -> streaming flash kernel (online softmax)
#   [_SHORT_MIN_KV, flash)    -> short-sequence kernel (KV resident in VMEM,
#                                fused one-pass backward) WHEN the whole
#                                (Sq, Sk) logit tile fits VMEM; otherwise the
#                                flash kernel streams Q blocks (e.g. the
#                                volume decoder's 8192 queries x 512 latents).
#                                XLA attention here would materialise
#                                (BH, S, S) f32 logits in HBM
#   < _SHORT_MIN_KV           -> plain XLA (tiny-KV cross attention: a kernel
#                                schedule only adds overhead)
_FLASH_MIN_KV = 1024
_SHORT_MIN_KV = 128
_SHORT_MIN_Q = 128
_SHORT_MAX_AREA = 512 * 512  # max padded Sq*Sk logit elements per bh slice


def mha_reference(q, k, v, *, scale: float | None = None):
    """Exact attention in plain XLA; softmax statistics in float32.

    Args/returns use ``(B, H, S, D)`` layout, matching :func:`flash_attention`.
    """
    d = q.shape[-1]
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    weights = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", weights.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def multi_head_attention(q, k, v, *, scale: float | None = None,
                         backend: str | None = None):
    """Multi-head attention over ``(B, S, H, D)`` tensors (sequence-major layout
    used by the model code, mirroring the xformers convention).

    Args:
      q: ``(B, Sq, H, D)``.
      k, v: ``(B, Sk, H, D)``.
      scale: logit scale, default ``1/sqrt(D)``.
      backend: ``None`` (auto), ``"flash"`` (force Pallas), ``"xla"`` or
        ``"interpret"`` (Pallas interpreter mode, for tests).

    Returns:
      ``(B, Sq, H, D)``.
    """
    if backend is None:
        on_tpu = jax.default_backend() == "tpu"
        sq_p = -(-q.shape[1] // 16) * 16   # short kernels pad sq to 16s
        sk_p = -(-k.shape[1] // 128) * 128
        if not on_tpu:
            backend = "xla"
        elif k.shape[1] >= _FLASH_MIN_KV:
            backend = "flash"
        elif k.shape[1] >= _SHORT_MIN_KV and q.shape[1] >= _SHORT_MIN_Q:
            backend = "short" if sq_p * sk_p <= _SHORT_MAX_AREA else "flash"
        else:
            # tiny KV (e.g. decoder cross-attention, 4096 points vs 64 mesh
            # tokens) stays in XLA: routing it through the folded kernel was
            # A/B'd on v5e and LOST (3479 vs 3411 ms/step) — the kernel's
            # k/v padding to 128 and q-block streaming cost more than the
            # XLA path's transposes
            backend = "xla"

    if backend in ("short", "short_interpret"):
        # head-folded kernel: heads stay in LANE slices of the model-native
        # (B, S, H*D) layout — dense DMAs, no transposes on either side,
        # 2.8x the (B*H, S, D)-sliced short kernel on hardware
        b, sq, h, d = q.shape
        sk = k.shape[1]
        out = folded_attention(
            q.reshape(b, sq, h * d), k.reshape(b, sk, h * d),
            v.reshape(b, sk, h * d), heads=h, scale=scale,
            interpret=backend == "short_interpret")
        return out.reshape(b, sq, h, d)

    if backend == "xla":
        # compute straight in the sequence-major (b, s, h, d) contract: the
        # (bhqd)-transposed variant flows a {1,2,0}-layout operand into the
        # consumer matmuls (the decoder MLP ran at ~74 TF/s from it)
        d = q.shape[-1]
        s = (1.0 / math.sqrt(d)) if scale is None else scale
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * s
        weights = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum("bhqk,bkhd->bqhd", weights.astype(v.dtype), v,
                          preferred_element_type=jnp.float32).astype(q.dtype)

    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    if backend == "flash":
        out = flash_attention(qt, kt, vt, scale=scale)
    elif backend == "short_legacy":
        out = short_attention(qt, kt, vt, scale=scale)
    elif backend == "interpret":
        out = flash_attention(qt, kt, vt, scale=scale, interpret=True)
    elif backend == "short_legacy_interpret":
        out = short_attention(qt, kt, vt, scale=scale, interpret=True)
    else:
        raise ValueError(f"unknown attention backend {backend!r}")
    return out.transpose(0, 2, 1, 3)
