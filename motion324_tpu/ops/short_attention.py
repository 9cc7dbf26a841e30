"""Pallas TPU attention for SHORT sequences (whole KV fits in VMEM).

The long-sequence flash kernel (:mod:`motion324_tpu.ops.flash_attention`)
streams KV blocks with an online softmax — right for S in the thousands, but
at the model's local-attention shapes (B*T=384 x H=12 heads, 324 tokens) its
per-tile grid overhead and lane-replicated LSE cost more than XLA attention,
while XLA attention materialises (BH, S, S) float32 logits in HBM (~6 GB of
traffic per layer at those shapes). This kernel removes both costs:

- several (bb) batch*head slices are processed per grid step; the full
  (bb, S, S) logit tile lives in VMEM only;
- softmax is single-pass (no online rescaling, no m/l scratch carries);
- the backward is ONE kernel computing dq, dk and dv together — the
  exp(s - lse) recompute happens once instead of once per output;
- LSE is stored compactly as (BH, S) float32 (a 2D lane-tiled array), not
  lane-replicated (BH, S, 128).

Used for 128 <= S_kv < 1024 (local frame attention, DINOv2); tiny-KV
cross-attention stays in XLA and long sequences use the flash kernel
(reference model/transformer.py:134-139 routes everything through xformers).
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["short_attention"]

NEG_INF = -1e30
# default batch*head slices per grid step; env-overridable for hardware A/B
_DEFAULT_BB = int(os.environ.get("MOTION324_SHORT_BB", 4))


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _bdot(a, b, contract_a: int, contract_b: int):
    """Batched (leading-dim) matmul with fp32 accumulation."""
    return jax.lax.dot_general(
        a, b,
        dimension_numbers=(((contract_a,), (contract_b,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, kv_len: int):
    q = q_ref[:]  # (bb, Sq, D) — pre-scaled
    k = k_ref[:]
    s = _bdot(q, k, 2, 2)  # (bb, Sq, Sk) f32
    if kv_len != s.shape[2]:  # static: mask padded KV columns
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        s = jnp.where(col < kv_len, s, NEG_INF)
    m = jnp.max(s, axis=2, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=2, keepdims=True)
    o = _bdot(p.astype(v_ref.dtype), v_ref[:], 2, 1)  # (bb, Sq, D)
    o_ref[:] = (o / l).astype(o_ref.dtype)
    # (bb, Sq, 8): 8 replicated lanes — a (bb, Sq) block is not lowerable
    # (sublane dim must be divisible by 8), and 8 lanes cost 16x less HBM
    # than the long-kernel's 128-lane replication
    lse_ref[:] = jnp.broadcast_to(m + jnp.log(l), lse_ref.shape)


def _bwd_kernel(q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref,
                dq_ref, dk_ref, dv_ref, *, kv_len: int):
    q, k, v, do = q_ref[:], k_ref[:], v_ref[:], do_ref[:]
    s = _bdot(q, k, 2, 2)
    if kv_len != s.shape[2]:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        s = jnp.where(col < kv_len, s, NEG_INF)
    p = jnp.exp(s - lse_ref[:][..., :1])  # (bb, Sq, Sk) via (bb, Sq, 1)
    pb = p.astype(do.dtype)
    # dv = p^T @ do : contract over Sq
    dv_ref[:] = _bdot(pb, do, 1, 1).astype(dv_ref.dtype)
    delta = jnp.sum(do.astype(jnp.float32) * o_ref[:].astype(jnp.float32),
                    axis=2, keepdims=True)  # (bb, Sq, 1)
    dp = _bdot(do, v, 2, 2)  # (bb, Sq, Sk)
    ds = (p * (dp - delta)).astype(q.dtype)
    dq_ref[:] = _bdot(ds, k, 2, 1).astype(dq_ref.dtype)
    dk_ref[:] = _bdot(ds, q, 1, 1).astype(dk_ref.dtype)


def _call_fwd(q, k, v, kv_len, bb, interpret):
    bh, sq, d = q.shape
    sk = k.shape[1]
    grid = (bh // bb,)
    qspec = pl.BlockSpec((bb, sq, d), lambda i: (i, 0, 0))
    kspec = pl.BlockSpec((bb, sk, d), lambda i: (i, 0, 0))
    return pl.pallas_call(
        functools.partial(_fwd_kernel, kv_len=kv_len),
        grid=grid,
        in_specs=[qspec, kspec, kspec],
        out_specs=[qspec, pl.BlockSpec((bb, sq, 8), lambda i: (i, 0, 0))],
        out_shape=[jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
                   jax.ShapeDtypeStruct((bh, sq, 8), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _short_core(q, k, v, kv_len, bb, interpret):
    o, _ = _call_fwd(q, k, v, kv_len, bb, interpret)
    return o


def _short_core_fwd(q, k, v, kv_len, bb, interpret):
    o, lse = _call_fwd(q, k, v, kv_len, bb, interpret)
    return o, (q, k, v, o, lse)


def _short_core_bwd(kv_len, bb, interpret, res, do):
    q, k, v, o, lse = res
    bh, sq, d = q.shape
    sk = k.shape[1]
    bbb = max(bb // 2, 1)  # backward holds ~4 (bb,Sq,Sk) f32 tiles in VMEM
    while bh % bbb:
        bbb //= 2
    grid = (bh // bbb,)
    qspec = pl.BlockSpec((bbb, sq, d), lambda i: (i, 0, 0))
    kspec = pl.BlockSpec((bbb, sk, d), lambda i: (i, 0, 0))
    lspec = pl.BlockSpec((bbb, sq, 8), lambda i: (i, 0, 0))
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, kv_len=kv_len),
        grid=grid,
        in_specs=[qspec, kspec, kspec, qspec, qspec, lspec],
        out_specs=[qspec, kspec, kspec],
        out_shape=[jax.ShapeDtypeStruct(q.shape, q.dtype),
                   jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(q, k, v, o, do, lse)
    return dq, dk, dv


_short_core.defvjp(_short_core_fwd, _short_core_bwd)


def short_attention(q, k, v, *, scale: float | None = None,
                    block_bh: int | None = None, interpret: bool = False):
    """Exact multi-head attention for short KV (S_kv padded <= ~512).

    Args:
      q: ``(B, H, Sq, D)``; k, v: ``(B, H, Sk, D)``.
      scale: logit scale, default ``1/sqrt(D)``.
      block_bh: batch*head slices per grid step (VMEM: ~bb * Sq * Sk * 8 B).
      interpret: interpreter mode for CPU tests.

    Returns ``(B, H, Sq, D)`` in q's dtype.
    """
    b, h, sq, d = q.shape
    sk = k.shape[2]
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    # queries pad to the sublane granule only (16 covers bf16 and f32):
    # sq is the sublane dim of every tile, so 257 -> 272 instead of 384
    # (~30% less logit compute at the DINOv2 shapes). KV pads to the 128-lane
    # granule (lane dim of the logit tiles).
    sq_p = _ceil_to(sq, 16)
    sk_p = _ceil_to(sk, 128)

    qf = (q * jnp.asarray(scale, q.dtype)).reshape(b * h, sq, d)
    kf = k.reshape(b * h, sk, d)
    vf = v.reshape(b * h, sk, d)
    if sq_p != sq:
        qf = jnp.pad(qf, ((0, 0), (0, sq_p - sq), (0, 0)))
    if sk_p != sk:
        kf = jnp.pad(kf, ((0, 0), (0, sk_p - sk), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, sk_p - sk), (0, 0)))

    # VMEM guard: the kernel holds ~two (bb, Sq, Sk) f32 tiles; cap bb so they
    # stay within ~10 MB (callers route larger shapes to the flash kernel;
    # the backward kernel independently halves bb for its ~4 tiles)
    bb = block_bh if block_bh is not None else _DEFAULT_BB
    while bb > 1 and bb * sq_p * sk_p * 8 > 10 * 1024 * 1024:
        bb //= 2
    while (b * h) % bb:
        bb //= 2
    o = _short_core(qf, kf, vf, sk, bb, interpret)
    return o[:, :sq].reshape(b, h, sq, d)
