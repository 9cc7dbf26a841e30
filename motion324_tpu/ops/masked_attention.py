"""Voxel-locality masked flash attention (turbo multiview mode).

The reference's turbo paint mode restricts multiview attention to spatially
near tokens via a precomputed (S, S) boolean mask (reference:
scripts/hy3dgen/texgen/hunyuanpaint/unet/modules.py:302-402). A dense mask is
fine at test sizes but at product resolution (6 views x 64^2 latent tokens =
24576 joint tokens) it is a 600 MB tensor and XLA masked attention would
materialise 24 GB of logits. This kernel keeps the mask IMPLICIT: each token
carries its voxel-cell mean position, and every (bq, bkv) tile recomputes

    mask[i, j] = ||pos_q[i] - pos_k[j]|| < radius

on the VPU (one (bq, 8) x (8, bkv) matmul + norms per tile) inside a standard
online-softmax flash sweep — identical semantics to
:func:`motion324_tpu.hy3dgen.voxel_attention.voxel_grid_mask`'s dense mask
(including fully-masked rows degrading to uniform attention, the
``where(mask, s, -1e9)`` convention), with O(S) memory.

Forward-only: turbo texture generation is inference.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["masked_flash_attention"]

NEG_INF = -1e30
_POS_LANES = 8  # (S, 8) position layout: 3 used lanes, zero-padded


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fwd_kernel(q_ref, k_ref, v_ref, pq_ref, pk_ref, o_ref,
                m_scr, l_scr, acc_scr, *, kv_len: int, block_kv: int,
                radius2: float):
    ikv = pl.program_id(2)
    nkv = pl.num_programs(2)

    @pl.when(ikv == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # (bq, D), pre-scaled
    k = k_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)

    # voxel-locality mask from cell positions: ||a - b||^2 < radius^2.
    # padding lanes are zero on both sides, so they cancel in the expansion.
    # HIGHEST precision: the TPU MXU truncates f32 operands to bf16 by
    # default, which flips mask bits for pairs near the radius boundary.
    pq = pq_ref[0].astype(jnp.float32)  # (bq, 8)
    pk = pk_ref[0].astype(jnp.float32)  # (bkv, 8)
    cross = jax.lax.dot_general(pq, pk, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
    d2 = (jnp.sum(pq * pq, axis=1)[:, None]
          + jnp.sum(pk * pk, axis=1)[None, :] - 2.0 * cross)
    s = jnp.where(d2 < radius2, s, NEG_INF)

    if kv_len % block_kv != 0:  # mask padded KV columns
        col = ikv * block_kv + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, NEG_INF)

    m_prev = m_scr[:, 0]
    l_prev = l_scr[:, 0]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new[:, None])
    l_new = alpha * l_prev + jnp.sum(p, axis=1)
    pv = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[0],
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    acc_scr[:] = acc_scr[:] * alpha[:, None] + pv
    m_scr[:] = jnp.broadcast_to(m_new[:, None], m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new[:, None], l_scr.shape)

    @pl.when(ikv == nkv - 1)
    def _finalise():
        l = l_scr[:, 0]
        o_ref[0] = (acc_scr[:] / jnp.maximum(l, 1e-30)[:, None]) \
            .astype(o_ref.dtype)


def masked_flash_attention(q, k, v, positions, *, radius: float,
                           scale: float | None = None, block_q: int = 512,
                           block_kv: int = 512, interpret: bool = False):
    """Attention restricted to token pairs within ``radius`` in 3D.

    Args:
      q, k, v: ``(B, H, S, D)`` (self-attention: shared S).
      positions: ``(B, S, 3)`` per-token voxel-cell mean positions (zeros for
        empty cells — matching ``voxel_grid_mask``'s convention where empty
        cells cluster at the origin and attend to each other).
      radius: locality threshold (``1.73 / grid_resolution``).
      scale: logit scale, default ``1/sqrt(D)``.

    Returns ``(B, H, S, D)``.
    """
    b, h, sq, d = q.shape
    sk = k.shape[2]
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    bq = min(block_q, _ceil_to(sq, 128))
    bkv = min(block_kv, _ceil_to(sk, 128))
    sq_p = _ceil_to(sq, bq)
    sk_p = _ceil_to(sk, bkv)

    qf = (q * jnp.asarray(scale, q.dtype)).reshape(b * h, sq, d)
    kf = k.reshape(b * h, sk, d)
    vf = v.reshape(b * h, sk, d)
    pos = jnp.zeros((b, sq, _POS_LANES), jnp.float32).at[:, :, :3].set(
        positions.astype(jnp.float32))
    if sq_p != sq:
        qf = jnp.pad(qf, ((0, 0), (0, sq_p - sq), (0, 0)))
        # padded tokens sit far outside every voxel: masked from all real ones
        pos = jnp.pad(pos, ((0, 0), (0, sq_p - sq), (0, 0)),
                      constant_values=1e6)
    if sk_p != sk:
        kf = jnp.pad(kf, ((0, 0), (0, sk_p - sk), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, sk_p - sk), (0, 0)))

    grid = (b * h, sq_p // bq, sk_p // bkv)
    q_spec = pl.BlockSpec((1, bq, d), lambda i, iq, ikv: (i, iq, 0))
    kv_spec = pl.BlockSpec((1, bkv, d), lambda i, iq, ikv: (i, ikv, 0))
    pq_spec = pl.BlockSpec((1, bq, _POS_LANES),
                           lambda i, iq, ikv: (i // h, iq, 0))
    pk_spec = pl.BlockSpec((1, bkv, _POS_LANES),
                           lambda i, iq, ikv: (i // h, ikv, 0))
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, kv_len=sk, block_kv=bkv,
                          radius2=float(radius) ** 2),
        grid=grid,
        in_specs=[q_spec, kv_spec, kv_spec, pq_spec, pk_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((b * h, sq_p, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qf, kf, vf, pos, pos)
    return out[:, :sq].reshape(b, h, sq, d)
