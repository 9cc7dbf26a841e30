"""Pallas TPU flash attention (forward + backward) with online softmax.

TPU-native replacement for the reference's xformers ``memory_efficient_attention``
flash-attn v2 calls (reference: model/transformer.py:134-139, 209-214). Exact
attention, O(seq) memory, tiled onto the MXU with fp32 accumulation.

Layout: kernels operate on ``(BH, S, D)`` arrays (batch and heads folded), with
sequence lengths padded to block multiples by the :func:`flash_attention` wrapper.
Padded KV columns are masked with a large negative logit; Q/K/V/dO are zero-padded,
which keeps every intermediate finite and makes padded-row contributions to
dK/dV exactly zero (dO rows are zero => dS rows are zero).

The logsumexp saved for backward is lane-replicated ``(BH, S, 8)`` (a (1, bq)
block is not lowerable; 8 lanes is the minimum sublane tile and costs 16x less
HBM than 128-lane replication), and is only emitted when the call is being
differentiated. Block sizes prefer PAD-FREE exact divisors of the sequence
length (see ``_pick_block``): the dyscene global sequence 3888 = 3 x 1296 runs
with zero row padding. The backward pass is the fused single-sweep kernel
(dq/dk/dv in one pass) for KV <= 4096 and the two-kernel flash backward
beyond; ``delta = rowsum(dO * O)`` is precomputed in one XLA pass and fed to
the kernels like lse, so O never streams into the backward kernels.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention"]

NEG_INF = -1e30
# lse OUTPUT lane replication: 8 lanes (the minimum lowerable sublane tile,
# proven by the short kernel) — 16x less HBM write/read than 128-lane
# replication (805 -> 50 MB/layer at the dyscene global-attention shapes).
# In-kernel m/l SCRATCH stays at 128 lanes (native VPU register tile).
_LANES = 8
_SCR_LANES = 128


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# --------------------------------------------------------------------------- #
# Forward
# --------------------------------------------------------------------------- #
def _mask_tail(s, ikv, kv_len: int, block_kv: int, nkv: int):
    """Mask padded KV columns with NEG_INF.

    Emitted only when padding exists (static check). The mask is applied
    unconditionally per block — branching on the block index with ``lax.cond``
    measured ~1.5x SLOWER than the straight-line iota/compare/select (Mosaic
    pipelines predicated straight-line code far better than control flow)."""
    if kv_len % block_kv == 0:
        return s  # no padded columns anywhere: no masking code at all
    col = ikv * block_kv + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    return jnp.where(col < kv_len, s, NEG_INF)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *rest,
                kv_len: int, block_kv: int, with_lse: bool):
    if with_lse:
        lse_ref, m_scr, l_scr, acc_scr = rest
    else:
        m_scr, l_scr, acc_scr = rest
    ikv = pl.program_id(2)
    nkv = pl.num_programs(2)

    @pl.when(ikv == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # (bq, D), pre-scaled by the wrapper (scale folded into q)
    k = k_ref[0]  # (bkv, D)
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bq, bkv)
    s = _mask_tail(s, ikv, kv_len, block_kv, nkv)

    m_prev = m_scr[:, 0]
    l_prev = l_scr[:, 0]
    m_cur = jnp.max(s, axis=1)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new[:, None])
    l_new = alpha * l_prev + jnp.sum(p, axis=1)

    pv = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_scr[:] = acc_scr[:] * alpha[:, None] + pv
    m_scr[:] = jnp.broadcast_to(m_new[:, None], m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new[:, None], l_scr.shape)

    @pl.when(ikv == nkv - 1)
    def _finalise():
        l = l_scr[:, 0]
        # Padded Q rows attend uniformly over real KV (q rows are zero), so l>0.
        o_ref[0] = (acc_scr[:] / l[:, None]).astype(o_ref.dtype)
        if with_lse:
            lse = m_scr[:, 0] + jnp.log(l)
            lse_ref[0] = jnp.broadcast_to(lse[:, None], lse_ref.shape[1:])


def _fwd_single_kv_kernel(q_ref, k_ref, v_ref, o_ref, *rest,
                          kv_len: int, block_kv: int, with_lse: bool):
    """Whole-KV-in-one-block forward: plain softmax, no online-update scratch.

    When the KV set fits one block (decoder cross-attention: thousands of
    query points against a few hundred latents), the streaming machinery —
    m/l scratch reads, acc rescaling, final division pass — is pure overhead;
    this straight-line kernel measured 15 -> ~100 TF/s on the ShapeVAE
    volume-decode shapes (scripts/profile_volume.py).
    """
    q = q_ref[0]
    s = jax.lax.dot_general(q, k_ref[0], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = _mask_tail(s, 0, kv_len, block_kv, 1)
    m = jnp.max(s, axis=1)
    p = jnp.exp(s - m[:, None])
    l = jnp.sum(p, axis=1)
    pv = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[0],
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    o_ref[0] = (pv / l[:, None]).astype(o_ref.dtype)
    if with_lse:
        lse = m + jnp.log(l)
        rest[0][0] = jnp.broadcast_to(lse[:, None], rest[0].shape[1:])


def _fwd_single_kv(q, k, v, kv_len: int, block_q: int, interpret: bool,
                   with_lse: bool):
    bh, sq, d = q.shape
    skv = k.shape[1]
    grid = (bh, sq // block_q)
    kernel = functools.partial(_fwd_single_kv_kernel, kv_len=kv_len,
                               block_kv=skv, with_lse=with_lse)
    out_specs = [pl.BlockSpec((1, block_q, d), lambda b, iq: (b, iq, 0))]
    out_shape = [jax.ShapeDtypeStruct((bh, sq, d), q.dtype)]
    if with_lse:
        out_specs.append(pl.BlockSpec((1, block_q, _LANES),
                                      lambda b, iq: (b, iq, 0)))
        out_shape.append(jax.ShapeDtypeStruct((bh, sq, _LANES), jnp.float32))
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, iq: (b, iq, 0)),
            pl.BlockSpec((1, skv, d), lambda b, iq: (b, 0, 0)),
            pl.BlockSpec((1, skv, d), lambda b, iq: (b, 0, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(q, k, v)
    return (outs[0], outs[1]) if with_lse else (outs[0], None)


def _fwd(q, k, v, kv_len: int, block_q: int, block_kv: int,
         interpret: bool, with_lse: bool):
    bh, sq, d = q.shape
    skv = k.shape[1]
    if skv <= min(block_kv, _SINGLE_KV_MAX) and _SINGLE_KV:
        # whole KV in one block: skip the streaming machinery. Capped at
        # _SINGLE_KV_MAX independently of block_kv — the pad-free picker may
        # return KV blocks up to 2x target, whose (bq, skv) f32 logit tile
        # would bust this kernel's VMEM budget.
        return _fwd_single_kv(q, k, v, kv_len, block_q, interpret, with_lse)
    grid = (bh, sq // block_q, skv // block_kv)
    kernel = functools.partial(_fwd_kernel, kv_len=kv_len,
                               block_kv=block_kv, with_lse=with_lse)
    out_specs = [pl.BlockSpec((1, block_q, d), lambda b, iq, ikv: (b, iq, 0))]
    out_shape = [jax.ShapeDtypeStruct((bh, sq, d), q.dtype)]
    if with_lse:
        out_specs.append(pl.BlockSpec((1, block_q, _LANES),
                                      lambda b, iq, ikv: (b, iq, 0)))
        out_shape.append(jax.ShapeDtypeStruct((bh, sq, _LANES), jnp.float32))
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, iq, ikv: (b, iq, 0)),
            pl.BlockSpec((1, block_kv, d), lambda b, iq, ikv: (b, ikv, 0)),
            pl.BlockSpec((1, block_kv, d), lambda b, iq, ikv: (b, ikv, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((block_q, _SCR_LANES), jnp.float32),
            pltpu.VMEM((block_q, _SCR_LANES), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=(_VMEM_LIMIT_MB * 1024 * 1024
                              if _VMEM_LIMIT_MB else None),
        ),
        interpret=interpret,
    )(q, k, v)
    return (outs[0], outs[1]) if with_lse else (outs[0], None)


# --------------------------------------------------------------------------- #
# Backward
# --------------------------------------------------------------------------- #
def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
                   dq_scr, *, kv_len: int, block_kv: int):
    # q is pre-scaled; returned dq is the gradient w.r.t. the SCALED q (the
    # wrapper's q*scale multiply back-propagates the scale factor exactly).
    # delta = rowsum(dO * O) arrives PRECOMPUTED (one XLA pass outside) —
    # recomputing it per KV tile cost nkv redundant (bq, d) VPU passes and
    # streamed O into the kernel for no other use.
    ikv = pl.program_id(2)
    nkv = pl.num_programs(2)

    @pl.when(ikv == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    q, k, v, do = q_ref[0], k_ref[0], v_ref[0], do_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = _mask_tail(s, ikv, kv_len, block_kv, nkv)
    p = jnp.exp(s - lse_ref[0][:, :1])
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta_ref[0][:, :1])
    dq_scr[:] += jax.lax.dot_general(ds.astype(k.dtype), k,
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)

    @pl.when(ikv == nkv - 1)
    def _finalise():
        dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, dk_scr, dv_scr,
                    *, kv_len: int, block_kv: int):
    # q is pre-scaled, so dk = ds^T @ q_scaled carries the scale factor exactly
    # (s = q_scaled @ k^T => ds/dk = q_scaled).
    iq = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(iq == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q, k, v, do = q_ref[0], k_ref[0], v_ref[0], do_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (bq,bkv)
    s = _mask_tail(s, pl.program_id(1), kv_len, block_kv, pl.num_programs(1))
    p = jnp.exp(s - lse_ref[0][:, :1])  # zero dO rows null padded-q contributions
    pb = p.astype(do.dtype)
    dv_scr[:] += jax.lax.dot_general(pb, do, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = (p * (dp - delta_ref[0][:, :1])).astype(q.dtype)
    dk_scr[:] += jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)

    @pl.when(iq == nq - 1)
    def _finalise():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _bwd_fused_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                      dq_ref, dk_ref, dv_ref, dq_scr, dk_scr, dv_scr,
                      *, kv_len: int, block_kv: int):
    """Single-pass flash backward: dq, dk, dv from ONE sweep over (iq, ikv).

    The two-kernel backward recomputes ``s``/``p``/``dp`` in both kernels
    (7 tile matmuls) and reads q/k/v/do/lse from HBM twice; here each tile
    is computed once (5 matmuls) and inputs stream once. dq accumulates in a
    per-q-block scratch (ikv innermost), dk/dv accumulate into a FULL-KV f32
    scratch (persistent across the whole (iq, ikv) sweep of one bh slice) and
    are flushed to HBM at the final step. ``delta = rowsum(dO*O)`` arrives
    precomputed like lse (O itself is not an input).
    """
    iq = pl.program_id(1)
    nq = pl.num_programs(1)
    ikv = pl.program_id(2)
    nkv = pl.num_programs(2)

    @pl.when(ikv == 0)
    def _init_dq():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    @pl.when((iq == 0) & (ikv == 0))
    def _init_dkv():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q, k, v, do = q_ref[0], k_ref[0], v_ref[0], do_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (bq,bkv)
    s = _mask_tail(s, ikv, kv_len, block_kv, nkv)
    p = jnp.exp(s - lse_ref[0][:, :1])
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta_ref[0][:, :1])

    pb = p.astype(do.dtype)
    dsb = ds.astype(q.dtype)
    sl = pl.ds(ikv * block_kv, block_kv)
    dv_scr[sl] += jax.lax.dot_general(pb, do, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
    dk_scr[sl] += jax.lax.dot_general(dsb, q, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
    dq_scr[:] += jax.lax.dot_general(dsb, k, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)

    @pl.when(ikv == nkv - 1)
    def _flush_dq():
        dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)

    @pl.when((iq == nq - 1) & (ikv == nkv - 1))
    def _flush_dkv():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _bwd_fused(q, k, v, lse, delta, do, kv_len, block_q, block_kv, interpret):
    bh, sq, d = q.shape
    skv = k.shape[1]
    # tile budget: s/p/dp/ds live at (bq, bkv) f32 + the (skv, d) f32 dk/dv
    # scratch; the caps keep the working set well inside VMEM (A/B'd on
    # hardware via bench_train). Blocks must divide the padded lengths
    # (pad-free forward blocks like 1296 exceed the caps -> e.g. 432 here).
    block_q = _pick_div(sq, min(block_q, _FUSED_BQ))
    block_kv = _pick_div(skv, min(block_kv, _FUSED_BKV), granule=128)

    q_spec = pl.BlockSpec((1, block_q, d), lambda b, iq, ikv: (b, iq, 0))
    kv_spec = pl.BlockSpec((1, block_kv, d), lambda b, iq, ikv: (b, ikv, 0))
    lse_spec = pl.BlockSpec((1, block_q, _LANES), lambda b, iq, ikv: (b, iq, 0))
    full_kv_spec = pl.BlockSpec((1, skv, d), lambda b, iq, ikv: (b, 0, 0))

    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_fused_kernel, kv_len=kv_len,
                          block_kv=block_kv),
        grid=(bh, sq // block_q, skv // block_kv),
        in_specs=[q_spec, kv_spec, kv_spec, q_spec, lse_spec, lse_spec],
        out_specs=[q_spec, full_kv_spec, full_kv_spec],
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((skv, d), jnp.float32),
            pltpu.VMEM((skv, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=(_VMEM_LIMIT_MB * 1024 * 1024
                              if _VMEM_LIMIT_MB else None),
        ),
        interpret=interpret,
    )(q, k, v, do, lse, delta)
    return dq, dk, dv


def _bwd(q, k, v, lse, delta, do, kv_len, block_q, block_kv, interpret):
    bh, sq, d = q.shape
    skv = k.shape[1]
    # the backward kernels hold s/p/dp/ds tiles at once; block caps tuned on
    # hardware (see scripts/check_tpu_kernels.py + bench_train); blocks must
    # divide the (padded) sequence lengths
    block_q = _pick_div(sq, min(block_q, 1024))
    block_kv = _pick_div(skv, min(block_kv, 1024), granule=128)
    params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "arbitrary"))

    q_spec = pl.BlockSpec((1, block_q, d), lambda b, iq, ikv: (b, iq, 0))
    kv_spec = pl.BlockSpec((1, block_kv, d), lambda b, iq, ikv: (b, ikv, 0))
    lse_spec = pl.BlockSpec((1, block_q, _LANES), lambda b, iq, ikv: (b, iq, 0))

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, kv_len=kv_len,
                          block_kv=block_kv),
        grid=(bh, sq // block_q, skv // block_kv),
        in_specs=[q_spec, kv_spec, kv_spec, q_spec, lse_spec, lse_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=params,
        interpret=interpret,
    )(q, k, v, do, lse, delta)

    # kv-major grid: scratch accumulates over q blocks (innermost)
    q_spec2 = pl.BlockSpec((1, block_q, d), lambda b, ikv, iq: (b, iq, 0))
    kv_spec2 = pl.BlockSpec((1, block_kv, d), lambda b, ikv, iq: (b, ikv, 0))
    lse_spec2 = pl.BlockSpec((1, block_q, _LANES), lambda b, ikv, iq: (b, iq, 0))
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, kv_len=kv_len,
                          block_kv=block_kv),
        grid=(bh, skv // block_kv, sq // block_q),
        in_specs=[q_spec2, kv_spec2, kv_spec2, q_spec2, lse_spec2, lse_spec2],
        out_specs=[kv_spec2, kv_spec2],
        out_shape=[
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_kv, d), jnp.float32),
            pltpu.VMEM((block_kv, d), jnp.float32),
        ],
        compiler_params=params,
        interpret=interpret,
    )(q, k, v, do, lse, delta)
    return dq, dk, dv


# --------------------------------------------------------------------------- #
# custom-vjp core over padded shapes
# --------------------------------------------------------------------------- #
@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash_core(q, k, v, kv_len, block_q, block_kv, interpret):
    o, _ = _fwd(q, k, v, kv_len, block_q, block_kv, interpret,
                with_lse=False)
    return o


def _flash_core_fwd(q, k, v, kv_len, block_q, block_kv, interpret):
    o, lse = _fwd(q, k, v, kv_len, block_q, block_kv, interpret,
                  with_lse=True)
    # Named so a remat policy (save_only_these_names) can keep the kernel's
    # residuals resident: with BOTH outputs saved, the recompute graph under
    # jax.checkpoint DCEs the forward kernel entirely and the backward kernel
    # runs directly — no flash-forward replay (verified: grad jaxpr loses the
    # fwd pallas_call; gradients bit-identical). checkpoint_name is identity
    # when no policy is active.
    o = checkpoint_name(o, "flash_o")
    # The lse residual is carried 2-D ([bh, seq], lane 0 of the kernel's
    # lane-replicated [bh, seq, lanes] output): with the 8-wide replication
    # axis minormost, the (8,128) HBM tiling pads the residual 16x — under a
    # save-names remat policy the per-layer scan stack of those residuals
    # materialised 1.33 GB of pure padding at the dyscene batch-32 shapes
    # (seen in an XLA OOM dump). A transpose does NOT fix it (XLA's layout
    # assignment bitcasts it away and re-pads); dropping the replicated axis
    # does. The backward re-broadcasts (~91 MB, noise next to the kernels),
    # and the kernels only ever read lane 0.
    lse2 = checkpoint_name(lse[..., 0], "flash_lse")
    return o, (q, k, v, o, lse2)


# Fused (single-sweep) backward is used whenever the full-KV f32 dk/dv
# scratch fits comfortably in VMEM; beyond that, the two-kernel backward
# streams KV blocks. At 8192 KV the scratch + four (bq, bkv) f32 tiles
# exceed scoped VMEM (compile failure observed on v5e); 4096 is verified
# on hardware (the training shape, 3888 padded) — check_tpu_kernels.
_FUSED_BWD_MAX_KV = 4096
# tile caps for the fused kernel; env-overridable for on-hardware A/B runs.
# r4 grid on v5e (dyscene global shape, ms for fwd / fwd+bwd, all with the
# 100 MB VMEM budget): old (1024/512, 20 MB scoped) 1.93 / 5.52; caps
# 2048/2048 + pad-free fwd blocks -> 1.61 / 4.86 (12% step-kernel win).
# Effective fused tiles resolve to the largest pad-free divisors under the
# caps, e.g. (1296, 1296) at seq 3888.
_FUSED_BQ = int(os.environ.get("MOTION324_FUSED_BQ", 2048))
_FUSED_BKV = int(os.environ.get("MOTION324_FUSED_BKV", 2048))
_SINGLE_KV = os.environ.get("MOTION324_SINGLE_KV", "1") != "0"
_SINGLE_KV_MAX = 1024  # whole-KV kernel budget: (bq, skv) f32 logit tiles
# scoped-VMEM budget for the flash kernels (MB; 0 = Mosaic default ~20 MB).
# The pad-free blocks need the headroom; 100 MB fits v5e's 128 MB VMEM with
# the Mosaic runtime's own reservations.
_VMEM_LIMIT_MB = int(os.environ.get("MOTION324_FUSED_VMEM_MB", 100))


def _flash_core_bwd(kv_len, block_q, block_kv, interpret, res, do):
    q, k, v, o, lse2 = res
    # back to the kernels' lane-replicated [bh, seq, lanes] contract
    lse = jnp.broadcast_to(lse2[..., None], lse2.shape + (_LANES,))
    # delta = rowsum(dO * O), computed ONCE here (one fused XLA pass over
    # (bh, sq, d)) instead of per KV tile inside the kernels — saves the
    # redundant per-tile (bq, d) VPU reduce and drops O from the kernels'
    # streamed inputs entirely.
    delta2 = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    delta = jnp.broadcast_to(delta2[..., None], delta2.shape + (_LANES,))
    if k.shape[1] <= _FUSED_BWD_MAX_KV and k.shape[2] <= 128:
        return _bwd_fused(q, k, v, lse, delta, do, kv_len, block_q, block_kv,
                          interpret)
    return _bwd(q, k, v, lse, delta, do, kv_len, block_q, block_kv, interpret)


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


def _pick_block(seq: int, target: int, granule: int = 16) -> int:
    """Block size minimising padding; prefers a PAD-FREE exact divisor.

    First choice: the largest ``granule``-multiple divisor of the
    granule-padded length within [max(128, target/2), hi] — e.g. the dyscene
    global sequence 3888 runs at bq 1296 x 3 blocks with ZERO row padding
    instead of padding to 4096 at bq 1024. Queries use granule 16 (sublane
    tiling) and may exceed the target by 1.5x for an exact fit; KV uses
    granule 128 (lane tiling of the logit tiles) and is HARD-capped at the
    target — a bigger KV block would route lengths in (target, 1.5*target]
    into the whole-KV single-block kernel, whose (bq, skv) f32 logit tiles
    are VMEM-budgeted for <= target.

    KV second chance: when no 128-granule divisor exists, an 8-granule
    (sublane-tileable) divisor in (target, 2*target] is taken instead —
    e.g. KV 3888 runs pad-free at bkv 1944 rather than padding to 4096 at
    1024, which measured 17% faster forward on v5e (grid A/B, r4): the tail
    mask disappears and the streamed K/V bytes drop 5%. The bigger logit
    tile rides the raised fused-kernel VMEM budget (_VMEM_LIMIT_MB).

    Fallback: seq >= target -> target; below that the power-of-two block
    (>= 128) whose padded length is smallest — e.g. seq 324 pads to 384 with
    blocks of 128 instead of 512 with blocks of 256.
    """
    seq_g = _ceil_to(seq, granule)
    lo = max(128, target // 2)
    hi = target if granule >= 128 else target + target // 2
    exact = 0
    d = lo
    while d <= min(seq_g, hi):
        if seq_g % d == 0:
            exact = d
        d += granule
    if not exact and granule >= 128 and seq > target:
        seq_8 = _ceil_to(seq, 8)
        d = _ceil_to(target + 8, 8)
        while d <= min(seq_8, 2 * target):
            if seq_8 % d == 0:
                exact = d  # prefer the largest pad-free block in the window
            d += 8
    # fallback choice (old behaviour)
    if seq >= target:
        fall = target
    else:
        fall = 128
        b = 256
        while b <= target:
            if _ceil_to(seq, b) <= _ceil_to(seq, fall):
                fall = b
            b *= 2
    if exact and _ceil_to(seq, exact) <= _ceil_to(seq, fall):
        return exact
    return fall


def _pick_div(seq_p: int, cap: int, granule: int = 16) -> int:
    """Largest ``granule``-multiple divisor of ``seq_p`` that is <= ``cap``
    (for backward kernels, whose blocks must tile the already-padded length).
    Falls back to 16-granule (which always divides: padded lengths are
    multiples of a 16-multiple forward block) when no ``granule``-multiple
    divisor exists."""
    for g in (granule, 16):
        best = 0
        d = g
        while d <= min(seq_p, cap):
            if seq_p % d == 0:
                best = d
            d += g
        if best:
            return best
    return seq_p  # seq_p < 16: single block


def flash_attention(q, k, v, *, scale: float | None = None,
                    block_q: int = 1024, block_kv: int = 1024,
                    interpret: bool = False):
    """Exact multi-head attention via Pallas flash kernels.

    Args:
      q: ``(B, H, Sq, D)`` queries.
      k, v: ``(B, H, Sk, D)`` keys/values.
      scale: logit scale; defaults to ``1/sqrt(D)``.
      block_q, block_kv: tile sizes (auto-shrunk for short sequences).
      interpret: run kernels in interpreter mode (CPU testing).

    Returns:
      ``(B, H, Sq, D)`` attention output in the dtype of ``q``.
    """
    b, h, sq, d = q.shape
    sk = k.shape[2]
    if scale is None:
        scale = 1.0 / math.sqrt(d)

    bq = _pick_block(sq, block_q)                 # sublane dim: 16-granule
    bkv = _pick_block(sk, block_kv, granule=128)  # lane dim: 128-granule
    sq_p = _ceil_to(sq, bq)
    sk_p = _ceil_to(sk, bkv)

    # Fold the logit scale into q OUTSIDE the kernels: one pass over (S, D)
    # here instead of a multiply over every (Sq, Sk) logit in all four
    # kernels. Gradients stay exact (this multiply's vjp rescales dq).
    qf = (q * jnp.asarray(scale, q.dtype)).reshape(b * h, sq, d)
    kf = k.reshape(b * h, sk, d)
    vf = v.reshape(b * h, sk, d)
    if sq_p != sq:
        qf = jnp.pad(qf, ((0, 0), (0, sq_p - sq), (0, 0)))
    if sk_p != sk:
        kf = jnp.pad(kf, ((0, 0), (0, sk_p - sk), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, sk_p - sk), (0, 0)))

    o = _flash_core(qf, kf, vf, sk, bq, bkv, interpret)
    return o[:, :sq].reshape(b, h, sq, d)
