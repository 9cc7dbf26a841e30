"""Pre-norm transformer blocks with QK-RMSNorm.

Behavioural parity with the reference blocks (reference: model/transformer.py):
- RMSNorm computed in float32, scaled in input dtype (:30-42);
- MLP: Linear -> exact GELU -> Linear, no biases (:46-81);
- self/cross attention with per-head-dim RMSNorm on Q and K (:84-219);
- pre-norm residual blocks, LayerNorm without bias (:324-423).

All attention routes through :func:`motion324_tpu.ops.attention.multi_head_attention`
(Pallas flash kernels on TPU). Computation runs in ``dtype`` (bfloat16 by
default in training configs); parameters are float32.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

from motion324_tpu.ops.attention import multi_head_attention

__all__ = ["RMSNorm", "MLP", "SelfAttention", "CrossAttention",
           "TransformerBlock", "CrossAttentionBlock", "stack_blocks",
           "stack_inner"]


_REMAT_POLICIES = {
    # flash kernel residuals only: backward DCEs the flash-forward replay
    "save_attn": ("flash_o", "flash_lse"),
    # + the two big matmul outputs per block (QKV projection, MLP hidden):
    # the backward replay shrinks to layernorms/elementwise + the o-proj —
    # trades ~330 MB/block (micro-batch 8, dyscene shapes) for skipping the
    # projection/FFN recompute. Only viable with grad accumulation (the
    # monolithic batch-32 step OOMs).
    "save_matmuls": ("flash_o", "flash_lse", "qkv_proj", "mlp_hidden"),
}


def stack_inner(block_cls, length: int, *, remat: bool = False,
                remat_policy: str | None = None, unroll: int = 1,
                **block_kwargs):
    """Return ``apply(x)`` for use INSIDE an ``nn.compact`` scope: scans
    ``length`` blocks under the child scope ``layers/block`` — the exact
    parameter layout of :func:`stack_blocks`, reusable by wrappers that need
    the same tree (e.g. the pipeline-parallel stage, which applies a SLICE of
    the stacked layer axis per device)."""
    if remat and remat_policy:
        policy = jax.checkpoint_policies.save_only_these_names(
            *_REMAT_POLICIES[remat_policy])
        inner_cls = nn.remat(block_cls, prevent_cse=False, policy=policy)
    elif remat:
        inner_cls = nn.remat(block_cls, prevent_cse=False)
    else:
        inner_cls = block_cls

    class _Body(nn.Module):
        @nn.compact
        def __call__(self, carry, _):
            return inner_cls(**block_kwargs, name="block")(carry), None

    _Body.__name__ = f"Scan{block_cls.__name__}"

    def apply(x):
        scan = nn.scan(_Body, variable_axes={"params": 0},
                       split_rngs={"params": True, "dropout": True},
                       length=length, unroll=unroll)
        x, _ = scan(name="layers")(x, None)
        return x

    return apply


def stack_blocks(block_cls, length: int, *, remat: bool = False, name: str,
                 remat_policy: str | None = None, unroll: int = 1,
                 **block_kwargs):
    """Stack ``length`` identical blocks via ``nn.scan`` (weights differ per
    layer, the LAYER PROGRAM is compiled once).

    This is the TPU-native replacement for Python-level layer loops: XLA
    traces/compiles a single block and iterates it, cutting compile time by
    ~the layer count. Parameters gain a leading ``length`` axis (the torch
    checkpoint converter stacks per-layer weights accordingly). ``remat``
    wraps the block in ``nn.remat`` (the jax.checkpoint analogue of the
    reference's torch.utils.checkpoint layer groups, model/Pcd_motion.py:375-448).

    ``remat_policy`` selects a named-save set (:data:`_REMAT_POLICIES`):
    'save_attn' keeps the flash kernel's RESIDUALS (the padded output +
    8-lane logsumexp, named inside the custom-vjp forward) resident, which
    lets the backward DCE the flash-forward replay entirely and run the
    backward kernel directly (~240 MB/global layer at the dyscene batch-32
    shapes). 'save_matmuls' additionally keeps the QKV projection and the
    MLP hidden. An earlier variant that saved the post-reshape attention
    *outputs* could not skip the kernel replay (the residual lse was not
    derivable) and regressed at batch 32; these are A/B'd via bench_train.

    ``unroll`` is forwarded to ``lax.scan``: >1 trades compile time for
    removing per-iteration dynamic-update-slice overhead on the stacked
    saves (the layer program is still traced once).
    """
    inner_apply = stack_inner(block_cls, length, remat=remat,
                              remat_policy=remat_policy, unroll=unroll,
                              **block_kwargs)

    class _Stack(nn.Module):
        @nn.compact
        def __call__(self, x):
            return inner_apply(x)

    _Stack.__name__ = f"Stacked{block_cls.__name__}"
    return _Stack(name=name)

Dtype = Any


def gelu(x):
    """GELU matching the reference's exact-erf ``F.gelu`` to working precision.

    In float32 this is the exact erf form. Under bfloat16 compute it switches
    to the tanh approximation: on TPU the exact form lowers to a ~20-term f32
    erfc polynomial (plus a packed branch-select mask saved for the VJP) that
    is 2x slower than tanh on the VPU, while its bf16 output is identical to
    exact-erf within bf16 rounding — measured max|Δ| vs exact-f32 is 7.0e-3
    on N(0,1) inputs for BOTH variants, i.e. the approximation error is below
    the storage quantisation (on-chip A/B, (24,4096,3072): exact 5.51 ms /
    tanh 2.83 ms fwd).
    """
    return nn.gelu(x, approximate=x.dtype == jnp.bfloat16)


class RMSNorm(nn.Module):
    """RMS normalisation over the last axis; statistics in float32."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        xf = x.astype(jnp.float32)
        normed = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + self.eps)
        return normed.astype(x.dtype) * weight.astype(x.dtype)


class MLP(nn.Module):
    """Feed-forward block: Dense -> GELU(exact) -> Dense, default no biases."""

    dim: int
    mlp_ratio: int = 4
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        hidden = self.dim * self.mlp_ratio
        x = nn.Dense(hidden, use_bias=self.use_bias, dtype=self.dtype, name="fc1")(x)
        x = checkpoint_name(x, "mlp_hidden")  # 'save_matmuls' save point
        x = gelu(x)
        x = nn.Dense(self.dim, use_bias=self.use_bias, dtype=self.dtype, name="fc2")(x)
        return x


class SelfAttention(nn.Module):
    """Multi-head self-attention with optional QK-RMSNorm, fused QKV projection.

    ``sp_axis``: sequence-parallel mesh axis. When set (inside ``shard_map``),
    the token axis is SHARDED across devices: queries stay local and K/V are
    all-gathered over ICI before the (rectangular) flash attention — exact
    attention over the full sequence with O(S/N) local compute.
    """

    dim: int
    head_dim: int = 64
    use_qk_norm: bool = True
    qkv_bias: bool = False
    fc_bias: bool = False
    dtype: Dtype = jnp.float32
    attn_backend: str | None = None
    attn_save_name: str = "attn_out"  # checkpoint_name for selective remat
    sp_axis: str | None = None

    @nn.compact
    def __call__(self, x):
        b, l, _ = x.shape
        nh = self.dim // self.head_dim
        qkv = nn.Dense(3 * self.dim, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="to_qkv")(x)
        qkv = checkpoint_name(qkv, "qkv_proj")  # 'save_matmuls' save point
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, l, nh, self.head_dim)
        k = k.reshape(b, l, nh, self.head_dim)
        v = v.reshape(b, l, nh, self.head_dim)
        if self.use_qk_norm:
            q = RMSNorm(name="q_norm")(q)
            k = RMSNorm(name="k_norm")(k)
        if self.sp_axis is not None:
            # device order == frame-block order, so tiled gather restores the
            # global token ordering
            k = jax.lax.all_gather(k, self.sp_axis, axis=1, tiled=True)
            v = jax.lax.all_gather(v, self.sp_axis, axis=1, tiled=True)
        out = multi_head_attention(q, k, v, backend=self.attn_backend)
        out = checkpoint_name(out, self.attn_save_name)
        out = out.reshape(b, l, self.dim)
        return nn.Dense(self.dim, use_bias=self.fc_bias, dtype=self.dtype,
                        name="fc")(out)


class CrossAttention(nn.Module):
    """Multi-head cross-attention (separate Q and KV inputs) with QK-RMSNorm."""

    dim: int
    head_dim: int = 64
    use_qk_norm: bool = True
    qkv_bias: bool = False
    fc_bias: bool = False
    dtype: Dtype = jnp.float32
    attn_backend: str | None = None

    @nn.compact
    def __call__(self, query, key, value):
        b, lq, _ = query.shape
        lk = key.shape[1]
        nh = self.dim // self.head_dim
        q = nn.Dense(self.dim, use_bias=self.qkv_bias, dtype=self.dtype,
                     name="to_q")(query)
        k = nn.Dense(self.dim, use_bias=self.qkv_bias, dtype=self.dtype,
                     name="to_k")(key)
        v = nn.Dense(self.dim, use_bias=self.qkv_bias, dtype=self.dtype,
                     name="to_v")(value)
        q = q.reshape(b, lq, nh, self.head_dim)
        k = k.reshape(b, lk, nh, self.head_dim)
        v = v.reshape(b, lk, nh, self.head_dim)
        if self.use_qk_norm:
            q = RMSNorm(name="q_norm")(q)
            k = RMSNorm(name="k_norm")(k)
        out = multi_head_attention(q, k, v, backend=self.attn_backend)
        out = checkpoint_name(out, "xattn_out")  # selective-remat save point
        out = out.reshape(b, lq, self.dim)
        return nn.Dense(self.dim, use_bias=self.fc_bias, dtype=self.dtype,
                        name="fc")(out)


class TransformerBlock(nn.Module):
    """Pre-norm self-attention block: ``x + attn(ln(x))``, ``x + mlp(ln(x))``."""

    dim: int
    head_dim: int = 64
    use_qk_norm: bool = True
    mlp_ratio: int = 4
    dtype: Dtype = jnp.float32
    attn_backend: str | None = None

    attn_save_name: str = "attn_out"
    sp_axis: str | None = None

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(use_bias=False, epsilon=1e-5, dtype=self.dtype,
                         name="norm1")(x)
        x = x + SelfAttention(self.dim, self.head_dim, self.use_qk_norm,
                              dtype=self.dtype, attn_backend=self.attn_backend,
                              attn_save_name=self.attn_save_name,
                              sp_axis=self.sp_axis,
                              name="attn")(h)
        h = nn.LayerNorm(use_bias=False, epsilon=1e-5, dtype=self.dtype,
                         name="norm2")(x)
        return x + MLP(self.dim, self.mlp_ratio, dtype=self.dtype, name="mlp")(h)


class CrossAttentionBlock(nn.Module):
    """Pre-norm cross-attention block; KV share one LayerNorm (reference :345-369)."""

    dim: int
    head_dim: int = 64
    use_qk_norm: bool = True
    mlp_ratio: int = 4
    dtype: Dtype = jnp.float32
    attn_backend: str | None = None

    @nn.compact
    def __call__(self, query, key, value):
        norm_kv = nn.LayerNorm(use_bias=False, epsilon=1e-5, dtype=self.dtype,
                               name="norm_kv")
        qn = nn.LayerNorm(use_bias=False, epsilon=1e-5, dtype=self.dtype,
                          name="norm_q")(query)
        x = query + CrossAttention(self.dim, self.head_dim, self.use_qk_norm,
                                   dtype=self.dtype, attn_backend=self.attn_backend,
                                   name="attn")(qn, norm_kv(key), norm_kv(value))
        h = nn.LayerNorm(use_bias=False, epsilon=1e-5, dtype=self.dtype,
                         name="norm2")(x)
        return x + MLP(self.dim, self.mlp_ratio, dtype=self.dtype, name="mlp")(h)
