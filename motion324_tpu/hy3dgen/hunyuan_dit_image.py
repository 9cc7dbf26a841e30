"""HunyuanDiT text-to-image denoiser (diffusers ``HunyuanDiT2DModel`` layout).

The reference's text2image stage loads
``Tencent-Hunyuan/HunyuanDiT-v1.1-Diffusers-Distilled`` through diffusers
(reference: scripts/hy3dgen/text2image.py:30-45). This module re-implements
that transformer's block layout in flax so the released checkpoint converts
1:1 (``convert_hunyuan_dit_image``):

- patchify conv (patch 2) -> 40 ``HunyuanDiTBlock``s with U-ViT long skips in
  the latter half (cat + LayerNorm + linear);
- per-block: AdaLayerNormShift (shift-only time modulation), self-attention
  with per-head q/k LayerNorm + 2D rotary embeddings, cross-attention to the
  combined CLIP+T5 text states (rope on q only), gelu-tanh MLP;
- conditioning: timestep MLP + T5 attention-pool + image-meta-size Fourier
  embedding + style embedding, fused by a two-layer extra embedder;
- text: T5 states projected 2048->1024 and concatenated after the CLIP
  states, with a learned padding row where the attention mask is 0;
- output: AdaLayerNorm-continuous final norm, linear head to
  patch^2 * 2*in_channels (learned-sigma epsilon prediction).

Layout/semantics follow the public diffusers implementation
(``models/transformers/hunyuan_transformer_2d.py``); diffusers itself is not
installable here, so parity is asserted against a local torch mirror written
from the same public source (tests/hunyuan_dit_oracle.py) — the same
validation pattern as the SD stack. One knowingly-unverifiable detail is
pinned and documented: the 2D RoPE axis order (height half first, then
width); if a real checkpoint ever produces transposed output, flip
``rope_hw_order``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = ["HunyuanDiT2D", "convert_hunyuan_dit_image",
           "HunyuanDiTImagePipeline"]

Dtype = Any


def _timestep_proj(t, dim=256):
    """diffusers Timesteps(256, flip_sin_to_cos=True, freq_shift=0)."""
    half = dim // 2
    freqs = jnp.exp(-jnp.log(10000.0) * jnp.arange(half) / half)
    ang = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)


def rope_2d(gh: int, gw: int, head_dim: int, hw_order: bool = True):
    """2D rotary tables (cos, sin), each (gh*gw, head_dim), row-major tokens.

    Per diffusers ``get_2d_rotary_pos_embed``: half the head dim rotates with
    the row coordinate, half with the column; 1D tables use the
    repeat-interleaved real form (cos duplicated per even/odd pair).
    """
    def axis(pos, dim):
        freqs = 1.0 / (10000.0 ** (np.arange(0, dim, 2, dtype=np.float64)
                                   / dim))
        ang = np.outer(pos, freqs)  # (S, dim/2)
        cos = np.repeat(np.cos(ang), 2, axis=1)
        sin = np.repeat(np.sin(ang), 2, axis=1)
        return cos, sin

    rows = np.repeat(np.arange(gh), gw)
    cols = np.tile(np.arange(gw), gh)
    a, b = (rows, cols) if hw_order else (cols, rows)
    cos_a, sin_a = axis(a, head_dim // 2)
    cos_b, sin_b = axis(b, head_dim // 2)
    cos = np.concatenate([cos_a, cos_b], axis=1).astype(np.float32)
    sin = np.concatenate([sin_a, sin_b], axis=1).astype(np.float32)
    return jnp.asarray(cos), jnp.asarray(sin)


def _apply_rope(x, cos, sin):
    """x (B, H, S, D); diffusers apply_rotary_emb real-pair form."""
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    rotated = jnp.stack([-x2, x1], axis=-1).reshape(x.shape)
    return (x.astype(jnp.float32) * cos + rotated.astype(jnp.float32) * sin
            ).astype(x.dtype)


class _PoolFeedTextProj(nn.Module):
    """PixArtAlphaTextProjection: linear_1 -> silu (fp32) -> linear_2."""

    hidden: int
    out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.hidden, dtype=self.dtype, name="linear_1")(x)
        h = nn.silu(h.astype(jnp.float32)).astype(h.dtype)
        return nn.Dense(self.out, dtype=self.dtype, name="linear_2")(h)


class _AttentionPool(nn.Module):
    """HunyuanDiTAttentionPool (CLIP-style): mean token prepended, learned
    positional embedding, MHA with the mean token as the only query."""

    heads: int = 8
    out_dim: int = 1024
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, L, D)
        b, l, d = x.shape
        x = jnp.concatenate([x.mean(axis=1, keepdims=True), x], axis=1)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(d ** -0.5), (l + 1, d))
        x = x + pos.astype(x.dtype)
        q = nn.Dense(d, dtype=self.dtype, name="q_proj")(x[:, :1])
        k = nn.Dense(d, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(d, dtype=self.dtype, name="v_proj")(x)
        hd = d // self.heads
        q = q.reshape(b, 1, self.heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, l + 1, self.heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, l + 1, self.heads, hd).transpose(0, 2, 1, 3)
        a = jax.nn.softmax(
            jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(hd), axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", a, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, 1, d)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="c_proj")(
            o)[:, 0]


class _HunyuanAttention(nn.Module):
    """diffusers Attention with qk_norm='layer_norm' and rotary embeddings:
    rope applied to q always, to k only for self-attention.

    ``perturb=True`` (self-attention only) replaces the attention map with
    the identity — each token attends solely to itself, so the output is
    ``to_out(to_v(x))`` with q/k/norms/rope skipped. This is the
    perturbed-attention-guidance (PAG) degradation the reference enables via
    diffusers' ``enable_pag=True`` (reference scripts/hy3dgen/
    text2image.py:36-46; PAGIdentitySelfAttnProcessor semantics)."""

    dim: int
    heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, rope=None, perturb: bool = False):
        self_attn = context is None
        context = x if context is None else context
        b, l, _ = x.shape
        if perturb:
            assert self_attn, "PAG perturbs self-attention only"
            v = nn.Dense(self.dim, dtype=self.dtype, name="to_v")(context)
            return nn.Dense(self.dim, dtype=self.dtype, name="to_out")(v)
        lc = context.shape[1]
        hd = self.dim // self.heads
        q = nn.Dense(self.dim, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(self.dim, dtype=self.dtype, name="to_k")(context)
        v = nn.Dense(self.dim, dtype=self.dtype, name="to_v")(context)
        q = q.reshape(b, l, self.heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, lc, self.heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, lc, self.heads, hd).transpose(0, 2, 1, 3)
        q = nn.LayerNorm(epsilon=1e-6, name="norm_q")(q)
        k = nn.LayerNorm(epsilon=1e-6, name="norm_k")(k)
        if rope is not None:
            cos, sin = rope
            q = _apply_rope(q, cos, sin)
            if self_attn:
                k = _apply_rope(k, cos, sin)
        a = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32) / np.sqrt(hd)
        w = jax.nn.softmax(a, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", w, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, l, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="to_out")(o)


class _HunyuanBlock(nn.Module):
    dim: int
    heads: int
    skip: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, ctx, temb, rope, skip_tensor=None,
                 perturb: bool = False):
        if self.skip:
            cat = jnp.concatenate([x, skip_tensor], axis=-1)
            cat = nn.LayerNorm(epsilon=1e-6, name="skip_norm")(
                cat.astype(jnp.float32)).astype(cat.dtype)
            x = nn.Dense(self.dim, dtype=self.dtype, name="skip_linear")(cat)
        # AdaLayerNormShift: affine LN + time shift (no scale)
        shift = nn.Dense(self.dim, dtype=self.dtype, name="norm1_linear")(
            nn.silu(temb.astype(jnp.float32)).astype(temb.dtype))
        h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x) + shift[:, None]
        x = x + _HunyuanAttention(self.dim, self.heads, self.dtype,
                                  name="attn1")(h, rope=rope, perturb=perturb)
        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(
            x.astype(jnp.float32)).astype(x.dtype)
        x = x + _HunyuanAttention(self.dim, self.heads, self.dtype,
                                  name="attn2")(h, ctx, rope=rope)
        h = nn.LayerNorm(epsilon=1e-6, name="norm3")(
            x.astype(jnp.float32)).astype(x.dtype)
        h = nn.Dense(self.dim * 4, dtype=self.dtype, name="ff_in")(h)
        h = nn.gelu(h, approximate=True)
        return x + nn.Dense(self.dim, dtype=self.dtype, name="ff_out")(h)


class HunyuanDiT2D(nn.Module):
    """(B, H, W, in_ch) latents -> (B, H, W, 2*in_ch) eps|sigma prediction.

    Released v1.1 dims: hidden 1408 (16 heads x 88), 40 blocks, patch 2,
    ctx 1024 (CLIP) + T5 2048->1024, style + image-meta-size conditioning.
    """

    hidden: int = 1408
    heads: int = 16
    num_layers: int = 40
    patch: int = 2
    in_channels: int = 4
    ctx_dim: int = 1024
    t5_dim: int = 2048
    text_len: int = 77
    text_len_t5: int = 256
    use_style: bool = True
    rope_hw_order: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t, clip_states, t5_states, clip_mask=None,
                 t5_mask=None, image_meta_size=None, style=None,
                 pag_layers: tuple = ()):
        """``pag_layers`` (static tuple of block indices) routes those
        blocks' self-attention through the PAG identity perturbation —
        the reference's ``pag_applied_layers=['blocks.(16|17|18|19)']``
        (reference scripts/hy3dgen/text2image.py:41)."""
        b, hh, ww, _ = x.shape
        gh, gw = hh // self.patch, ww // self.patch
        head_dim = self.hidden // self.heads

        h = nn.Conv(self.hidden, (self.patch, self.patch),
                    strides=(self.patch, self.patch), padding="VALID",
                    dtype=self.dtype, name="pos_embed_proj")(x)
        h = h.reshape(b, gh * gw, self.hidden)

        # ---- conditioning vector -------------------------------------------
        temb = _PoolFeedTextProj(self.hidden, self.hidden, self.dtype,
                                 name="timestep_embedder")(_timestep_proj(t))
        pooled = _AttentionPool(8, self.ctx_dim, self.dtype,
                                name="pooler")(t5_states)
        if self.use_style:
            if image_meta_size is None:
                image_meta_size = jnp.tile(
                    jnp.asarray([[hh * 8, ww * 8, hh * 8, ww * 8, 0, 0]],
                                jnp.float32), (b, 1))
            size_emb = _timestep_proj(
                image_meta_size.reshape(-1)).reshape(b, 6 * 256)
            style = jnp.zeros((b,), jnp.int32) if style is None else style
            style_emb = nn.Embed(1, self.hidden,
                                 name="style_embedder")(style)
            extra = jnp.concatenate(
                [pooled, size_emb.astype(pooled.dtype),
                 style_emb.astype(pooled.dtype)], axis=-1)
        else:
            extra = pooled
        temb = temb + _PoolFeedTextProj(self.hidden * 4, self.hidden,
                                        self.dtype,
                                        name="extra_embedder")(extra)

        # ---- combined text states ------------------------------------------
        t5_proj = _PoolFeedTextProj(self.t5_dim * 4, self.ctx_dim, self.dtype,
                                    name="text_embedder")(t5_states)
        ctx = jnp.concatenate([clip_states, t5_proj], axis=1)
        pad_row = self.param("text_embedding_padding",
                             nn.initializers.normal(1.0),
                             (self.text_len + self.text_len_t5, self.ctx_dim))
        if clip_mask is None:
            clip_mask = jnp.ones((b, self.text_len), bool)
        if t5_mask is None:
            t5_mask = jnp.ones((b, self.text_len_t5), bool)
        mask = jnp.concatenate([clip_mask, t5_mask], axis=1).astype(bool)
        ctx = jnp.where(mask[..., None], ctx, pad_row[None].astype(ctx.dtype))

        rope = rope_2d(gh, gw, head_dim, self.rope_hw_order)

        # ---- U-ViT block stack ---------------------------------------------
        half = self.num_layers // 2
        skips = []
        for layer in range(self.num_layers):
            blk = _HunyuanBlock(self.hidden, self.heads, skip=layer > half,
                                dtype=self.dtype, name=f"block_{layer}")
            h = blk(h, ctx, temb, rope,
                    skip_tensor=skips.pop() if layer > half else None,
                    perturb=layer in pag_layers)
            if layer < half - 1:
                skips.append(h)

        # ---- head ------------------------------------------------------------
        emb = nn.Dense(2 * self.hidden, dtype=self.dtype,
                       name="norm_out_linear")(
            nn.silu(temb.astype(jnp.float32)).astype(temb.dtype))
        scale, shift = jnp.split(emb, 2, axis=-1)
        h = nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False,
                         name="norm_out")(h.astype(jnp.float32)).astype(
            h.dtype)
        h = h * (1 + scale[:, None]) + shift[:, None]
        out = nn.Dense(self.patch * self.patch * 2 * self.in_channels,
                       dtype=self.dtype, name="proj_out")(h)
        out = out.reshape(b, gh, gw, self.patch, self.patch,
                          2 * self.in_channels)
        out = out.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, hh, ww, 2 * self.in_channels)
        return out.astype(jnp.float32)


def convert_hunyuan_dit_image(state_dict: dict, *, num_layers: int = 40,
                              strict: bool = True) -> dict:
    """diffusers ``HunyuanDiT2DModel`` state dict -> :class:`HunyuanDiT2D`
    flax params. Strict: every checkpoint key must be consumed."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    used = set()

    def take(k):
        used.add(k)
        return sd[k].astype(np.float32)

    def dense(name):
        p = {"kernel": take(f"{name}.weight").T}
        if f"{name}.bias" in sd:
            p["bias"] = take(f"{name}.bias")
        return p

    def ln(name):
        return {"scale": take(f"{name}.weight"), "bias": take(f"{name}.bias")}

    def proj2(name):
        return {"linear_1": dense(f"{name}.linear_1"),
                "linear_2": dense(f"{name}.linear_2")}

    out: dict = {
        "pos_embed_proj": {
            "kernel": take("pos_embed.proj.weight").transpose(2, 3, 1, 0),
            "bias": take("pos_embed.proj.bias")},
        "timestep_embedder": proj2("time_extra_emb.timestep_embedder"),
        "pooler": {
            "positional_embedding":
                take("time_extra_emb.pooler.positional_embedding"),
            "q_proj": dense("time_extra_emb.pooler.q_proj"),
            "k_proj": dense("time_extra_emb.pooler.k_proj"),
            "v_proj": dense("time_extra_emb.pooler.v_proj"),
            "c_proj": dense("time_extra_emb.pooler.c_proj")},
        "extra_embedder": proj2("time_extra_emb.extra_embedder"),
        "text_embedder": proj2("text_embedder"),
        "text_embedding_padding": take("text_embedding_padding"),
        "norm_out_linear": dense("norm_out.linear"),
        "proj_out": dense("proj_out"),
    }
    if "time_extra_emb.style_embedder.weight" in sd:
        out["style_embedder"] = {
            "embedding": take("time_extra_emb.style_embedder.weight")}

    def attn(name):
        return {"to_q": dense(f"{name}.to_q"),
                "to_k": dense(f"{name}.to_k"),
                "to_v": dense(f"{name}.to_v"),
                "to_out": dense(f"{name}.to_out.0"),
                "norm_q": ln(f"{name}.norm_q"),
                "norm_k": ln(f"{name}.norm_k")}

    half = num_layers // 2
    for i in range(num_layers):
        b = f"blocks.{i}"
        blk = {"norm1": ln(f"{b}.norm1.norm"),
               "norm1_linear": dense(f"{b}.norm1.linear"),
               "attn1": attn(f"{b}.attn1"),
               "norm2": ln(f"{b}.norm2"),
               "attn2": attn(f"{b}.attn2"),
               "norm3": ln(f"{b}.norm3"),
               "ff_in": dense(f"{b}.ff.net.0.proj"),
               "ff_out": dense(f"{b}.ff.net.2")}
        if i > half:
            blk["skip_norm"] = ln(f"{b}.skip_norm")
            blk["skip_linear"] = dense(f"{b}.skip_linear")
        out[f"block_{i}"] = blk
    if strict:
        left = sorted(set(sd) - used)
        if left:
            raise KeyError(f"{len(left)} unconsumed HunyuanDiT keys, e.g. "
                           f"{left[:8]}")
    return {"params": out}


class HunyuanDiTImagePipeline:
    """Text embeddings -> (H, W, 3) image via the HunyuanDiT denoiser.

    Minimal counterpart of the reference's diffusers AutoPipeline call
    (reference: scripts/hy3dgen/text2image.py:62-81 — 25 steps, CFG; PAG is a
    sampling-time extra, not architecture): DDIM over the learned-sigma
    epsilon prediction with scaled-linear betas. Text states arrive
    precomputed (the released pipeline's CLIP/mT5 encoders are standard HF
    models; pass their hidden states + masks) — ``params`` carries the
    converted transformer and an SD-VAE tree for decode.

    Scheduler betas default to the HunyuanDiT DDPM config
    (scaled_linear 0.00085..0.03, 1000 steps); override from the released
    ``scheduler_config.json`` when converting a real checkpoint.
    """

    def __init__(self, params: dict, *, model: HunyuanDiT2D | None = None,
                 vae=None, image_size: int = 1024,
                 beta_start: float = 0.00085, beta_end: float = 0.03,
                 num_train_timesteps: int = 1000,
                 pag_applied_layers: tuple = (16, 17, 18, 19)):
        from motion324_tpu.hy3dgen.sd_vae import SCALING_FACTOR, AutoencoderKL

        self.model = model or HunyuanDiT2D(dtype=jnp.bfloat16)
        self.vae = vae or AutoencoderKL(dtype=jnp.bfloat16)
        self.params = params
        self.image_size = image_size
        self.pag_applied_layers = tuple(
            l for l in pag_applied_layers if l < self.model.num_layers)
        betas = np.linspace(beta_start ** 0.5, beta_end ** 0.5,
                            num_train_timesteps, dtype=np.float64) ** 2
        self._alphas = jnp.asarray(np.cumprod(1.0 - betas), jnp.float32)
        self._num_train = num_train_timesteps
        self._scaling = SCALING_FACTOR

        def _eps_cfg(mp, x, t, clip_c, clip_u, t5_c, t5_u, cm, tm, guidance):
            b = x.shape[0]
            tt = jnp.full((2 * b,), t, jnp.float32)
            xx = jnp.concatenate([x, x], axis=0)
            out = self.model.apply(
                mp, xx, tt,
                jnp.concatenate([clip_c, clip_u], axis=0),
                jnp.concatenate([t5_c, t5_u], axis=0),
                jnp.concatenate([cm, cm], axis=0),
                jnp.concatenate([tm, tm], axis=0))
            eps = out[..., :self.model.in_channels]  # learned sigma dropped
            e_c, e_u = jnp.split(eps, 2, axis=0)
            return e_c, e_u

        def _ddim(x, eps, a_t, a_prev):
            x0 = (x - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
            return jnp.sqrt(a_prev) * x0 + jnp.sqrt(1.0 - a_prev) * eps

        @jax.jit
        def _step(mp, x, t, a_t, a_prev, clip_c, clip_u, t5_c, t5_u,
                  cm, tm, guidance):
            e_c, e_u = _eps_cfg(mp, x, t, clip_c, clip_u, t5_c, t5_u,
                                cm, tm, guidance)
            return _ddim(x, e_u + guidance * (e_c - e_u), a_t, a_prev)

        @jax.jit
        def _step_pag(mp, x, t, a_t, a_prev, clip_c, clip_u, t5_c, t5_u,
                      cm, tm, guidance, pag_scale):
            """CFG + perturbed-attention guidance (reference
            text2image.py:30-81, pag_scale 1.3): the perturbed branch runs
            the COND embeddings through the model with identity self-attn in
            ``pag_applied_layers``; eps = e_u + g*(e_c - e_u)
            + pag*(e_c - e_p)."""
            e_c, e_u = _eps_cfg(mp, x, t, clip_c, clip_u, t5_c, t5_u,
                                cm, tm, guidance)
            tt = jnp.full((x.shape[0],), t, jnp.float32)
            out_p = self.model.apply(mp, x, tt, clip_c, t5_c, cm, tm,
                                     pag_layers=self.pag_applied_layers)
            e_p = out_p[..., :self.model.in_channels]
            eps = (e_u + guidance * (e_c - e_u) + pag_scale * (e_c - e_p))
            return _ddim(x, eps, a_t, a_prev)

        @jax.jit
        def _decode(vp, z):
            from motion324_tpu.hy3dgen.sd_vae import AutoencoderKL as _V
            return self.vae.apply(vp, z / self._scaling, method=_V.decode)

        self._step = _step
        self._step_pag = _step_pag
        self._decode = _decode

    @classmethod
    def from_diffusers(cls, transformer_sd: dict, vae_sd: dict, **kw):
        from motion324_tpu.utils.sd_convert import convert_sd_vae
        self = cls(params={}, **kw)
        self.params = {
            "transformer": convert_hunyuan_dit_image(
                transformer_sd, num_layers=self.model.num_layers),
            "vae": convert_sd_vae(vae_sd)}
        return self

    def __call__(self, clip_states, t5_states, *, clip_uncond=None,
                 t5_uncond=None, clip_mask=None, t5_mask=None,
                 num_steps: int = 25, guidance_scale: float = 6.0,
                 enable_pag: bool = False, pag_scale: float = 1.3,
                 seed: int = 0) -> np.ndarray:
        """``enable_pag`` adds perturbed-attention guidance on top of CFG —
        the reference's sampling mode (text2image.py:41-46,76: enable_pag,
        pag_scale=1.3 over blocks 16-19). Costs one extra conditional
        forward per step; at ``pag_scale=0`` the update reduces exactly to
        plain CFG."""
        b = np.asarray(clip_states).shape[0]
        lat = self.image_size // 8
        clip_states = jnp.asarray(clip_states)
        t5_states = jnp.asarray(t5_states)
        clip_u = (jnp.zeros_like(clip_states) if clip_uncond is None
                  else jnp.asarray(clip_uncond))
        t5_u = (jnp.zeros_like(t5_states) if t5_uncond is None
                else jnp.asarray(t5_uncond))
        cm = (jnp.ones(clip_states.shape[:2], jnp.int32) if clip_mask is None
              else jnp.asarray(clip_mask))
        tm = (jnp.ones(t5_states.shape[:2], jnp.int32) if t5_mask is None
              else jnp.asarray(t5_mask))

        x = jax.random.normal(jax.random.PRNGKey(seed), (b, lat, lat, 4))
        ts = np.linspace(self._num_train - 1, 0, num_steps).round(
        ).astype(np.int64)
        for i, t in enumerate(ts):
            a_t = self._alphas[int(t)]
            a_prev = (self._alphas[int(ts[i + 1])] if i + 1 < len(ts)
                      else jnp.float32(1.0))
            if enable_pag:
                x = self._step_pag(self.params["transformer"], x, float(t),
                                   a_t, a_prev, clip_states, clip_u,
                                   t5_states, t5_u, cm, tm,
                                   float(guidance_scale), float(pag_scale))
            else:
                x = self._step(self.params["transformer"], x, float(t), a_t,
                               a_prev, clip_states, clip_u, t5_states, t5_u,
                               cm, tm, float(guidance_scale))
        img = self._decode(self.params["vae"], x)
        return np.clip((np.asarray(img) + 1) / 2, 0, 1)
