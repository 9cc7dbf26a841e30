"""SD-class conditional UNet with 2.5D multiview/reference attention, in flax.

TPU-native re-implementation of the reference's texture-diffusion denoiser
(reference: scripts/hy3dgen/texgen/hunyuanpaint/unet/modules.py:404-599
``UNet2p5DConditionModel`` wrapping a diffusers ``UNet2DConditionModel``):

- standard SD topology: conv_in -> cross-attn down blocks -> mid -> up blocks
  with skip concatenation -> conv_out; GroupNorm(32)/SiLU resnets with
  time-embedding injection; GEGLU feed-forwards; cross-attention to text-CLIP
  context (the reference uses LEARNED text embeddings, modules.py:447-448);
- ``conv_in`` takes 12 channels: noisy latent + normal-map latent +
  position-map latent (modules.py:437-445);
- camera-index class embedding added to the time embedding (modules.py:450-456);
- every transformer block is extended 2.5D-style (modules.py:46-299):
  * REFERENCE attention: in 'w' mode the pre-attention hidden states are
    recorded per layer (flax ``sow``); in 'r' mode an extra attention reads
    that bank, scaled by ``ref_scale``;
  * MULTIVIEW attention: tokens of all views in the batch are concatenated
    and self-attended jointly, scaled by ``mva_scale``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from motion324_tpu.models.transformer import gelu
from motion324_tpu.ops.attention import multi_head_attention

__all__ = ["UNet2p5D"]

Dtype = Any
_GN = 32


def _gn(x, name, groups=_GN, eps=1e-5):
    c = x.shape[-1]
    g = min(groups, c)
    while c % g:  # largest divisor <= groups (full-size configs hit 32 exactly)
        g -= 1
    return nn.GroupNorm(num_groups=g, epsilon=eps, name=name)(x)


class _Attention(nn.Module):
    """diffusers-style attention: separate q/k/v, out projection with bias.

    ``ip_context`` enables IP-Adapter decoupled cross-attention (reference:
    texgen/utils/alignImg4Tex_utils.py:28-30 loads ip-adapter weights into the
    SD attention processors): image-prompt tokens get their own ``to_k_ip`` /
    ``to_v_ip`` projections, share the query, and their attention output is
    added with ``ip_scale`` BEFORE the shared ``to_out`` projection — the
    exact IPAttnProcessor contract, so released ip-adapter weights map 1:1.
    """

    dim: int
    heads: int
    context_dim: int | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, mask=None, ip_context=None,
                 ip_scale=1.0):
        context = x if context is None else context
        b, l, _ = x.shape
        lc = context.shape[1]
        hd = self.dim // self.heads
        q = nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="to_k")(context)
        v = nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="to_v")(context)
        from motion324_tpu.hy3dgen.voxel_attention import ImplicitVoxelMask
        if isinstance(mask, (tuple, ImplicitVoxelMask)):
            # voxel-locality turbo attention with the mask IMPLICIT in
            # per-token cell positions — the Pallas kernel recomputes it per
            # tile, so no (S, S) mask/logits ever materialise (the dense
            # form is 600 MB at product resolution). mask = (positions, r);
            # ImplicitVoxelMask keeps r static across jit boundaries.
            from motion324_tpu.ops.masked_attention import \
                masked_flash_attention
            positions, radius = mask
            out = masked_flash_attention(
                q.reshape(b, l, self.heads, hd).transpose(0, 2, 1, 3),
                k.reshape(b, lc, self.heads, hd).transpose(0, 2, 1, 3),
                v.reshape(b, lc, self.heads, hd).transpose(0, 2, 1, 3),
                positions, radius=float(radius),
                interpret=jax.default_backend() != "tpu")
            out = out.transpose(0, 2, 1, 3)
        elif mask is not None:
            # dense voxel-locality mask (small shapes / tests,
            # reference modules.py:206-237): plain XLA with an additive bias
            qh = q.reshape(b, l, self.heads, hd).transpose(0, 2, 1, 3)
            kh = k.reshape(b, lc, self.heads, hd).transpose(0, 2, 1, 3)
            vh = v.reshape(b, lc, self.heads, hd).transpose(0, 2, 1, 3)
            logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                                preferred_element_type=jnp.float32)
            logits = logits / jnp.sqrt(hd)
            logits = jnp.where(mask[:, None], logits, -1e9)
            w = jax.nn.softmax(logits, axis=-1).astype(vh.dtype)
            out = jnp.einsum("bhqk,bhkd->bhqd", w, vh).transpose(0, 2, 1, 3)
        else:
            out = multi_head_attention(q.reshape(b, l, self.heads, hd),
                                       k.reshape(b, lc, self.heads, hd),
                                       v.reshape(b, lc, self.heads, hd))
        out = out.reshape(b, l, self.dim)
        if ip_context is not None:
            li = ip_context.shape[1]
            k_ip = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                            name="to_k_ip")(ip_context)
            v_ip = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                            name="to_v_ip")(ip_context)
            out_ip = multi_head_attention(q.reshape(b, l, self.heads, hd),
                                          k_ip.reshape(b, li, self.heads, hd),
                                          v_ip.reshape(b, li, self.heads, hd))
            out = out + ip_scale * out_ip.reshape(b, l, self.dim)
        return nn.Dense(self.dim, use_bias=True, dtype=self.dtype,
                        name="to_out")(out)


class _GEGLUFeedForward(nn.Module):
    dim: int
    mult: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inner = self.dim * self.mult
        h = nn.Dense(2 * inner, dtype=self.dtype, name="proj_in")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * gelu(gate)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj_out")(h)


class _Block2p5D(nn.Module):
    """BasicTransformerBlock + reference/multiview attention."""

    dim: int
    heads: int
    context_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, n_views: int, mode: str, ref_bank,
                 ref_scale, mva_scale, mva_masks=None, ip_tokens=None,
                 ip_scale=1.0):
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, name=name)
        h = ln("norm1")(x)

        # 1.1 self attention within each view
        x = x + _Attention(self.dim, self.heads, dtype=self.dtype,
                           name="attn1")(h)

        # 1.2 reference attention (write h to the bank / read an extra pass)
        if "w" in mode:
            b = x.shape[0] // n_views
            self.sow("ref_bank", "kv",
                     h.reshape(b, n_views * h.shape[1], self.dim))
        if "r" in mode:
            b = x.shape[0] // n_views
            # param init traces with mode="wr" and no bank: self-derived bank
            # keeps shapes consistent so attn_refview params get created
            bank = ref_bank if ref_bank is not None else \
                h.reshape(b, n_views * h.shape[1], self.dim)
            bank = jnp.repeat(bank, n_views, axis=0)
            ra = _Attention(self.dim, self.heads, dtype=self.dtype,
                            name="attn_refview")(h, bank)
            x = x + ref_scale * ra

        # 1.3 multiview attention: all views jointly; in turbo mode a
        # voxel-locality mask (keyed by joint token count) restricts it to
        # spatially-near tokens (reference modules.py:302-402)
        if n_views > 1:
            b = x.shape[0] // n_views
            hm = h.reshape(b, n_views * h.shape[1], self.dim)
            mask = None if mva_masks is None else mva_masks.get(hm.shape[1])
            ma = _Attention(self.dim, self.heads, dtype=self.dtype,
                            name="attn_multiview")(hm, mask=mask)
            ma = ma.reshape(b * n_views, h.shape[1], self.dim)
            x = x + mva_scale * ma

        # 2. cross attention to text context (+ optional IP-Adapter image
        # tokens via decoupled k/v projections)
        h = ln("norm2")(x)
        x = x + _Attention(self.dim, self.heads, self.context_dim,
                           dtype=self.dtype, name="attn2")(
            h, context, ip_context=ip_tokens, ip_scale=ip_scale)

        # 3. feed-forward
        h = ln("norm3")(x)
        return x + _GEGLUFeedForward(self.dim, dtype=self.dtype, name="ff")(h)


class _Transformer2D(nn.Module):
    dim: int
    heads: int
    context_dim: int
    depth: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, n_views, mode, ref_bank, ref_scale,
                 mva_scale, mva_masks=None, ip_tokens=None, ip_scale=1.0):
        b, hh, ww, c = x.shape
        res = x
        # diffusers Transformer2DModel uses GroupNorm eps 1e-6 (resnets 1e-5)
        h = _gn(x, "norm", eps=1e-6)
        h = nn.Dense(self.dim, dtype=self.dtype, name="proj_in")(h)
        h = h.reshape(b, hh * ww, self.dim)
        for i in range(self.depth):
            # the bank tree mirrors module structure: {block_i: {kv: (arr,)}}
            bank = None if ref_bank is None else \
                ref_bank[f"block_{i}"]["kv"][0]
            h = _Block2p5D(self.dim, self.heads, self.context_dim,
                           self.dtype, name=f"block_{i}")(
                h, context, n_views, mode, bank, ref_scale, mva_scale,
                mva_masks=mva_masks, ip_tokens=ip_tokens, ip_scale=ip_scale)
        h = nn.Dense(self.dim, dtype=self.dtype, name="proj_out")(
            h.reshape(b, hh, ww, self.dim))
        return h + res


class _ResnetBlock(nn.Module):
    out_ch: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb):
        h = nn.silu(_gn(x, "norm1"))
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        t = nn.Dense(self.out_ch, dtype=self.dtype, name="time_emb_proj")(
            nn.silu(temb))
        h = h + t[:, None, None, :]
        h = nn.silu(_gn(h, "norm2"))
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype,
                        name="shortcut")(x)
        return x + h


class UNet2p5D(nn.Module):
    """(B*N, H, W, 12) latents -> (B*N, H, W, out) noise/velocity prediction.

    Views are folded into the batch (``n_views``); ``mode`` is 'w' (record the
    reference pass), 'r' (read the bank), or '' (plain). ``ref_bank`` is the
    dict returned under the ``ref_bank`` collection from a 'w' pass.

    ``control_residuals`` is an optional ``(down_list, mid)`` pair produced by
    :class:`motion324_tpu.hy3dgen.img2img.ControlNet`: one residual per skip
    connection (added where the skip is consumed) plus one added after the mid
    block — the diffusers ControlNet injection contract
    (reference: texgen/utils/alignImg4Tex_utils.py:21-66).
    ``ip_tokens`` are IP-Adapter image-prompt tokens consumed by every text
    cross-attention via decoupled k/v projections.
    """

    in_channels: int = 12
    out_channels: int = 4
    block_channels: tuple = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    context_dim: int = 1024
    head_dim: int = 64
    tf_depth: int = 1
    num_camera_embeds: int = 49  # 5 ref + 44 gen slots (modules.py:453-455)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t, context, camera_ids=None, n_views: int = 1,
                 mode: str = "", ref_bank=None, ref_scale=1.0,
                 mva_scale=1.0, mva_masks=None, control_residuals=None,
                 ip_tokens=None, ip_scale=1.0):
        ch0 = self.block_channels[0]
        temb_dim = ch0 * 4

        # SD time embedding: sinusoidal (cos|sin flipped), two-layer MLP
        half = ch0 // 2
        freqs = jnp.exp(-jnp.log(10000.0) * jnp.arange(half) / half)
        ang = t.astype(jnp.float32)[:, None] * freqs[None]
        temb = jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)
        temb = nn.Dense(temb_dim, dtype=self.dtype, name="time_fc1")(temb)
        temb = nn.Dense(temb_dim, dtype=self.dtype, name="time_fc2")(
            nn.silu(temb))
        if camera_ids is not None:
            cam = nn.Embed(self.num_camera_embeds, temb_dim,
                           name="camera_embedding")(camera_ids)
            temb = temb + cam.astype(temb.dtype)

        kw = dict(n_views=n_views, mode=mode, ref_scale=ref_scale,
                  mva_scale=mva_scale, mva_masks=mva_masks,
                  ip_tokens=ip_tokens, ip_scale=ip_scale)

        def tf(ch, name, h):
            # read side of the reference bank: the sown tree from the 'w'
            # pass is keyed by module names
            bank = None if ref_bank is None else ref_bank.get(name)
            return _Transformer2D(ch, ch // self.head_dim, self.context_dim,
                                  self.tf_depth, self.dtype, name=name)(
                h, context, ref_bank=bank, **kw)

        h = nn.Conv(ch0, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)
        skips = [h]

        # down path: cross-attn blocks except the last stage
        for bi, ch in enumerate(self.block_channels):
            attn = bi < len(self.block_channels) - 1
            for li in range(self.layers_per_block):
                h = _ResnetBlock(ch, self.dtype,
                                 name=f"down_{bi}_res_{li}")(h, temb)
                if attn:
                    h = tf(ch, f"down_{bi}_tf_{li}", h)
                skips.append(h)
            if bi < len(self.block_channels) - 1:
                h = nn.Conv(ch, (3, 3), strides=2, padding=1, dtype=self.dtype,
                            name=f"down_{bi}_downsample")(h)
                skips.append(h)

        # ControlNet residuals: one per skip, added where produced; the mid
        # residual lands after the mid block (diffusers injection contract)
        if control_residuals is not None:
            down_res, mid_res = control_residuals
            skips = [s + r for s, r in zip(skips, down_res, strict=True)]

        # mid
        ch = self.block_channels[-1]
        h = _ResnetBlock(ch, self.dtype, name="mid_res_0")(h, temb)
        h = tf(ch, "mid_tf", h)
        h = _ResnetBlock(ch, self.dtype, name="mid_res_1")(h, temb)
        if control_residuals is not None:
            h = h + mid_res

        # up path (mirror, one extra resnet per stage, skip concat)
        for bi, ch in reversed(list(enumerate(self.block_channels))):
            attn = bi < len(self.block_channels) - 1
            for li in range(self.layers_per_block + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = _ResnetBlock(ch, self.dtype,
                                 name=f"up_{bi}_res_{li}")(h, temb)
                if attn:
                    h = tf(ch, f"up_{bi}_tf_{li}", h)
            if bi > 0:
                b2, hh, ww, cc = h.shape
                h = jax.image.resize(h, (b2, hh * 2, ww * 2, cc),
                                     method="nearest")
                h = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                            name=f"up_{bi}_upsample")(h)

        h = nn.silu(_gn(h, "norm_out"))
        return nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_out")(h).astype(jnp.float32)
