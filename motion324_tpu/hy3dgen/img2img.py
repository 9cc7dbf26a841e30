"""Depth-ControlNet img2img with IP-Adapter image prompting.

TPU-native counterpart of the reference's texture-alignment extras
(reference: scripts/hy3dgen/texgen/utils/alignImg4Tex_utils.py:21-66
``Img2img_Control_Ip_adapter`` — SD + depth ControlNet + IP-Adapter-plus —
and :74-124 ``HesModel``, the SDXL variant of the same construction; both are
diffusers wrappers). Here the pieces are native flax modules sharing the SD
blocks in :mod:`motion324_tpu.hy3dgen.sd_unet`:

- :class:`ControlNet`: a copy of the UNet's down+mid path with a stride-8
  hint encoder and zero-initialised 1x1 output convs, producing one residual
  per UNet skip plus a mid residual (the diffusers ControlNetModel contract,
  so released depth-ControlNet weights map onto it);
- :class:`Resampler`: the IP-Adapter-plus Perceiver resampler — learned
  latent queries cross-attend to CLIP image patch tokens over ``depth``
  layers and project to the UNet's cross-attention width;
- decoupled image-prompt cross-attention lives inside the UNet
  (``ip_tokens`` / ``ip_scale`` on :class:`UNet2p5D`, default scale 0.7 as
  the reference sets via ``set_ip_adapter_scale``);
- :class:`Img2ImgControlPipeline`: Euler-Ancestral sampling (the reference
  swaps in ``EulerAncestralDiscreteScheduler``) with CFG, ControlNet
  conditioning scale, and optional init-image ``strength`` (the SDXL variant's
  img2img mode). SDXL-scale dims are reached through the same classes via
  ``block_channels`` / ``context_dim`` — one pipeline covers both reference
  wrappers.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from motion324_tpu.hy3dgen.paint_diffusion import sd_sigmas
from motion324_tpu.hy3dgen.sd_unet import (UNet2p5D, _gn, _ResnetBlock,
                                           _Transformer2D)
from motion324_tpu.hy3dgen.sd_vae import SCALING_FACTOR, AutoencoderKL
from motion324_tpu.ops.attention import multi_head_attention

__all__ = ["ControlNet", "Resampler", "Img2ImgControlPipeline"]

Dtype = Any
_zero = nn.initializers.zeros


class _HintEncoder(nn.Module):
    """Full-res conditioning image -> latent-res feature map (stride 8).

    Mirrors diffusers' ``ControlNetConditioningEmbedding``: 16/32/96/256
    channels, where each resolution step keeps channels on the stride-1 conv
    (``blocks.2i``: ch_in -> ch_in) and changes them on the stride-2 conv
    (``blocks.2i+1``: ch_in -> ch_out), so released depth-ControlNet weights
    map kernel-shape-exactly. Zero-initialised final projection so the
    ControlNet is a no-op at init.
    """

    out_ch: int
    channels: tuple = (16, 32, 96, 256)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hint):
        h = nn.silu(nn.Conv(self.channels[0], (3, 3), padding=1,
                            dtype=self.dtype, name="conv_in")(hint))
        for i, ch in enumerate(self.channels[1:]):
            h = nn.silu(nn.Conv(self.channels[i], (3, 3), padding=1,
                                dtype=self.dtype, name=f"block_{i}_a")(h))
            h = nn.silu(nn.Conv(ch, (3, 3), strides=2, padding=1,
                                dtype=self.dtype, name=f"block_{i}_b")(h))
        return nn.Conv(self.out_ch, (3, 3), padding=1, kernel_init=_zero,
                       bias_init=_zero, dtype=self.dtype, name="conv_out")(h)


class ControlNet(nn.Module):
    """UNet down+mid clone emitting zero-conv residuals per skip + mid.

    Returns ``(down_residuals, mid_residual)`` shaped exactly like the skip
    list of a :class:`UNet2p5D` with the same ``block_channels`` /
    ``layers_per_block``, ready for its ``control_residuals`` argument.
    """

    in_channels: int = 4
    block_channels: tuple = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    context_dim: int = 768
    head_dim: int = 64
    tf_depth: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t, context, hint, conditioning_scale=1.0):
        ch0 = self.block_channels[0]
        temb_dim = ch0 * 4
        half = ch0 // 2
        freqs = jnp.exp(-jnp.log(10000.0) * jnp.arange(half) / half)
        ang = t.astype(jnp.float32)[:, None] * freqs[None]
        temb = jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)
        temb = nn.Dense(temb_dim, dtype=self.dtype, name="time_fc1")(temb)
        temb = nn.Dense(temb_dim, dtype=self.dtype, name="time_fc2")(
            nn.silu(temb))

        def tf(ch, name, h):
            return _Transformer2D(ch, ch // self.head_dim, self.context_dim,
                                  self.tf_depth, self.dtype, name=name)(
                h, context, n_views=1, mode="", ref_bank=None,
                ref_scale=0.0, mva_scale=0.0)

        h = nn.Conv(ch0, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(x)
        h = h + _HintEncoder(ch0, dtype=self.dtype, name="hint_encoder")(hint)
        skips = [h]
        for bi, ch in enumerate(self.block_channels):
            attn = bi < len(self.block_channels) - 1
            for li in range(self.layers_per_block):
                h = _ResnetBlock(ch, self.dtype,
                                 name=f"down_{bi}_res_{li}")(h, temb)
                if attn:
                    h = tf(ch, f"down_{bi}_tf_{li}", h)
                skips.append(h)
            if bi < len(self.block_channels) - 1:
                h = nn.Conv(ch, (3, 3), strides=2, padding=1,
                            dtype=self.dtype, name=f"down_{bi}_downsample")(h)
                skips.append(h)

        ch = self.block_channels[-1]
        h = _ResnetBlock(ch, self.dtype, name="mid_res_0")(h, temb)
        h = tf(ch, "mid_tf", h)
        h = _ResnetBlock(ch, self.dtype, name="mid_res_1")(h, temb)

        down = [conditioning_scale *
                nn.Conv(s.shape[-1], (1, 1), kernel_init=_zero,
                        bias_init=_zero, dtype=self.dtype,
                        name=f"zero_conv_{i}")(s).astype(jnp.float32)
                for i, s in enumerate(skips)]
        mid = conditioning_scale * nn.Conv(
            ch, (1, 1), kernel_init=_zero, bias_init=_zero, dtype=self.dtype,
            name="zero_conv_mid")(h).astype(jnp.float32)
        return down, mid


class Resampler(nn.Module):
    """IP-Adapter-plus Perceiver resampler: image patch tokens -> N prompt
    tokens at the UNet cross-attention width."""

    dim: int = 768
    depth: int = 4
    heads: int = 12
    num_queries: int = 16
    output_dim: int = 768
    ff_mult: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image_features):
        b = image_features.shape[0]
        hd = self.dim // self.heads
        x = nn.Dense(self.dim, dtype=self.dtype, name="proj_in")(
            image_features)
        lat = self.param("latents", nn.initializers.normal(1.0 / self.dim),
                         (self.num_queries, self.dim))
        latents = jnp.broadcast_to(lat, (b, self.num_queries, self.dim))
        for i in range(self.depth):
            q_in = nn.LayerNorm(name=f"ln_q_{i}")(latents)
            kv_in = nn.LayerNorm(name=f"ln_kv_{i}")(x)
            # perceiver attention: queries from latents, keys/values from the
            # image tokens concatenated with the latents themselves
            kv = jnp.concatenate([kv_in, q_in], axis=1)
            q = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                         name=f"to_q_{i}")(q_in)
            k = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                         name=f"to_k_{i}")(kv)
            v = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                         name=f"to_v_{i}")(kv)
            o = multi_head_attention(
                q.reshape(b, self.num_queries, self.heads, hd),
                k.reshape(b, kv.shape[1], self.heads, hd),
                v.reshape(b, kv.shape[1], self.heads, hd))
            o = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                         name=f"to_out_{i}")(
                o.reshape(b, self.num_queries, self.dim))
            latents = latents + o
            hf = nn.LayerNorm(name=f"ln_ff_{i}")(latents)
            hf = nn.Dense(self.dim * self.ff_mult, use_bias=False,
                          dtype=self.dtype, name=f"ff_in_{i}")(hf)
            hf = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                          name=f"ff_out_{i}")(nn.gelu(hf))
            latents = latents + hf
        out = nn.Dense(self.output_dim, dtype=self.dtype,
                       name="proj_out")(latents)
        return nn.LayerNorm(name="norm_out")(out).astype(jnp.float32)


class Img2ImgControlPipeline:
    """control image (+ optional init image, image prompt) -> image.

    Covers both reference wrappers: ``strength=1`` reproduces
    ``Img2img_Control_Ip_adapter`` (pure generation guided by depth control +
    image prompt); ``init_image`` with ``strength<1`` reproduces ``HesModel``'s
    img2img refinement. Prompts arrive as embedding arrays — plug
    :class:`~motion324_tpu.hy3dgen.text2image.CLIPTextTower` for text.
    """

    def __init__(self, params: dict, *, unet: UNet2p5D | None = None,
                 controlnet: ControlNet | None = None,
                 vae: AutoencoderKL | None = None,
                 resampler: Resampler | None = None,
                 context_dim: int = 768, text_len: int = 77,
                 dtype: Any = jnp.bfloat16):
        self.unet = unet or UNet2p5D(in_channels=4, context_dim=context_dim,
                                     dtype=dtype)
        self.controlnet = controlnet or ControlNet(
            block_channels=self.unet.block_channels,
            layers_per_block=self.unet.layers_per_block,
            context_dim=context_dim, head_dim=self.unet.head_dim, dtype=dtype)
        self.vae = vae or AutoencoderKL(dtype=dtype)
        self.resampler = resampler or Resampler(output_dim=context_dim,
                                                dtype=dtype)
        self.params = params
        self.context_dim = context_dim
        self.text_len = text_len

        @jax.jit
        def _encode(vae_params, images):
            mean, _ = self.vae.apply(vae_params, images,
                                     method=AutoencoderKL.encode)
            return mean * SCALING_FACTOR

        @jax.jit
        def _decode(vae_params, latents):
            return self.vae.apply(vae_params, latents / SCALING_FACTOR,
                                  method=AutoencoderKL.decode)

        @jax.jit
        def _resample(res_params, feats):
            return self.resampler.apply(res_params, feats)

        @jax.jit
        def _step(unet_params, cn_params, x, hint, ctx_c, ctx_u, ip_c, ip_u,
                  t, sigma, sigma_next, noise, guidance, cn_scale, ip_scale):
            b = x.shape[0]
            scale_in = 1.0 / jnp.sqrt(sigma ** 2 + 1.0)
            x_in = x * scale_in
            tt = jnp.full((b,), t, jnp.float32)

            def branch(ctx, ip):
                res = self.controlnet.apply(cn_params, x_in, tt, ctx, hint,
                                            conditioning_scale=cn_scale)
                return self.unet.apply(unet_params, x_in, tt, ctx,
                                       control_residuals=res, ip_tokens=ip,
                                       ip_scale=ip_scale)

            eps_u = branch(ctx_u, ip_u)
            eps_c = branch(ctx_c, ip_c)
            eps = eps_u + guidance * (eps_c - eps_u)
            # Euler-Ancestral update (shared math with paint_diffusion)
            x0 = x - sigma * eps
            s_to2, s_from2 = sigma_next ** 2, sigma ** 2
            sigma_up = jnp.sqrt(jnp.maximum(
                s_to2 * (s_from2 - s_to2) / jnp.maximum(s_from2, 1e-12), 0.0))
            sigma_down = jnp.sqrt(jnp.maximum(s_to2 - sigma_up ** 2, 0.0))
            d = (x - x0) / jnp.maximum(sigma, 1e-12)
            return x0 + d * sigma_down + noise * sigma_up

        self._encode = _encode
        self._decode = _decode
        self._resample = _resample
        self._step = _step

    @classmethod
    def from_diffusers(cls, unet_state_dict: dict, controlnet_state_dict: dict,
                       vae_state_dict: dict, resampler_params: dict,
                       text_cond, text_uncond, **kw):
        """Build from released weights: diffusers SD UNet + depth ControlNet
        + AutoencoderKL (``motion324_tpu.utils.sd_convert``); the IP-Adapter
        resampler params arrive as a flax tree (its torch layout varies by
        release — map it when a concrete checkpoint is in hand)."""
        from motion324_tpu.utils.sd_convert import (convert_controlnet,
                                                    convert_sd_unet,
                                                    convert_sd_vae)
        self = cls(params={}, **kw)
        self.params = {"unet": convert_sd_unet(unet_state_dict),
                       "controlnet": convert_controlnet(controlnet_state_dict),
                       "vae": convert_sd_vae(vae_state_dict),
                       "resampler": resampler_params,
                       "text_cond": np.asarray(text_cond, np.float32),
                       "text_uncond": np.asarray(text_uncond, np.float32)}
        return self

    @classmethod
    def init_random(cls, key=None, *, image_size: int = 64,
                    ip_feature_dim: int = 64, **kwargs):
        key = jax.random.PRNGKey(0) if key is None else key
        self = cls(params={}, **kwargs)
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        lat = image_size // 8
        x = jnp.zeros((1, lat, lat, 4))
        ctx = jnp.zeros((1, self.text_len, self.context_dim))
        hint = jnp.zeros((1, image_size, image_size, 3))
        ip = jnp.zeros((1, self.resampler.num_queries, self.context_dim))
        cn_params = jax.jit(
            lambda k: self.controlnet.init(k, x, jnp.zeros((1,)), ctx,
                                           hint))(k2)
        res, mid = self.controlnet.apply(cn_params, x, jnp.zeros((1,)), ctx,
                                         hint)
        unet_params = jax.jit(
            lambda k: self.unet.init(k, x, jnp.zeros((1,)), ctx,
                                     control_residuals=(res, mid),
                                     ip_tokens=ip))(k1)
        vae_params = jax.jit(
            lambda k: self.vae.init(
                k, jnp.zeros((1, image_size, image_size, 3))))(k3)
        res_params = jax.jit(
            lambda k: self.resampler.init(
                k, jnp.zeros((1, 16, ip_feature_dim))))(k4)
        self.params = {
            "unet": unet_params, "controlnet": cn_params,
            "vae": vae_params, "resampler": res_params,
            "text_cond": jax.random.normal(
                k5, (1, self.text_len, self.context_dim)) * 0.02,
            "text_uncond": jnp.zeros((1, self.text_len, self.context_dim)),
        }
        return self

    def __call__(self, control_image: np.ndarray, *,
                 init_image: np.ndarray | None = None,
                 image_features: np.ndarray | None = None,
                 prompt_embeds: np.ndarray | None = None,
                 negative_embeds: np.ndarray | None = None,
                 strength: float = 1.0, num_steps: int = 20,
                 guidance_scale: float = 8.0,
                 controlnet_conditioning_scale: float = 1.0,
                 ip_scale: float = 0.7, seed: int = 42) -> np.ndarray:
        """(H, W, 3) control map in [0,1] -> (H, W, 3) image in [0,1].

        Defaults mirror the reference: 20 steps / guidance 8 / seed 42 /
        ip-adapter scale 0.7 (alignImg4Tex_utils.py:30,43-47); strength<1 with
        an ``init_image`` is the HesModel img2img mode (:108).
        """
        h, w = control_image.shape[:2]
        hint = jnp.asarray(control_image, jnp.float32)[None]
        ctx_c = jnp.asarray(prompt_embeds if prompt_embeds is not None
                            else self.params["text_cond"])
        ctx_u = jnp.asarray(negative_embeds if negative_embeds is not None
                            else self.params["text_uncond"])
        nq = self.resampler.num_queries
        if image_features is not None:
            ip_c = self._resample(self.params["resampler"],
                                  jnp.asarray(image_features))
            ip_u = self._resample(self.params["resampler"],
                                  jnp.zeros_like(jnp.asarray(image_features)))
        else:
            ip_c = ip_u = jnp.zeros((1, nq, self.context_dim))

        timesteps, sigmas = sd_sigmas(num_steps)
        key = jax.random.PRNGKey(seed)
        key, k0 = jax.random.split(key)
        lat_shape = (1, h // 8, w // 8, 4)

        start = 0
        if init_image is not None and strength < 1.0:
            start = min(int(num_steps * (1.0 - strength)), num_steps - 1)
            init_lat = self._encode(
                self.params["vae"], jnp.asarray(init_image)[None] * 2 - 1)
            x = init_lat + jax.random.normal(k0, lat_shape) * sigmas[start]
        else:
            x = jax.random.normal(k0, lat_shape) * sigmas[0]

        for i in range(start, num_steps):
            key, kn = jax.random.split(key)
            noise = jax.random.normal(kn, lat_shape)
            x = self._step(self.params["unet"], self.params["controlnet"],
                           x, hint, ctx_c, ctx_u, ip_c, ip_u,
                           float(timesteps[i]), float(sigmas[i]),
                           float(sigmas[i + 1]), noise,
                           float(guidance_scale),
                           float(controlnet_conditioning_scale),
                           float(ip_scale))
        img = self._decode(self.params["vae"], x)
        return np.clip((np.asarray(img)[0] + 1) / 2, 0, 1)
