"""Latent 4x super-resolution for generated texture views.

TPU-native counterpart of the reference's ``Image_Super_Net``
(reference: scripts/hy3dgen/texgen/utils/imagesuper_utils.py:18-35, a
diffusers ``StableDiffusionUpscalePipeline`` wrapper around the SD x4
latent upscaler; wired — shipped commented-out — at
texgen/pipelines.py:103,222). Same construction, built from this repo's own
blocks:

- the denoiser is :class:`~motion324_tpu.hy3dgen.sd_unet.UNet2p5D` with a
  7-channel ``conv_in`` (4 noisy latent + 3 low-res RGB, concatenated at
  latent resolution) and the camera-embedding table repurposed as the
  upscaler's noise-level class embedding (1000 entries);
- the VAE is :class:`~motion324_tpu.hy3dgen.sd_vae.AutoencoderKL` with three
  resolution stages, so latents sit at 1/4 spatial scale and decoding is the
  4x upscale;
- the low-res conditioning image is noise-augmented at ``noise_level`` steps
  of the DDPM forward process and the level is fed to the class embedding;
- DDIM sampling (eta=0) over linear betas, epsilon- or v-prediction
  (``prediction_type``), classifier-free guidance over a learned/empty text
  context.

Without weights the pipeline degrades to :func:`upscale_x4` — Lanczos
resampling plus a mild unsharp mask — so callers always get a 4x image.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from motion324_tpu.hy3dgen.sd_unet import UNet2p5D
from motion324_tpu.hy3dgen.sd_vae import AutoencoderKL
from motion324_tpu.utils.logging import log

__all__ = ["Upscaler", "upscale_x4", "ddpm_alphas_cumprod"]

SR_SCALING_FACTOR = 0.08333  # x4-upscaler VAE latent scaling


def ddpm_alphas_cumprod(num_train: int = 1000, beta_start: float = 1e-4,
                        beta_end: float = 2e-2) -> np.ndarray:
    """Cumulative alpha products of the linear-beta DDPM forward process."""
    betas = np.linspace(beta_start, beta_end, num_train, dtype=np.float64)
    return np.cumprod(1.0 - betas)


def upscale_x4(image: np.ndarray, sharpen: float = 0.3) -> np.ndarray:
    """Weight-free 4x upscale: Lanczos + unsharp mask. (H,W,3) in [0,1]."""
    import cv2
    h, w = image.shape[:2]
    up = cv2.resize(image.astype(np.float32), (w * 4, h * 4),
                    interpolation=cv2.INTER_LANCZOS4)
    if sharpen > 0:
        blur = cv2.GaussianBlur(up, (0, 0), 1.5)
        up = up + sharpen * (up - blur)
    return np.clip(up, 0.0, 1.0)


class Upscaler:
    """Low-res image -> 4x image via latent diffusion conditioned on it.

    ``params`` is ``{"unet", "vae", "text_cond", "text_uncond"}``; pass
    ``None`` to get the weight-free Lanczos fallback behaviour from
    :meth:`__call__` (logged once).
    """

    def __init__(self, params: dict | None, *,
                 unet: UNet2p5D | None = None,
                 vae: AutoencoderKL | None = None,
                 context_dim: int = 1024, text_len: int = 77,
                 prediction_type: str = "v", dtype: Any = jnp.bfloat16):
        # x4-upscaler dims: 7-ch conv_in, (256,512,512,1024) blocks, 1024-d
        # text context, 1000 noise-level class embeds
        self.unet = unet or UNet2p5D(
            in_channels=7, out_channels=4,
            block_channels=(256, 512, 512, 1024), context_dim=context_dim,
            num_camera_embeds=1000, dtype=dtype)
        # three stages -> two downsamples -> latents at 1/4 resolution
        self.vae = vae or AutoencoderKL(block_channels=(128, 256, 512),
                                        dtype=dtype)
        self.params = params
        self.text_len = text_len
        self.context_dim = context_dim
        if prediction_type not in ("epsilon", "v"):
            raise ValueError(f"prediction_type {prediction_type!r}")
        self.prediction_type = prediction_type
        self._alphas = jnp.asarray(ddpm_alphas_cumprod(), jnp.float32)

        @jax.jit
        def _decode(vae_params, latents):
            return self.vae.apply(vae_params, latents / SR_SCALING_FACTOR,
                                  method=AutoencoderKL.decode)

        @jax.jit
        def _step(unet_params, x, low_res, text_cond, text_uncond,
                  noise_level, t, a_t, a_prev, guidance):
            b = x.shape[0]
            x_in = jnp.concatenate([x, low_res], axis=-1)
            tt = jnp.full((b,), t, jnp.float32)
            nl = jnp.full((b,), noise_level, jnp.int32)
            m_c = self.unet.apply(unet_params, x_in, tt,
                                  jnp.repeat(text_cond, b, 0), nl)
            m_u = self.unet.apply(unet_params, x_in, tt,
                                  jnp.repeat(text_uncond, b, 0), nl)
            m = m_u + guidance * (m_c - m_u)
            sq_a, sq_1ma = jnp.sqrt(a_t), jnp.sqrt(1.0 - a_t)
            if self.prediction_type == "epsilon":
                x0 = (x - sq_1ma * m) / sq_a
                eps = m
            else:  # v-prediction: v = sqrt(a)*eps - sqrt(1-a)*x0
                x0 = sq_a * x - sq_1ma * m
                eps = sq_a * m + sq_1ma * x
            # DDIM (eta = 0)
            return jnp.sqrt(a_prev) * x0 + jnp.sqrt(1.0 - a_prev) * eps

        self._decode = _decode
        self._step = _step

    @classmethod
    def from_diffusers(cls, unet_state_dict: dict, vae_state_dict: dict,
                       text_cond, text_uncond, **kw):
        """Build from released x4-upscaler weights: the diffusers UNet
        (``class_embedding`` = the noise-level table) and its 3-stage
        AutoencoderKL; ``text_cond``/``text_uncond`` are pre-computed prompt
        embeddings (the reference always calls with an empty prompt)."""
        from motion324_tpu.utils.sd_convert import (convert_sd_unet,
                                                    convert_sd_vae)
        self = cls(params=None, **kw)
        self.params = {"unet": convert_sd_unet(unet_state_dict),
                       "vae": convert_sd_vae(vae_state_dict),
                       "text_cond": np.asarray(text_cond, np.float32),
                       "text_uncond": np.asarray(text_uncond, np.float32)}
        return self

    @classmethod
    def init_random(cls, key=None, *, image_size: int = 32, **kwargs):
        """Random-weight instance at full or reduced dims (for tests)."""
        key = jax.random.PRNGKey(0) if key is None else key
        self = cls(params=None, **kwargs)
        k1, k2, k3 = jax.random.split(key, 3)
        lat = image_size  # latents share the low-res input's resolution
        x = jnp.zeros((1, lat, lat, 7))
        ctx = jnp.zeros((1, self.text_len, self.context_dim))
        unet_params = jax.jit(
            lambda k: self.unet.init(k, x, jnp.zeros((1,)), ctx,
                                     jnp.zeros((1,), jnp.int32)))(k1)
        vae_params = jax.jit(
            lambda k: self.vae.init(
                k, jnp.zeros((1, 4 * image_size, 4 * image_size, 3))))(k2)
        self.params = {
            "unet": unet_params, "vae": vae_params,
            "text_cond": jax.random.normal(
                k3, (1, self.text_len, self.context_dim)) * 0.02,
            "text_uncond": jnp.zeros((1, self.text_len, self.context_dim)),
        }
        return self

    def __call__(self, image: np.ndarray, *, num_steps: int = 5,
                 guidance_scale: float = 9.0, noise_level: int = 20,
                 seed: int = 0) -> np.ndarray:
        """(H, W, 3) in [0,1] -> (4H, 4W, 3) in [0,1].

        Defaults mirror the reference call: 5 inference steps
        (imagesuper_utils.py:31), empty prompt, the diffusers pipeline's
        guidance 9.0 and noise level 20.
        """
        if self.params is None:
            if not getattr(self, "_warned_fallback", False):
                self._warned_fallback = True
                log("Upscaler: no diffusion weights — Lanczos x4 fallback")
            return upscale_x4(np.asarray(image, np.float32))

        h, w = image.shape[:2]
        low = jnp.asarray(image, jnp.float32)[None] * 2.0 - 1.0
        key = jax.random.PRNGKey(seed)
        key, k_aug, k_init = jax.random.split(key, 3)

        # noise-augment the conditioning image at `noise_level`
        a_nl = self._alphas[noise_level]
        low = jnp.sqrt(a_nl) * low + jnp.sqrt(1 - a_nl) * \
            jax.random.normal(k_aug, low.shape)

        x = jax.random.normal(k_init, (1, h, w, 4))
        timesteps = np.linspace(999, 0, num_steps).round().astype(np.int64)
        alphas = np.asarray(self._alphas)
        for i, t in enumerate(timesteps):
            a_t = float(alphas[t])
            a_prev = float(alphas[timesteps[i + 1]]) \
                if i + 1 < num_steps else 1.0
            x = self._step(self.params["unet"], x, low,
                           self.params["text_cond"],
                           self.params["text_uncond"],
                           int(noise_level), float(t), a_t, a_prev,
                           float(guidance_scale))
        img = self._decode(self.params["vae"], x)
        return np.clip((np.asarray(img)[0] + 1) / 2, 0, 1)
