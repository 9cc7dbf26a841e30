"""Delight (shadow/highlight removal) for reference images.

Capability slot for the reference's InstructPix2Pix-based
``Light_Shadow_Remover`` (reference:
scripts/hy3dgen/texgen/utils/dehighlight_utils.py:22-110). Two parts:

- a pluggable diffusion editor: :class:`DelightDiffusion` hosts released
  InstructPix2Pix checkpoints via :meth:`DelightDiffusion.from_diffusers`
  (``motion324_tpu.utils.sd_convert`` maps the diffusers layout);
- the per-channel color recorrection the reference ALWAYS applies afterwards
  (dehighlight_utils.py:38-66): re-match the edited image's per-channel
  mean/std to the original's over the foreground.

Without diffusion weights, :func:`delight_image` applies a deterministic
de-shading approximation (divide out low-frequency luminance) followed by the
same recorrection, so downstream texture generation sees flattened lighting.
"""

from __future__ import annotations

import numpy as np

__all__ = ["color_recorrection", "delight_image", "DelightDiffusion"]


def color_recorrection(edited: np.ndarray, original: np.ndarray,
                       mask: np.ndarray | None = None) -> np.ndarray:
    """Per-channel mean/std re-match of ``edited`` against ``original``
    (reference dehighlight_utils.py:38-66)."""
    edited = np.asarray(edited, np.float32)
    original = np.asarray(original, np.float32)
    sel = (slice(None),) if mask is None else (mask > 0.5,)
    out = edited.copy()
    for c in range(3):
        e = edited[..., c][sel] if mask is not None else edited[..., c]
        o = original[..., c][sel] if mask is not None else original[..., c]
        es, os_ = float(e.std()) + 1e-6, float(o.std()) + 1e-6
        out[..., c] = (edited[..., c] - float(e.mean())) / es * os_ \
            + float(o.mean())
    return np.clip(out, 0.0, 1.0)


def delight_image(image: np.ndarray, mask: np.ndarray | None = None,
                  editor=None, blur_sigma: float = 12.0) -> np.ndarray:
    """Remove baked-in lighting from an image.

    ``editor``: optional callable (image -> image) — the diffusion-based
    delighter. Fallback: divide out the gaussian-smoothed luminance field
    (flattens soft shading/shadows), then recorrect colors.
    """
    from scipy.ndimage import gaussian_filter
    image = np.asarray(image, np.float32)
    if editor is not None:
        edited = editor(image)
    else:
        lum = image @ np.array([0.299, 0.587, 0.114], np.float32)
        smooth = gaussian_filter(lum, blur_sigma)
        gain = np.clip(smooth.mean() / np.maximum(smooth, 1e-3), 0.5, 2.0)
        edited = np.clip(image * gain[..., None], 0.0, 1.0)
    return color_recorrection(edited, image, mask)


class DelightDiffusion:
    """InstructPix2Pix-class diffusion delighter (the reference's
    ``Light_Shadow_Remover`` backbone, dehighlight_utils.py:22-110).

    Reuses the framework's SD UNet at an 8-channel ``conv_in`` (4 noisy
    latent + 4 image-condition latent channels — the IP2P layout) with
    3-way classifier-free guidance over (text+image, image-only,
    unconditional) and Euler-Ancestral sampling; the conditioning "prompt"
    is a learned embedding like HunyuanPaint's. Matches the
    :func:`delight_image` ``editor`` interface, and the per-channel color
    recorrection is still applied by the caller.
    """

    def __init__(self, params: dict, *, image_size: int = 512,
                 text_len: int = 77, context_dim: int = 1024, dtype=None,
                 unet=None, vae=None):
        import jax
        import jax.numpy as jnp
        from motion324_tpu.hy3dgen.sd_unet import UNet2p5D
        from motion324_tpu.hy3dgen.sd_vae import SCALING_FACTOR, AutoencoderKL

        dtype = dtype or jnp.bfloat16
        self.image_size = image_size
        self.unet = unet or UNet2p5D(in_channels=8, dtype=dtype,
                                     context_dim=context_dim)
        self.vae = vae or AutoencoderKL(dtype=dtype)
        self.params = params
        self.text_len = text_len
        self.context_dim = context_dim

        @jax.jit
        def _encode(vae_params, img):
            mean, _ = self.vae.apply(vae_params, img,
                                     method=AutoencoderKL.encode)
            return mean * SCALING_FACTOR

        @jax.jit
        def _decode(vae_params, z):
            return self.vae.apply(vae_params, z / SCALING_FACTOR,
                                  method=AutoencoderKL.decode)

        @jax.jit
        def _step(unet_params, noisy, img_lat, text, t, sigma, sigma_next,
                  noise, guidance_txt, guidance_img):
            scale_in = 1.0 / jnp.sqrt(sigma ** 2 + 1.0)
            # IP2P 3-way CFG: (text+image, image-only, unconditional)
            x3 = jnp.concatenate([noisy, noisy, noisy], 0) * scale_in
            cond3 = jnp.concatenate(
                [img_lat, img_lat, jnp.zeros_like(img_lat)], 0)
            ctx3 = jnp.concatenate([text, jnp.zeros_like(text),
                                    jnp.zeros_like(text)], 0)
            x_in = jnp.concatenate([x3, cond3], axis=-1)
            tt = jnp.full((3,), t, jnp.float32)
            eps = self.unet.apply(unet_params, x_in, tt, ctx3, None, 1, "")
            e_ti, e_i, e_u = jnp.split(eps, 3, axis=0)
            e = e_u + guidance_img * (e_i - e_u) + guidance_txt * (e_ti - e_i)
            x0 = noisy - sigma * e
            s2, sn2 = sigma ** 2, sigma_next ** 2
            up = jnp.sqrt(jnp.maximum(sn2 * (s2 - sn2) /
                                      jnp.maximum(s2, 1e-12), 0.0))
            down = jnp.sqrt(jnp.maximum(sn2 - up ** 2, 0.0))
            d = (noisy - x0) / jnp.maximum(sigma, 1e-12)
            return x0 + d * down + noise * up

        self._encode = _encode
        self._decode = _decode
        self._step = _step

    @classmethod
    def from_diffusers(cls, unet_state_dict: dict, vae_state_dict: dict,
                       text_embed, *, context_dim: int = 768, **kw):
        """Build from released InstructPix2Pix weights (a diffusers SD1.5
        UNet with an 8-channel ``conv_in`` + its AutoencoderKL — the exact
        modules ``dehighlight_utils.py:26-33`` loads). ``text_embed`` is the
        pre-computed prompt embedding (B=1, L, context_dim)."""
        from motion324_tpu.utils.sd_convert import (convert_sd_unet,
                                                    convert_sd_vae)
        self = cls({}, context_dim=context_dim, **kw)
        self.params = {"unet": convert_sd_unet(unet_state_dict),
                       "vae": convert_sd_vae(vae_state_dict),
                       "text": np.asarray(text_embed, np.float32)}
        return self

    @classmethod
    def init_random(cls, key=None, *, image_size: int = 64, **kw):
        import jax
        import jax.numpy as jnp
        key = jax.random.PRNGKey(0) if key is None else key
        k1, k2, k3 = jax.random.split(key, 3)
        self = cls({}, image_size=image_size, context_dim=64, **kw)
        self.unet = type(self.unet)(in_channels=8, context_dim=64,
                                    block_channels=(32, 64),
                                    layers_per_block=1, head_dim=8,
                                    dtype=jnp.float32)
        lat = image_size // 8
        unet_params = jax.jit(lambda k: self.unet.init(
            k, jnp.zeros((1, lat, lat, 8)), jnp.zeros((1,)),
            jnp.zeros((1, self.text_len, 64)), None, 1, ""))(k1)
        vae_params = jax.jit(lambda k: self.vae.init(
            k, jnp.zeros((1, image_size, image_size, 3))))(k2)
        self.params = {"unet": unet_params, "vae": vae_params,
                       "text": jax.random.normal(
                           k3, (1, self.text_len, 64)) * 0.02}
        return self

    def __call__(self, image, *, num_steps: int = 20,
                 guidance_txt: float = 1.5, guidance_img: float = 1.0,
                 seed: int = 0):
        import cv2
        import jax
        import jax.numpy as jnp
        from motion324_tpu.hy3dgen.paint_diffusion import sd_sigmas

        h0, w0 = np.asarray(image).shape[:2]
        img = cv2.resize(np.asarray(image, np.float32),
                         (self.image_size, self.image_size),
                         interpolation=cv2.INTER_AREA)
        img_lat = self._encode(self.params["vae"], jnp.asarray(img)[None] * 2 - 1)
        text = jnp.asarray(self.params["text"])

        timesteps, sigmas = sd_sigmas(num_steps)
        key = jax.random.PRNGKey(seed)
        key, k0 = jax.random.split(key)
        x = jax.random.normal(k0, img_lat.shape) * sigmas[0]
        for i in range(num_steps):
            key, kn = jax.random.split(key)
            noise = jax.random.normal(kn, x.shape)
            x = self._step(self.params["unet"], x, img_lat, text,
                           float(timesteps[i]), float(sigmas[i]),
                           float(sigmas[i + 1]), noise,
                           float(guidance_txt), float(guidance_img))
        out = np.clip((np.asarray(self._decode(self.params["vae"], x))[0]
                       + 1) / 2, 0, 1)
        if (h0, w0) != out.shape[:2]:
            out = cv2.resize(out, (w0, h0), interpolation=cv2.INTER_CUBIC)
        return out
