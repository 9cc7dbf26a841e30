"""Multiview texture diffusion (HunyuanPaint-equivalent) pipeline.

TPU-native counterpart of the reference's SD-based multiview texture
generator (reference: scripts/hy3dgen/texgen/hunyuanpaint/pipeline.py:193-722
and utils/multiview_utils.py:25-87):

- VAE-encode the reference image and per-view normal/position control maps;
- learned text-CLIP embeddings, no text encoder (pipeline.py learned embeds,
  modules.py:447-448);
- per step: a reference 'w' pass records per-layer KV banks, then a CFG pair
  of 'r' passes denoises all views jointly (reference attention at
  ref_scale 1 for cond / 0 for uncond — pipeline.py:338-359), with multiview
  attention tying the views together;
- Euler-Ancestral sampling over the scaled-linear SD sigma schedule
  (multiview_utils.py uses diffusers EulerAncestralDiscreteScheduler);
- VAE-decode the final latents into the six view images.

The whole per-step computation is jitted; the step loop stays in Python so
ancestral noise comes from a threaded PRNG key.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from motion324_tpu.hy3dgen.sd_unet import UNet2p5D
from motion324_tpu.hy3dgen.sd_vae import SCALING_FACTOR, AutoencoderKL

__all__ = ["MultiviewDiffusion", "sd_sigmas", "lcm_schedule",
           "lcm_boundary_scalings"]


def _alphas_cumprod(num_train: int = 1000, beta_start: float = 0.00085,
                    beta_end: float = 0.012) -> np.ndarray:
    betas = np.linspace(beta_start ** 0.5, beta_end ** 0.5, num_train,
                        dtype=np.float64) ** 2
    return np.cumprod(1.0 - betas)


def sd_sigmas(num_steps: int, num_train: int = 1000,
              beta_start: float = 0.00085, beta_end: float = 0.012):
    """Scaled-linear SD noise schedule -> (timesteps, sigmas[num_steps+1])."""
    alphas_cum = _alphas_cumprod(num_train, beta_start, beta_end)
    all_sigmas = np.sqrt((1 - alphas_cum) / alphas_cum)
    idx = np.linspace(num_train - 1, 0, num_steps).round().astype(np.int64)
    sigmas = all_sigmas[idx]
    return idx.astype(np.float32), np.concatenate(
        [sigmas, np.zeros(1)]).astype(np.float32)


def lcm_schedule(num_steps: int, ddim_steps: int = 30,
                 num_train: int = 1000, beta_start: float = 0.00085,
                 beta_end: float = 0.012):
    """Turbo/LCM timestep grid over the DDIM sub-schedule.

    Matches the reference's ``DDIMSolver`` construction + turbo index
    selection (hunyuanpaint/pipeline.py:139-165 and :595-600): the 1000-step
    scaled-linear schedule is subsampled to ``ddim_steps`` DDIM timesteps
    ``round((i+1) * T/ddim_steps) - 1``, and turbo sampling walks that grid
    descending from the top with stride ``ddim_steps // num_steps`` (the
    reference's hardcoded 10-step case is stride 3 from index 29).

    Returns ``(timesteps (num_steps,) int64, alpha_cumprods (num_steps,),
    alpha_cumprods_prev (num_steps,))`` — ``prev`` holds the NEXT (lower)
    selected timestep's alpha-bar, used for the inter-step noise injection;
    the final entry is unused (the last LCM step returns the denoised
    sample directly).
    """
    alphas_cum = _alphas_cumprod(num_train, beta_start, beta_end)
    step_ratio = num_train // ddim_steps
    ddim_t = ((np.arange(1, ddim_steps + 1) * step_ratio).round()
              .astype(np.int64) - 1)
    stride = max(1, ddim_steps // num_steps)
    index = np.arange(ddim_steps - 1, -1, -stride)[:num_steps]
    t = ddim_t[index]
    ac = alphas_cum[t]
    ac_prev = np.concatenate([alphas_cum[t[1:]], np.ones(1)])
    return t, ac.astype(np.float64), ac_prev.astype(np.float64)


def lcm_boundary_scalings(timestep, sigma_data: float = 0.5,
                          timestep_scaling: float = 10.0):
    """LCM consistency boundary scalings ``(c_skip, c_out)``.

    Public ``LCMScheduler.get_scalings_for_boundary_condition_discrete``
    semantics (mirrored at reference hunyuanpaint/pipeline.py:84-90).
    """
    st = timestep_scaling * timestep
    c_skip = sigma_data ** 2 / (st ** 2 + sigma_data ** 2)
    c_out = st / (st ** 2 + sigma_data ** 2) ** 0.5
    return c_skip, c_out


class MultiviewDiffusion:
    """Callable matching the PaintPipeline synthesizer interface."""

    def __init__(self, params: dict, *, unet: UNet2p5D | None = None,
                 vae: AutoencoderKL | None = None, text_len: int = 77,
                 context_dim: int = 1024, dtype: Any = jnp.bfloat16):
        self.unet = unet or UNet2p5D(dtype=dtype, context_dim=context_dim)
        self.vae = vae or AutoencoderKL(dtype=dtype)
        self._dtype = dtype
        self.params = self._commit(params)
        self.text_len = text_len
        self.context_dim = context_dim

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
        def _step(unet_params, noisy, ctrl_lat, ref_lat, text_gen, text_ref,
                  camera_ids, t, sigma, sigma_next, noise, guidance,
                  mva_masks=None):
            n_views = noisy.shape[0]
            scale_in = 1.0 / jnp.sqrt(sigma ** 2 + 1.0)

            # reference 'w' pass records the KV bank
            ref_in = jnp.concatenate(
                [ref_lat, jnp.zeros_like(ref_lat), jnp.zeros_like(ref_lat)],
                axis=-1)
            _, vars_w = self.unet.apply(
                unet_params, ref_in, jnp.zeros((1,)), text_ref,
                jnp.zeros((1,), jnp.int32), 1, "w", mutable=["ref_bank"])
            bank = vars_w["ref_bank"]

            x_in = jnp.concatenate([noisy * scale_in, ctrl_lat], axis=-1)
            tt = jnp.full((n_views,), t, jnp.float32)
            eps_c = self.unet.apply(unet_params, x_in, tt, text_gen,
                                    camera_ids, n_views, "r", bank,
                                    ref_scale=1.0, mva_masks=mva_masks)
            eps_u = self.unet.apply(unet_params, x_in, tt, text_gen,
                                    camera_ids, n_views, "r", bank,
                                    ref_scale=0.0, mva_masks=mva_masks)
            eps = eps_u + guidance * (eps_c - eps_u)

            # Euler-Ancestral update
            x0 = noisy - sigma * eps
            s_to2, s_from2 = sigma_next ** 2, sigma ** 2
            sigma_up = jnp.sqrt(jnp.maximum(
                s_to2 * (s_from2 - s_to2) / jnp.maximum(s_from2, 1e-12), 0.0))
            sigma_down = jnp.sqrt(jnp.maximum(s_to2 - sigma_up ** 2, 0.0))
            d = (noisy - x0) / jnp.maximum(sigma, 1e-12)
            return x0 + d * sigma_down + noise * sigma_up

        @jax.jit
        def _lcm_step(unet_params, noisy, ctrl_lat, ref_lat, text_gen,
                      text_ref, camera_ids, t, ac_t, ac_prev, noise,
                      mva_masks=None):
            """One LCM/turbo step (reference pipeline.py:84-117,650-683).

            Turbo disables CFG — a single conditional pass at ref_scale 1
            (the distilled model bakes guidance in), and the latents live in
            DDPM x-space (``LCMScheduler.scale_model_input`` is identity):
            x_t = sqrt(ac)*x0 + sqrt(1-ac)*eps, numerically identical to the
            Euler path's scaled model input."""
            n_views = noisy.shape[0]
            ref_in = jnp.concatenate(
                [ref_lat, jnp.zeros_like(ref_lat), jnp.zeros_like(ref_lat)],
                axis=-1)
            _, vars_w = self.unet.apply(
                unet_params, ref_in, jnp.zeros((1,)), text_ref,
                jnp.zeros((1,), jnp.int32), 1, "w", mutable=["ref_bank"])
            bank = vars_w["ref_bank"]

            x_in = jnp.concatenate([noisy, ctrl_lat], axis=-1)
            tt = jnp.full((n_views,), t, jnp.float32)
            eps = self.unet.apply(unet_params, x_in, tt, text_gen,
                                  camera_ids, n_views, "r", bank,
                                  ref_scale=1.0, mva_masks=mva_masks)

            alpha_t = jnp.sqrt(ac_t)
            sigma_t = jnp.sqrt(1.0 - ac_t)
            x0 = (noisy - sigma_t * eps) / alpha_t
            c_skip, c_out = lcm_boundary_scalings(t)
            denoised = c_out * x0 + c_skip * noisy
            stepped = (jnp.sqrt(ac_prev) * denoised
                       + jnp.sqrt(1.0 - ac_prev) * noise)
            return denoised, stepped

        self._encode = _encode
        self._decode = _decode
        self._step = _step
        self._lcm_step_fn = _lcm_step

    def _commit(self, params: dict) -> dict:
        """Place params on device ONCE, in the compute dtype.

        The denoise loop is a host-side python loop of jitted calls; host
        numpy params would otherwise re-upload the full UNet (GBs) on EVERY
        call — catastrophic over a tunneled backend (~25 MB/s). Float leaves
        are committed as the module compute dtype (the released HunyuanPaint
        ships fp16; the UNet computes in ``dtype`` regardless), halving HBM
        residency vs f32."""
        if not params:
            return params
        import numpy as _np

        def cast(a):
            if isinstance(a, jax.Array):  # already on device (init_random)
                return a.astype(self._dtype) if jnp.issubdtype(
                    a.dtype, jnp.floating) else a
            a = _np.asarray(a)
            if _np.issubdtype(a.dtype, _np.floating):
                a = a.astype(self._dtype)  # host-side cast (ml_dtypes bf16)
            return jax.device_put(a)
        return jax.tree.map(cast, params)

    @classmethod
    def from_diffusers(cls, unet_state_dict: dict, vae_state_dict: dict,
                       text_gen, text_ref, **kw):
        """Build from released HunyuanPaint weights: the ``unet.``-prefixed
        2p5D-wrapped diffusers UNet (refview/multiview attentions + camera
        table map via ``convert_sd_unet``), its AutoencoderKL, and the two
        learned text embeddings (reference modules.py:447-448)."""
        from motion324_tpu.utils.sd_convert import (convert_sd_unet,
                                                    convert_sd_vae)
        self = cls(params={}, **kw)
        self.params = self._commit({
            "unet": convert_sd_unet(unet_state_dict),
            "vae": convert_sd_vae(vae_state_dict),
            "text_gen": np.asarray(text_gen, np.float32),
            "text_ref": np.asarray(text_ref, np.float32),
        })
        return self

    @classmethod
    def init_random(cls, key=None, *, image_size: int = 64, **kwargs):
        key = jax.random.PRNGKey(0) if key is None else key
        self = cls(params={}, **kwargs)
        k1, k2, k3 = jax.random.split(key, 3)
        lat = image_size // 8
        # init with n_views=2 so the multiview-attention params are created
        x = jnp.zeros((2, lat, lat, 12))
        ctx = jnp.zeros((2, self.text_len, self.context_dim))
        unet_params = jax.jit(
            lambda k: self.unet.init(k, x, jnp.zeros((2,)), ctx,
                                     jnp.zeros((2,), jnp.int32), 2, "wr"))(k1)
        vae_params = jax.jit(
            lambda k: self.vae.init(
                k, jnp.zeros((1, image_size, image_size, 3))))(k2)
        self.params = self._commit({
            "unet": unet_params, "vae": vae_params,
            "text_gen": jax.random.normal(
                k3, (1, self.text_len, self.context_dim)) * 0.02,
            "text_ref": jax.random.normal(
                k3, (1, self.text_len, self.context_dim)) * 0.02,
        })
        return self

    # ------------------------------------------------------------------ #
    def generate(self, ref_image: np.ndarray, control_images: np.ndarray,
                 camera_ids=None, num_steps: int = 30,
                 guidance_scale: float = 3.0, seed: int = 0,
                 mva_masks=None, sampler: str = "euler") -> np.ndarray:
        """ref (H, W, 3), control (N, H, W, 6: normal+position) -> (N, H, W, 3).

        ``sampler='lcm'`` is the few-step turbo path for LCM-distilled
        weights (reference hunyuanpaint-turbo): DDIM-grid timesteps, no CFG,
        consistency boundary update; pair it with ``mva_masks`` for the full
        turbo mode."""
        n_views, h, w, _ = control_images.shape
        ref_lat = self._encode(self.params["vae"],
                               jnp.asarray(ref_image)[None] * 2 - 1)
        normal_lat = self._encode(self.params["vae"],
                                  jnp.asarray(control_images[..., :3]) * 2 - 1)
        pos_lat = self._encode(self.params["vae"],
                               jnp.asarray(control_images[..., 3:6]) * 2 - 1)
        ctrl = jnp.concatenate([normal_lat, pos_lat], axis=-1)

        if camera_ids is None:
            camera_ids = jnp.arange(n_views, dtype=jnp.int32) + 5
        text_gen = jnp.repeat(jnp.asarray(self.params["text_gen"]), n_views, 0)
        text_ref = jnp.asarray(self.params["text_ref"])

        key = jax.random.PRNGKey(seed)
        key, k0 = jax.random.split(key)
        # latent resolution follows the VAE's actual downsampling factor
        lat_shape = (n_views, ctrl.shape[1], ctrl.shape[2], 4)

        if sampler == "lcm":
            ts, ac, ac_prev = lcm_schedule(num_steps)
            x = jax.random.normal(k0, lat_shape)  # init_noise_sigma = 1
            for i in range(len(ts)):
                key, kn = jax.random.split(key)
                noise = jax.random.normal(kn, lat_shape)
                denoised, x = self._lcm_step_fn(
                    self.params["unet"], x, ctrl, ref_lat, text_gen,
                    text_ref, camera_ids, float(ts[i]), float(ac[i]),
                    float(ac_prev[i]), noise, mva_masks=mva_masks)
            x = denoised  # final step returns the consistency output
        elif sampler == "euler":
            timesteps, sigmas = sd_sigmas(num_steps)
            x = jax.random.normal(k0, lat_shape) * sigmas[0]
            for i in range(num_steps):
                key, kn = jax.random.split(key)
                noise = jax.random.normal(kn, lat_shape)
                x = self._step(self.params["unet"], x, ctrl, ref_lat,
                               text_gen, text_ref, camera_ids,
                               float(timesteps[i]), float(sigmas[i]),
                               float(sigmas[i + 1]), noise,
                               float(guidance_scale), mva_masks=mva_masks)
        else:
            raise ValueError(f"sampler must be 'euler' or 'lcm', "
                             f"got {sampler!r}")
        imgs = self._decode(self.params["vae"], x)
        return np.clip((np.asarray(imgs) + 1) / 2, 0, 1)

    # PaintPipeline synthesizer interface ------------------------------- #
    def __call__(self, cond_image, views, renders, turbo: bool = False,
                 turbo_steps: int = 8):
        """Turbo mode = voxel-locality attention masks + few-step LCM
        sampling (reference 'hunyuanpaint-turbo', multiview_utils.py:30-45):
        6 views in ``turbo_steps`` (<= 8) UNet sweeps instead of 30 CFG
        pairs."""
        control = np.stack([
            np.concatenate([(r["normal"] + 1) / 2, r["position"] + 0.5],
                           axis=-1) for r in renders])
        h = renders[0]["mask"].shape[0]
        import cv2
        ref = cv2.resize(cond_image, (h, h), interpolation=cv2.INTER_AREA)
        if turbo:
            imgs = self.generate(ref.astype(np.float32),
                                 control.astype(np.float32),
                                 num_steps=turbo_steps, sampler="lcm",
                                 mva_masks=self.turbo_masks(renders))
        else:
            imgs = self.generate(ref.astype(np.float32),
                                 control.astype(np.float32))
        return [img * r["mask"][..., None] for img, r in zip(imgs, renders)]

    @staticmethod
    def turbo_masks(renders, grid_resolutions=(32, 16, 8),
                    dense: bool = False):
        """Voxel-locality multiview-attention masks from the views' position
        maps (reference turbo mode, modules.py:302-402), keyed by joint token
        count for UNet2p5D's multiview attention.

        Default is the IMPLICIT (positions, radius) form consumed by the
        masked flash kernel — O(S) memory, usable at product resolution.
        ``dense=True`` returns the explicit (B, S, S) boolean masks (tests /
        small shapes)."""
        import jax.numpy as jnp
        from motion324_tpu.hy3dgen.voxel_attention import (
            multi_resolution_mask, multi_resolution_positions)
        pos = np.stack([r["position"] + 0.5 for r in renders])[None]
        # background convention: voxel_attention treats exactly-1.0 as empty
        mask_bg = ~np.stack([r["mask"] for r in renders])[None][..., None]
        pos = np.where(mask_bg, 1.0, np.clip(pos, 0.0, 0.999))
        build = multi_resolution_mask if dense else multi_resolution_positions
        return build(jnp.asarray(pos, jnp.float32), grid_resolutions)
