"""Image -> mesh shape-generation pipeline (flow-matching DiT + ShapeVAE).

TPU-native counterpart of the reference's
``Hunyuan3DDiTFlowMatchingPipeline.__call__`` (reference:
scripts/hy3dgen/shapegen/pipelines.py:675-765): condition an image with a
frozen ViT (zeros as the unconditional embedding, conditioner.py:96-133),
run the 50-step CFG flow-matching Euler loop (guidance 5.0), decode latents
through the ShapeVAE into an occupancy grid, and extract the surface with
marching cubes at the grid's bbox scale (surface_extractors.py:67-76).

TPU-first structure: the whole denoising loop is one ``lax.scan`` under jit
(cond/uncond batched together for CFG); the volume decode is the chunked /
hierarchical sweep in :mod:`motion324_tpu.hy3dgen.volume`; marching cubes is
the native C++ kernel.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from motion324_tpu.hy3dgen.dit import Hunyuan3DDiT
from motion324_tpu.hy3dgen.scheduler import flow_match_sigmas
from motion324_tpu.hy3dgen.vae import ShapeVAE
from motion324_tpu.hy3dgen.volume import (decode_volume,
                                          decode_volume_hierarchical)
from motion324_tpu.io.mesh import TriMesh
from motion324_tpu.models.dinov2 import DinoViT
from motion324_tpu.utils.logging import log

__all__ = ["ShapeGenPipeline"]


class ShapeGenPipeline:
    """Holds models + params; ``__call__(image)`` -> TriMesh."""

    def __init__(self, params: dict, *, num_latents: int = 512,
                 latent_dim: int = 64, cond_dim: int = 1536,
                 cond_depth: int = 24, cond_heads: int = 24,
                 dit_hidden: int = 1024, dit_heads: int = 16,
                 dit_depth: int = 16, dit_single: int = 32,
                 vae_width: int = 1024, vae_heads: int = 16,
                 vae_layers: int = 16,
                 image_size: int = 518, dtype: Any = jnp.bfloat16,
                 attn_backend: str | None = None,
                 conditioner_type: str = "single", view_num: int = 4,
                 cond_mlp_type: str = "mlp", cond_native_grid: int = 37):
        self.dit = Hunyuan3DDiT(in_channels=latent_dim,
                                context_in_dim=cond_dim,
                                hidden_size=dit_hidden, num_heads=dit_heads,
                                depth=dit_depth,
                                depth_single_blocks=dit_single, dtype=dtype,
                                attn_backend=attn_backend)
        self.vae = ShapeVAE(num_latents=num_latents, embed_dim=latent_dim,
                            width=vae_width, heads=vae_heads,
                            num_decoder_layers=vae_layers, dtype=dtype)
        # conditioner: frozen DINOv2-giant-class ViT (reference
        # conditioner.py:96-133); unconditional embedding is zeros.
        # 'single' = DinoImageEncoder, 'mv' = DinoImageEncoderMV with 1-D
        # sincos view embeddings over canonical front/left/back/right slots
        # (reference conditioner.py:134-200).
        if conditioner_type not in ("single", "mv"):
            raise ValueError(f"conditioner_type must be 'single' or 'mv', "
                             f"got {conditioner_type!r}")
        self.conditioner_type = conditioner_type
        if conditioner_type == "mv":
            from motion324_tpu.hy3dgen.conditioner import DinoConditionerMV
            self.conditioner = DinoConditionerMV(
                embed_dim=cond_dim, depth=cond_depth, num_heads=cond_heads,
                view_num=view_num, dtype=dtype)
        else:
            # cond_mlp_type 'swiglu' = the DINOv2-giant FFN of the released
            # Hunyuan3D-2 conditioner (from_hunyuan_ckpt detects it from the
            # state dict's weights_in/weights_out keys)
            self.conditioner = DinoViT(embed_dim=cond_dim, depth=cond_depth,
                                       num_heads=cond_heads, dtype=dtype,
                                       mlp_type=cond_mlp_type,
                                       native_grid=cond_native_grid)
        self.view_num = view_num
        self.params = params
        self.num_latents = num_latents
        self.latent_dim = latent_dim
        self.image_size = image_size

        if conditioner_type == "mv":
            @jax.jit
            def _encode_cond(cond_params, image, view_idxs):
                return self.conditioner.apply(cond_params, image, view_idxs)
        else:
            @jax.jit
            def _encode_cond(cond_params, image):
                return self.conditioner.apply(cond_params, image)

        @functools.partial(jax.jit, static_argnums=(4,))
        def _denoise(dit_params, latents, cond_pair, sigmas, guidance_scale):
            """CFG flow-matching Euler loop as one scan."""

            def step(x, sig):
                sigma, sigma_next = sig
                t = jnp.full((2,), sigma, jnp.float32)
                x2 = jnp.concatenate([x, x], axis=0)
                v = self.dit.apply(dit_params, x2, t, cond_pair)
                v_cond, v_uncond = jnp.split(v, 2, axis=0)
                v = v_uncond + guidance_scale * (v_cond - v_uncond)
                return x + (sigma_next - sigma) * v, None

            pairs = jnp.stack([sigmas[:-1], sigmas[1:]], axis=-1)
            latents, _ = jax.lax.scan(step, latents, pairs)
            return latents

        @jax.jit
        def _vae_decode(vae_params, latents):
            return self.vae.apply(vae_params, latents,
                                  method=ShapeVAE.decode)

        def _vae_query(vae_params, points, processed):
            # params are threaded as an argument (volume.py passes them back)
            return self.vae.apply(vae_params, points, processed,
                                  method=ShapeVAE.query)

        self._encode_cond = _encode_cond
        self._denoise = _denoise
        self._vae_decode = _vae_decode
        self._vae_query = _vae_query

    # ------------------------------------------------------------------ #
    @classmethod
    def from_hunyuan_ckpt(cls, ckpt_path: str, **kwargs):
        """Build the pipeline from a released Hunyuan3D-2 single-file ckpt.

        ``ckpt_path`` is the snapshot's
        ``hunyuan3d-dit-v2-0/model.fp16.ckpt`` (torch pickle with
        ``{'model', 'vae', 'conditioner'}`` sub-dicts — reference
        pipelines.py:130-193 ``from_single_file``). Architecture dims (depths,
        widths, latent/cond dims, SwiGLU-vs-MLP conditioner FFN) are inferred
        from the state dict itself; pass explicit kwargs to override. The
        converters are the oracle-validated ones in utils/torch_convert.
        """
        import torch

        from motion324_tpu.utils.torch_convert import (convert_dinov2_hf,
                                                       convert_hunyuan3d_dit,
                                                       convert_shape_vae)

        ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=True)

        def np_sd(sub):
            return {k: v.float().numpy() for k, v in ckpt[sub].items()}

        dit_sd, vae_sd = np_sd("model"), np_sd("vae")
        cond_sd = np_sd("conditioner") if "conditioner" in ckpt else None

        def count(sd, fmt):
            i = 0
            while any(k.startswith(fmt.format(i)) for k in sd):
                i += 1
            return i

        dit_depth = count(dit_sd, "double_blocks.{}.")
        dit_single = count(dit_sd, "single_blocks.{}.")
        kwargs.setdefault("dit_depth", dit_depth)
        kwargs.setdefault("dit_single", dit_single)
        kwargs.setdefault("dit_hidden", dit_sd["latent_in.weight"].shape[0])
        # head count from the per-head QK-RMSNorm scale width
        head_dim = dit_sd["double_blocks.0.img_attn.norm.query_norm.scale"].shape[0]
        kwargs.setdefault("dit_heads", kwargs["dit_hidden"] // head_dim)
        kwargs.setdefault("latent_dim", dit_sd["latent_in.weight"].shape[1])
        kwargs.setdefault("cond_dim", dit_sd["cond_in.weight"].shape[1])
        vae_layers = count(vae_sd, "transformer.resblocks.{}.")
        kwargs.setdefault("vae_layers", vae_layers)
        kwargs.setdefault("vae_width", vae_sd["post_kl.weight"].shape[0])

        params = {
            "dit": convert_hunyuan3d_dit(dit_sd, depth=dit_depth,
                                         depth_single=dit_single),
            "vae": convert_shape_vae(vae_sd, num_layers=vae_layers),
        }
        if cond_sd is not None:
            prefix = "main_image_encoder.model."
            dino_sd = {k[len(prefix):]: v for k, v in cond_sd.items()
                       if k.startswith(prefix)} or cond_sd
            depth = count(dino_sd, "encoder.layer.{}.")
            swiglu = any("weights_in" in k for k in dino_sd)
            kwargs.setdefault("cond_depth", depth)
            kwargs.setdefault("cond_mlp_type", "swiglu" if swiglu else "mlp")
            if "embeddings.position_embeddings" in dino_sd:
                n_pos = dino_sd["embeddings.position_embeddings"].shape[1]
                kwargs.setdefault("cond_native_grid",
                                  int(round((n_pos - 1) ** 0.5)))
            # convert_dinov2_hf returns a bare param tree; apply() wants the
            # {'params': ...} collection dict (like init_random produces)
            params["conditioner"] = {"params": convert_dinov2_hf(
                dino_sd, depth=depth, swiglu=swiglu)}
        self = cls(params={}, **kwargs)
        # Commit converted numpy params to device ONCE in the compute dtype:
        # host numpy leaves would re-upload the full tree (conditioner alone
        # is GBs) on every jitted call — catastrophic over a tunneled
        # backend — and f32 residency would double HBM vs the fp16 the
        # released ckpt ships.
        dtype = self.dit.dtype

        def commit(a):
            a = np.asarray(a)
            if np.issubdtype(a.dtype, np.floating):
                a = a.astype(dtype)
            return jax.device_put(a)
        self.params = jax.tree.map(commit, params)
        return self

    # ------------------------------------------------------------------ #
    @classmethod
    def init_random(cls, key=None, **kwargs):
        """Random-weight pipeline (smoke/benchmark mode; real weights come
        from the torch-checkpoint converter)."""
        key = jax.random.PRNGKey(0) if key is None else key
        self = cls(params={}, **kwargs)  # placeholder params, filled below
        k1, k2, k3 = jax.random.split(key, 3)
        lat = jnp.zeros((1, self.num_latents, self.latent_dim))
        cond = jnp.zeros((1, 2, self.conditioner.embed_dim))
        if self.conditioner_type == "mv":
            img = jnp.zeros((1, self.view_num, self.image_size,
                             self.image_size, 3))
            cparams = jax.jit(self.conditioner.init)(k3, img)
        else:
            img = jnp.zeros((1, self.image_size, self.image_size, 3))
            cparams = jax.jit(self.conditioner.init)(k3, img)
        params = {
            "dit": jax.jit(self.dit.init)(k1, lat, jnp.zeros((1,)), cond),
            "vae": jax.jit(self.vae.init)(k2, lat, jnp.zeros((1, 8, 3))),
            "conditioner": cparams,
        }
        self.params = params
        return self

    # ------------------------------------------------------------------ #
    def __call__(self, image: np.ndarray, *, num_inference_steps: int = 50,
                 guidance_scale: float = 5.0, octree_resolution: int = 384,
                 mc_level: float = 0.0, num_chunks: int = 8192,
                 hierarchical: bool = True, box_v: float = 1.01,
                 enable_flashvdm: bool = False, flashvdm_topk: int = 64,
                 recenter: bool = True, border_ratio: float = 0.15,
                 seed: int = 0) -> TriMesh:
        """image (H, W, 3|4) in [0, 1] -> extracted TriMesh.

        With ``conditioner_type='mv'`` pass a DICT of view-tag -> image
        instead (tags among front/left/back/right; reference
        MVImageProcessorV2, preprocessors.py:120-160).

        ``recenter`` applies the alpha-aware border-ratio recentering the
        reference always runs before conditioning (ImageProcessorV2,
        preprocessors.py:30-117); disable only for pre-processed inputs.
        """
        if self.conditioner_type == "mv":
            if not isinstance(image, dict):
                raise ValueError("mv pipeline takes a dict of view-tag -> "
                                 "image (front/left/back/right)")
            from motion324_tpu.hy3dgen.preprocess_image import (
                prepare_condition_images_mv)
            images, _, idxs = prepare_condition_images_mv(
                image, self.image_size, border_ratio)
            cond = self._encode_cond(self.params["conditioner"],
                                     jnp.asarray(images)[None],
                                     jnp.asarray(idxs)[None])
        else:
            if recenter:
                from motion324_tpu.hy3dgen.preprocess_image import (
                    prepare_condition_image)
                image, _ = prepare_condition_image(image, self.image_size,
                                                   border_ratio)
            elif image.shape[:2] != (self.image_size, self.image_size):
                image = np.asarray(jax.image.resize(
                    jnp.asarray(image[..., :3]),
                    (self.image_size, self.image_size, 3),
                    method="linear", antialias=True))

            cond = self._encode_cond(self.params["conditioner"],
                                     jnp.asarray(image)[None])
        cond_pair = jnp.concatenate([cond, jnp.zeros_like(cond)], axis=0)

        latents = jax.random.normal(
            jax.random.PRNGKey(seed), (1, self.num_latents, self.latent_dim))
        sigmas = jnp.asarray(flow_match_sigmas(num_inference_steps))
        latents = self._denoise(self.params["dit"], latents, cond_pair,
                                sigmas, float(guidance_scale))

        processed = self._vae_decode(self.params["vae"], latents)
        if enable_flashvdm:
            # grid-sorted top-k decode (reference volume_decoders.py:280-435)
            from motion324_tpu.hy3dgen.volume import decode_volume_flashvdm
            grid = decode_volume_flashvdm(
                self.vae, self.params["vae"], processed,
                resolution=octree_resolution, box_v=box_v, chunk=num_chunks,
                topk=flashvdm_topk)
        else:
            decode = (decode_volume_hierarchical if hierarchical
                      else decode_volume)
            grid = decode(self._vae_query, self.params["vae"], processed,
                          resolution=octree_resolution, box_v=box_v,
                          chunk=num_chunks)

        from motion324_tpu.native import marching_cubes
        verts, faces = marching_cubes(
            grid, iso=mc_level,
            bounds=((-box_v, -box_v, -box_v), (box_v, box_v, box_v)))
        log(f"shape generated: {len(verts)} verts, {len(faces)} faces")
        return TriMesh(vertices=verts, faces=faces.astype(np.int64))
