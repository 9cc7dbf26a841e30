"""Text -> image generation entry point (native DiT pipeline).

Fills the reference's ``HunyuanDiTPipeline`` slot (reference:
scripts/hy3dgen/text2image.py:30-81 — a diffusers text-to-image wrapper used
by the video-only product when no input image exists). The native pipeline:

- CLIP TEXT encoder in flax (causal transformer, quick-GELU, EOS pooling)
  whose converter is validated against HF's torch ``CLIPTextModel``;
- a latent-image DiT reusing the framework's flow-matching Flux-style blocks
  (:class:`motion324_tpu.hy3dgen.dit.Hunyuan3DDiT` over patchified latents) —
  the compute path is identical in kind to the shape DiT, re-dimensioned for
  images;
- the SD VAE decoder (:mod:`motion324_tpu.hy3dgen.sd_vae`).

Weights are pluggable like every generative stage in this environment; the
text tower converts from public CLIP checkpoints, the DiT/VAE from
flow-matching image checkpoints with the documented layouts.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np

__all__ = ["CLIPTextTower", "CLIPTextCfg", "convert_clip_text",
           "TextToImagePipeline"]


@dataclasses.dataclass(frozen=True)
class CLIPTextCfg:
    vocab: int = 49408
    hidden: int = 768
    intermediate: int = 3072
    layers: int = 12
    heads: int = 12
    max_len: int = 77
    eos_token: int = 49407


class CLIPTextTower:
    """CLIP text transformer -> (per-token states, EOS-pooled embedding)."""

    def __init__(self, cfg: CLIPTextCfg = CLIPTextCfg(), params=None,
                 seed: int = 0):
        import jax
        import jax.numpy as jnp
        from flax import linen as nn

        c = cfg

        class _Tower(nn.Module):
            @nn.compact
            def __call__(self, tokens):  # (B, L) int32
                b, L = tokens.shape
                tok = self.param("token_embedding",
                                 nn.initializers.normal(0.02),
                                 (c.vocab, c.hidden))
                pos = self.param("position_embedding",
                                 nn.initializers.normal(0.02),
                                 (c.max_len, c.hidden))
                x = tok[tokens] + pos[None, :L]
                causal = jnp.tril(jnp.ones((L, L), bool))
                neg = jnp.asarray(-1e9, x.dtype)
                for i in range(c.layers):
                    h = nn.LayerNorm(epsilon=1e-5, name=f"ln1_{i}")(x)
                    hd = c.hidden // c.heads
                    q = nn.Dense(c.hidden, name=f"q_{i}")(h)
                    k = nn.Dense(c.hidden, name=f"k_{i}")(h)
                    v = nn.Dense(c.hidden, name=f"v_{i}")(h)
                    q = q.reshape(b, L, c.heads, hd).transpose(0, 2, 1, 3)
                    k = k.reshape(b, L, c.heads, hd).transpose(0, 2, 1, 3)
                    v = v.reshape(b, L, c.heads, hd).transpose(0, 2, 1, 3)
                    a = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(hd)
                    a = jnp.where(causal[None, None], a, neg)
                    a = jax.nn.softmax(a, axis=-1)
                    o = jnp.einsum("bhqk,bhkd->bhqd", a, v)
                    o = o.transpose(0, 2, 1, 3).reshape(b, L, c.hidden)
                    x = x + nn.Dense(c.hidden, name=f"attn_out_{i}")(o)
                    h = nn.LayerNorm(epsilon=1e-5, name=f"ln2_{i}")(x)
                    h = nn.Dense(c.intermediate, name=f"fc1_{i}")(h)
                    h = h * jax.nn.sigmoid(1.702 * h)  # quick_gelu
                    x = x + nn.Dense(c.hidden, name=f"fc2_{i}")(h)
                x = nn.LayerNorm(epsilon=1e-5, name="final_ln")(x)
                # EOS pooling: the hidden state at each sequence's eos token
                eos_pos = jnp.argmax((tokens == c.eos_token).astype(jnp.int32),
                                     axis=1)
                pooled = x[jnp.arange(b), eos_pos]
                return x, pooled

        self.cfg = cfg
        self._net = _Tower()
        if params is None:
            t = jnp.zeros((1, cfg.max_len), jnp.int32)
            params = jax.jit(self._net.init)(jax.random.PRNGKey(seed), t)
        self.params = params
        self._apply = jax.jit(self._net.apply)

    def __call__(self, tokens: np.ndarray):
        import jax.numpy as jnp
        states, pooled = self._apply(self.params,
                                     jnp.asarray(tokens, jnp.int32))
        return np.asarray(states), np.asarray(pooled)


def convert_clip_text(state_dict: dict, cfg: CLIPTextCfg) -> dict:
    """HF torch ``CLIPTextModel`` state dict -> flax text tower params."""
    def t(k):
        v = state_dict[k]
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                          else v, np.float32)

    p = {"token_embedding": t("text_model.embeddings.token_embedding.weight"),
         "position_embedding": t(
             "text_model.embeddings.position_embedding.weight"),
         "final_ln": {"scale": t("text_model.final_layer_norm.weight"),
                      "bias": t("text_model.final_layer_norm.bias")}}
    for i in range(cfg.layers):
        b = f"text_model.encoder.layers.{i}"
        for ours, theirs in (("q", "q_proj"), ("k", "k_proj"),
                             ("v", "v_proj"), ("attn_out", "out_proj")):
            p[f"{ours}_{i}"] = {
                "kernel": t(f"{b}.self_attn.{theirs}.weight").T,
                "bias": t(f"{b}.self_attn.{theirs}.bias")}
        p[f"ln1_{i}"] = {"scale": t(f"{b}.layer_norm1.weight"),
                         "bias": t(f"{b}.layer_norm1.bias")}
        p[f"ln2_{i}"] = {"scale": t(f"{b}.layer_norm2.weight"),
                         "bias": t(f"{b}.layer_norm2.bias")}
        p[f"fc1_{i}"] = {"kernel": t(f"{b}.mlp.fc1.weight").T,
                         "bias": t(f"{b}.mlp.fc1.bias")}
        p[f"fc2_{i}"] = {"kernel": t(f"{b}.mlp.fc2.weight").T,
                         "bias": t(f"{b}.mlp.fc2.bias")}
    return {"params": p}


class TextToImagePipeline:
    """prompt tokens -> (H, W, 3) image in [0, 1], CFG flow matching."""

    def __init__(self, params: dict, *, image_size: int = 512,
                 latent_patch: int = 2, dit_hidden: int = 1024,
                 dit_heads: int = 16, dit_depth: int = 8, dit_single: int = 16,
                 text_cfg: CLIPTextCfg = CLIPTextCfg(),
                 dtype: Any = None):
        import jax
        import jax.numpy as jnp
        from motion324_tpu.hy3dgen.dit import Hunyuan3DDiT
        from motion324_tpu.hy3dgen.sd_vae import SCALING_FACTOR, AutoencoderKL

        dtype = dtype or jnp.bfloat16
        self.image_size = image_size
        self.latent = image_size // 8
        self.patch = latent_patch
        self.tokens_per_side = self.latent // latent_patch
        lat_ch = 4 * latent_patch * latent_patch
        self.text = CLIPTextTower(text_cfg, params.get("text"))
        self.dit = Hunyuan3DDiT(in_channels=lat_ch,
                                context_in_dim=text_cfg.hidden,
                                hidden_size=dit_hidden, num_heads=dit_heads,
                                depth=dit_depth,
                                depth_single_blocks=dit_single, dtype=dtype)
        self.vae = AutoencoderKL(dtype=dtype)
        self.params = params
        self._scaling = SCALING_FACTOR

        @jax.jit
        def _denoise(dit_params, latents, ctx_pair, sigmas, guidance):
            def step(x, sig):
                s, s_next = sig
                xx = jnp.concatenate([x, x], axis=0)
                tt = jnp.full((xx.shape[0],), s, jnp.float32)
                v = self.dit.apply(dit_params, xx, tt, ctx_pair)
                v_c, v_u = jnp.split(v, 2, axis=0)
                v = v_u + guidance * (v_c - v_u)
                return x + (s_next - s) * v, None

            pairs = jnp.stack([sigmas[:-1], sigmas[1:]], axis=1)
            out, _ = jax.lax.scan(step, latents, pairs)
            return out

        @jax.jit
        def _decode(vae_params, z):
            return self.vae.apply(vae_params, z / self._scaling,
                                  method=AutoencoderKL.decode)

        self._denoise = _denoise
        self._decode = _decode

    @classmethod
    def init_random(cls, key=None, image_size: int = 64, **kw):
        import jax
        import jax.numpy as jnp
        key = jax.random.PRNGKey(0) if key is None else key
        k1, k2 = jax.random.split(key)
        tiny_text = CLIPTextCfg(vocab=256, hidden=64, intermediate=128,
                                layers=2, heads=4, max_len=16, eos_token=255)
        self = cls({}, image_size=image_size, dit_hidden=64, dit_heads=4,
                   dit_depth=1, dit_single=1, text_cfg=tiny_text,
                   dtype=jnp.float32)
        n_tok = self.tokens_per_side ** 2
        lat_ch = 4 * self.patch ** 2
        dit_params = jax.jit(lambda k: self.dit.init(
            k, jnp.zeros((2, n_tok, lat_ch)), jnp.zeros((2,)),
            jnp.zeros((2, tiny_text.max_len, tiny_text.hidden))))(k1)
        vae_params = jax.jit(lambda k: self.vae.init(
            k, jnp.zeros((1, image_size, image_size, 3))))(k2)
        self.params = {"text": self.text.params, "dit": dit_params,
                       "vae": vae_params}
        return self

    def __call__(self, tokens: np.ndarray, *, num_steps: int = 25,
                 guidance_scale: float = 5.0, seed: int = 0) -> np.ndarray:
        import jax
        import jax.numpy as jnp
        from motion324_tpu.hy3dgen.scheduler import flow_match_sigmas

        states, _ = self.text(np.asarray(tokens)[None])
        uncond = np.zeros_like(states)
        ctx_pair = jnp.asarray(np.concatenate([states, uncond], axis=0))

        n_tok = self.tokens_per_side ** 2
        lat_ch = 4 * self.patch ** 2
        x = jax.random.normal(jax.random.PRNGKey(seed), (1, n_tok, lat_ch))
        sigmas = jnp.asarray(flow_match_sigmas(num_steps))[::-1]
        x = self._denoise(self.params["dit"], x, ctx_pair, sigmas,
                          float(guidance_scale))
        # unpatchify (1, n, p*p*4) -> (1, latent, latent, 4)
        g, p = self.tokens_per_side, self.patch
        z = np.asarray(x).reshape(1, g, g, p, p, 4).transpose(0, 1, 3, 2, 4, 5)
        z = z.reshape(1, g * p, g * p, 4)
        img = self._decode(self.params["vae"], jnp.asarray(z))
        return np.clip((np.asarray(img)[0] + 1) / 2, 0, 1)
