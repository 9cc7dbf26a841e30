"""CLIP image-similarity and DreamSim perceptual-distance metrics.

Completes the reference's 4-metric video protocol (reference:
evaluation/calculate_lpips.py:90-136 OpenCLIP ViT-bigG-14 cosine similarity,
:34-87 DreamSim distance; evaluation/evaluation.py:133-203 driver). Both run
on a flax CLIP vision tower whose parameters convert from the HF torch
``CLIPVisionModel`` layout (``convert_clip_vision``); DreamSim is the standard
ensemble construction — per-backbone embeddings are L2-normalised, concatenated
and compared by cosine distance.

Without converted weights the metrics are still deterministic relative
measures (random towers), which is what CI exercises; the converters are
validated against the real torch implementations at test time.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import numpy as np

__all__ = ["CLIPVisionTower", "CLIPVisionCfg", "convert_clip_vision",
           "clip_similarity", "DreamSim"]


@dataclasses.dataclass(frozen=True)
class CLIPVisionCfg:
    """Defaults follow OpenCLIP ViT-bigG-14 (the reference's similarity
    backbone); tests use small dims against HF's torch module."""

    hidden: int = 1664
    intermediate: int = 8192
    layers: int = 48
    heads: int = 16
    image_size: int = 224
    patch: int = 14
    proj_dim: int = 1280
    quick_gelu: bool = False  # bigG uses plain gelu; HF CLIP uses quick_gelu


class CLIPVisionTower:
    """Pre-norm CLIP vision transformer returning the projected CLS embed."""

    def __init__(self, cfg: CLIPVisionCfg = CLIPVisionCfg(), params=None,
                 seed: int = 0):
        import jax
        import jax.numpy as jnp
        from flax import linen as nn

        c = cfg

        class _Tower(nn.Module):
            @nn.compact
            def __call__(self, pixels):  # (B, H, W, 3) normalised
                b = pixels.shape[0]
                x = nn.Conv(c.hidden, (c.patch, c.patch),
                            strides=(c.patch, c.patch), use_bias=False,
                            padding="VALID", name="patch")(pixels)
                x = x.reshape(b, -1, c.hidden)
                cls = self.param("class_embedding",
                                 nn.initializers.normal(0.02), (c.hidden,))
                x = jnp.concatenate(
                    [jnp.broadcast_to(cls, (b, 1, c.hidden)), x], axis=1)
                pos = self.param("position_embedding",
                                 nn.initializers.normal(0.02),
                                 (x.shape[1], c.hidden))
                x = x + pos
                x = nn.LayerNorm(epsilon=1e-5, name="pre_ln")(x)
                for i in range(c.layers):
                    h = nn.LayerNorm(epsilon=1e-5, name=f"ln1_{i}")(x)
                    qkv_dim = c.hidden
                    q = nn.Dense(qkv_dim, name=f"q_{i}")(h)
                    k = nn.Dense(qkv_dim, name=f"k_{i}")(h)
                    v = nn.Dense(qkv_dim, name=f"v_{i}")(h)
                    hd = c.hidden // c.heads
                    L = x.shape[1]
                    q = q.reshape(b, L, c.heads, hd).transpose(0, 2, 1, 3)
                    k = k.reshape(b, L, c.heads, hd).transpose(0, 2, 1, 3)
                    v = v.reshape(b, L, c.heads, hd).transpose(0, 2, 1, 3)
                    a = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(hd)
                    a = jax.nn.softmax(a, axis=-1)
                    o = jnp.einsum("bhqk,bhkd->bhqd", a, v)
                    o = o.transpose(0, 2, 1, 3).reshape(b, L, c.hidden)
                    x = x + nn.Dense(c.hidden, name=f"attn_out_{i}")(o)
                    h = nn.LayerNorm(epsilon=1e-5, name=f"ln2_{i}")(x)
                    h = nn.Dense(c.intermediate, name=f"fc1_{i}")(h)
                    h = (h * jax.nn.sigmoid(1.702 * h) if c.quick_gelu
                         else nn.gelu(h, approximate=False))
                    x = x + nn.Dense(c.hidden, name=f"fc2_{i}")(h)
                cls_out = nn.LayerNorm(epsilon=1e-5, name="post_ln")(x[:, 0])
                return nn.Dense(c.proj_dim, use_bias=False,
                                name="proj")(cls_out)

        self.cfg = cfg
        self._net = _Tower()
        if params is None:
            x = jnp.zeros((1, c.image_size, c.image_size, 3))
            params = jax.jit(self._net.init)(jax.random.PRNGKey(seed), x)
        self.params = params
        self._apply = jax.jit(self._net.apply)

    def __call__(self, images: np.ndarray) -> np.ndarray:
        """(B, H, W, 3) in [0,1] -> (B, proj_dim) embeddings (CLIP norm)."""
        import jax.numpy as jnp
        mean = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
        std = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)
        x = (np.asarray(images, np.float32) - mean) / std
        return np.asarray(self._apply(self.params, jnp.asarray(x)))


def convert_clip_vision(state_dict: dict, cfg: CLIPVisionCfg) -> dict:
    """HF torch ``CLIPVisionModel`` state dict -> flax tower params.

    Layout reference: transformers CLIPVisionModel
    (vision_model.embeddings / encoder.layers.N.self_attn / mlp / layer_norm).
    """
    import numpy as _np

    def t(key):
        v = state_dict[key]
        return _np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                           else v, _np.float32)

    p = {}
    p["class_embedding"] = t("vision_model.embeddings.class_embedding")
    p["position_embedding"] = t(
        "vision_model.embeddings.position_embedding.weight")
    # torch conv (out, in, kh, kw) -> flax (kh, kw, in, out)
    p["patch"] = {"kernel": t(
        "vision_model.embeddings.patch_embedding.weight"
    ).transpose(2, 3, 1, 0)}
    p["pre_ln"] = {"scale": t("vision_model.pre_layrnorm.weight"),
                   "bias": t("vision_model.pre_layrnorm.bias")}
    p["post_ln"] = {"scale": t("vision_model.post_layernorm.weight"),
                    "bias": t("vision_model.post_layernorm.bias")}
    if "visual_projection.weight" in state_dict:
        p["proj"] = {"kernel": t("visual_projection.weight").T}
    else:  # vision tower alone: identity-like projection not present
        p["proj"] = {"kernel": _np.eye(cfg.hidden, cfg.proj_dim,
                                       dtype=_np.float32)}
    for i in range(cfg.layers):
        b = f"vision_model.encoder.layers.{i}"
        p[f"q_{i}"] = {"kernel": t(f"{b}.self_attn.q_proj.weight").T,
                       "bias": t(f"{b}.self_attn.q_proj.bias")}
        p[f"k_{i}"] = {"kernel": t(f"{b}.self_attn.k_proj.weight").T,
                       "bias": t(f"{b}.self_attn.k_proj.bias")}
        p[f"v_{i}"] = {"kernel": t(f"{b}.self_attn.v_proj.weight").T,
                       "bias": t(f"{b}.self_attn.v_proj.bias")}
        p[f"attn_out_{i}"] = {"kernel": t(f"{b}.self_attn.out_proj.weight").T,
                              "bias": t(f"{b}.self_attn.out_proj.bias")}
        p[f"ln1_{i}"] = {"scale": t(f"{b}.layer_norm1.weight"),
                         "bias": t(f"{b}.layer_norm1.bias")}
        p[f"ln2_{i}"] = {"scale": t(f"{b}.layer_norm2.weight"),
                         "bias": t(f"{b}.layer_norm2.bias")}
        p[f"fc1_{i}"] = {"kernel": t(f"{b}.mlp.fc1.weight").T,
                         "bias": t(f"{b}.mlp.fc1.bias")}
        p[f"fc2_{i}"] = {"kernel": t(f"{b}.mlp.fc2.weight").T,
                         "bias": t(f"{b}.mlp.fc2.bias")}
    return {"params": p}


def clip_similarity(video1: np.ndarray, video2: np.ndarray,
                    tower: CLIPVisionTower | None = None,
                    batch: int = 8) -> float:
    """Mean per-frame CLIP cosine similarity between two aligned videos
    (reference calculate_lpips.py:90-136)."""
    tower = tower or CLIPVisionTower()
    t = min(len(video1), len(video2))
    sims = []
    for i in range(0, t, batch):
        a = _resize_batch(video1[i:i + batch], tower.cfg.image_size)
        b = _resize_batch(video2[i:i + batch], tower.cfg.image_size)
        ea, eb = tower(a), tower(b)
        ea = ea / (np.linalg.norm(ea, axis=-1, keepdims=True) + 1e-10)
        eb = eb / (np.linalg.norm(eb, axis=-1, keepdims=True) + 1e-10)
        sims.extend(np.sum(ea * eb, axis=-1).tolist())
    return float(np.mean(sims[:t]))


def _resize_batch(frames: np.ndarray, size: int) -> np.ndarray:
    import cv2
    return np.stack([cv2.resize(f, (size, size),
                                interpolation=cv2.INTER_AREA) for f in frames])


class DreamSim:
    """DreamSim perceptual distance: an ensemble of ViT towers.

    The public DreamSim model concatenates L2-normalised embeddings from
    several ViT backbones (CLIP-B/32, OpenCLIP-B/32, DINO-B/16) and scores
    ``1 - cos``; the backbones here are :class:`CLIPVisionTower` instances
    whose weights convert independently (reference calculate_lpips.py:34-87).
    """

    def __init__(self, towers: Sequence[CLIPVisionTower] | None = None):
        if towers is None:
            small = CLIPVisionCfg(hidden=128, intermediate=256, layers=2,
                                  heads=4, image_size=224, patch=32,
                                  proj_dim=128)
            towers = [CLIPVisionTower(small, seed=s) for s in range(3)]
        self.towers = list(towers)

    def embed(self, images: np.ndarray) -> np.ndarray:
        embs = []
        for tw in self.towers:
            e = tw(_resize_batch(images, tw.cfg.image_size))
            e = e / (np.linalg.norm(e, axis=-1, keepdims=True) + 1e-10)
            embs.append(e)
        e = np.concatenate(embs, axis=-1)
        return e / (np.linalg.norm(e, axis=-1, keepdims=True) + 1e-10)

    def __call__(self, video1: np.ndarray, video2: np.ndarray) -> float:
        """Mean per-frame DreamSim distance between two aligned videos."""
        t = min(len(video1), len(video2))
        e1 = self.embed(np.asarray(video1[:t]))
        e2 = self.embed(np.asarray(video2[:t]))
        return float(np.mean(1.0 - np.sum(e1 * e2, axis=-1)))
