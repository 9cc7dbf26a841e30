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
           "DINOTower", "DINOCfg", "convert_dino_vit",
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


@dataclasses.dataclass(frozen=True)
class DINOCfg:
    """Defaults follow DINO ViT-B/16 — the third DreamSim backbone
    (reference evaluation/calculate_lpips.py:34-87 loads the ``dreamsim``
    ensemble of dino_vitb16 + clip_vitb32 + open_clip_vitb32)."""

    hidden: int = 768
    intermediate: int = 3072
    layers: int = 12
    heads: int = 12
    image_size: int = 224
    patch: int = 16


class DINOTower:
    """DINO-v1 ViT (post-embed LayerNorm-free, fused-qkv, no LayerScale)
    returning the final-LayerNorm CLS token.

    Matches the facebookresearch/dino ``VisionTransformer`` layout exactly so
    the released ``dino_vitb16`` (and DreamSim's LoRA-merged variant) weights
    convert 1:1 via :func:`convert_dino_vit`. Differs from CLIP towers in:
    biased patch conv, no pre-LN, no projection head, eps 1e-6, ImageNet
    input normalisation.
    """

    def __init__(self, cfg: DINOCfg = DINOCfg(), params=None, seed: int = 0):
        import jax
        import jax.numpy as jnp
        from flax import linen as nn

        c = cfg

        class _Tower(nn.Module):
            @nn.compact
            def __call__(self, pixels):  # (B, H, W, 3) normalised
                b = pixels.shape[0]
                x = nn.Conv(c.hidden, (c.patch, c.patch),
                            strides=(c.patch, c.patch), padding="VALID",
                            name="patch")(pixels)
                x = x.reshape(b, -1, c.hidden)
                cls = self.param("cls_token",
                                 nn.initializers.normal(0.02), (c.hidden,))
                x = jnp.concatenate(
                    [jnp.broadcast_to(cls, (b, 1, c.hidden)), x], axis=1)
                pos = self.param("pos_embed", nn.initializers.normal(0.02),
                                 (x.shape[1], c.hidden))
                x = x + pos
                hd = c.hidden // c.heads
                L = x.shape[1]
                for i in range(c.layers):
                    h = nn.LayerNorm(epsilon=1e-6, name=f"norm1_{i}")(x)
                    qkv = nn.Dense(3 * c.hidden, name=f"qkv_{i}")(h)
                    q, k, v = jnp.split(qkv, 3, axis=-1)
                    q = q.reshape(b, L, c.heads, hd).transpose(0, 2, 1, 3)
                    k = k.reshape(b, L, c.heads, hd).transpose(0, 2, 1, 3)
                    v = v.reshape(b, L, c.heads, hd).transpose(0, 2, 1, 3)
                    a = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(hd)
                    a = jax.nn.softmax(a, axis=-1)
                    o = jnp.einsum("bhqk,bhkd->bhqd", a, v)
                    o = o.transpose(0, 2, 1, 3).reshape(b, L, c.hidden)
                    x = x + nn.Dense(c.hidden, name=f"proj_{i}")(o)
                    h = nn.LayerNorm(epsilon=1e-6, name=f"norm2_{i}")(x)
                    h = nn.gelu(nn.Dense(c.intermediate, name=f"fc1_{i}")(h),
                                approximate=False)
                    x = x + nn.Dense(c.hidden, name=f"fc2_{i}")(h)
                return nn.LayerNorm(epsilon=1e-6, name="norm")(x[:, 0])

        self.cfg = cfg
        self._net = _Tower()
        if params is None:
            x = jnp.zeros((1, c.image_size, c.image_size, 3))
            params = jax.jit(self._net.init)(jax.random.PRNGKey(seed), x)
        self.params = params
        self._apply = jax.jit(self._net.apply)

    def __call__(self, images: np.ndarray) -> np.ndarray:
        """(B, H, W, 3) in [0,1] -> (B, hidden) CLS embeddings (ImageNet
        normalisation, as DINO/DreamSim preprocess)."""
        import jax.numpy as jnp
        mean = np.array([0.485, 0.456, 0.406], np.float32)
        std = np.array([0.229, 0.224, 0.225], np.float32)
        x = (np.asarray(images, np.float32) - mean) / std
        return np.asarray(self._apply(self.params, jnp.asarray(x)))


def convert_dino_vit(state_dict: dict, cfg: DINOCfg = DINOCfg()) -> dict:
    """facebookresearch/dino ``VisionTransformer`` state dict -> flax params.

    Layout: cls_token/pos_embed (leading singleton dims), patch_embed.proj
    conv, blocks.N.{norm1, attn.qkv, attn.proj, norm2, mlp.fc1, mlp.fc2},
    final norm. DreamSim's LoRA-finetuned dino_vitb16 merges into this same
    layout.
    """
    import numpy as _np

    def t(key):
        v = state_dict[key]
        return _np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                           else v, _np.float32)

    p = {"cls_token": t("cls_token").reshape(cfg.hidden),
         "pos_embed": t("pos_embed").reshape(-1, cfg.hidden),
         "patch": {"kernel": t("patch_embed.proj.weight").transpose(2, 3, 1, 0),
                   "bias": t("patch_embed.proj.bias")},
         "norm": {"scale": t("norm.weight"), "bias": t("norm.bias")}}
    for i in range(cfg.layers):
        b = f"blocks.{i}"
        p[f"norm1_{i}"] = {"scale": t(f"{b}.norm1.weight"),
                           "bias": t(f"{b}.norm1.bias")}
        p[f"qkv_{i}"] = {"kernel": t(f"{b}.attn.qkv.weight").T,
                         "bias": t(f"{b}.attn.qkv.bias")}
        p[f"proj_{i}"] = {"kernel": t(f"{b}.attn.proj.weight").T,
                          "bias": t(f"{b}.attn.proj.bias")}
        p[f"norm2_{i}"] = {"scale": t(f"{b}.norm2.weight"),
                           "bias": t(f"{b}.norm2.bias")}
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
    DINO-B/16 + CLIP-B/32 + OpenCLIP-B/32 backbones and scores ``1 - cos``
    (reference calculate_lpips.py:34-87 loads exactly that ensemble).
    :meth:`real_ensemble` builds those three architectures so the released
    (LoRA-merged) weights convert straight in via :func:`convert_dino_vit` /
    :func:`convert_clip_vision`; the no-weights default uses three compact
    random towers for fast relative-only CI runs.
    """

    def __init__(self, towers: Sequence | None = None):
        if towers is None:
            small = CLIPVisionCfg(hidden=128, intermediate=256, layers=2,
                                  heads=4, image_size=224, patch=32,
                                  proj_dim=128)
            towers = [CLIPVisionTower(small, seed=s) for s in range(3)]
        self.towers = list(towers)

    # DreamSim's CLIP backbones embed without the projection head (the
    # ensemble concatenates 768-d hidden CLS states); proj converts to
    # identity when absent from the state dict, preserving that behaviour.
    CLIP_B32 = CLIPVisionCfg(hidden=768, intermediate=3072, layers=12,
                             heads=12, image_size=224, patch=32, proj_dim=768,
                             quick_gelu=True)
    OPEN_CLIP_B32 = dataclasses.replace(CLIP_B32, quick_gelu=False)

    @classmethod
    def real_ensemble(cls, dino_params=None, clip_params=None,
                      open_clip_params=None) -> "DreamSim":
        """The released DreamSim backbone set at full dims. ``*_params`` are
        converted flax trees (None -> random init at the real dims)."""
        return cls([DINOTower(DINOCfg(), params=dino_params),
                    CLIPVisionTower(cls.CLIP_B32, params=clip_params, seed=1),
                    CLIPVisionTower(cls.OPEN_CLIP_B32,
                                    params=open_clip_params, seed=2)])

    @classmethod
    def from_params(cls, specs: Sequence[dict]) -> "DreamSim":
        """Build from serialised tower specs: each is ``{"kind": "dino" |
        "clip", "cfg": {...dataclass fields...}, "params": flax tree}``."""
        towers = []
        for s in specs:
            if s["kind"] == "dino":
                towers.append(DINOTower(DINOCfg(**s.get("cfg", {})),
                                        params=s["params"]))
            else:
                towers.append(CLIPVisionTower(CLIPVisionCfg(**s.get("cfg", {})),
                                              params=s["params"]))
        return cls(towers)

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
