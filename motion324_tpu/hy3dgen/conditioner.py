"""Shape-generation image conditioners: single-view, multiview, and dual.

TPU-native counterparts of the reference's conditioner stack (reference:
scripts/hy3dgen/shapegen/models/conditioner.py):

- :class:`DinoConditioner`        — frozen DINOv2 ViT, ``last_hidden_state``
  with the CLS token kept (``ImageEncoder``/``DinoImageEncoder``, :58-133);
- :class:`DinoConditionerMV`      — the multiview variant: each of up to
  ``view_num`` views is encoded independently, a deterministic 1-D sincos
  VIEW embedding (indexed by the view's canonical slot front/left/back/right)
  is added to every token of that view, and the per-view token streams are
  concatenated (``DinoImageEncoderMV``, :134-200);
- :class:`SingleImageEncoder` / :class:`DualImageEncoder` — wrappers that
  return ``{'main': ...}`` / ``{'main': ..., 'additional': ...}`` cond dicts
  (:214-257). The DiT consumes ``main``; ``additional`` exists for the legacy
  dual-guidance CFG (pipelines.py:618-624).

The unconditional embedding is zeros of the conditional shape in every
variant (conditioner.py:107-115,191-200) — callers build it with
``jnp.zeros_like``.

TPU-first notes: views fold into the batch axis for the ViT forward (one
large batched program instead of a per-view loop), and the view embedding is
a constant table gathered by an integer index array, so arbitrary view
subsets/orders stay jit-static in shape.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from motion324_tpu.models.dinov2 import DinoViT

__all__ = ["get_1d_sincos_pos_embed", "DinoConditioner", "DinoConditionerMV",
           "SingleImageEncoder", "DualImageEncoder", "VIEW_SLOTS"]

# canonical multiview slot order (reference preprocessors.py:128-133)
VIEW_SLOTS = {"front": 0, "left": 1, "back": 2, "right": 3}


def get_1d_sincos_pos_embed(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    """1-D sin/cos position table (reference conditioner.py:37-55).

    ``pos`` (M,) -> (M, embed_dim): first half sin, second half cos of
    ``pos / 10000^(2i/d)``.
    """
    assert embed_dim % 2 == 0
    omega = np.arange(embed_dim // 2, dtype=np.float64)
    omega /= embed_dim / 2.0
    omega = 1.0 / 10000 ** omega
    out = np.einsum("m,d->md", np.asarray(pos, np.float64).reshape(-1), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


class DinoConditioner(nn.Module):
    """Frozen DINOv2 conditioner returning [CLS | patch] tokens.

    Matches the reference's ``DinoImageEncoder`` with ``use_cls_token=True``
    (conditioner.py:76-106): token count = 1 + (H/14)*(W/14).
    """

    embed_dim: int = 1536
    depth: int = 24
    num_heads: int = 24
    patch_size: int = 14
    native_grid: int = 37
    mlp_type: str = "swiglu"
    dtype: Any = jnp.float32

    def setup(self):
        self.dino = DinoViT(embed_dim=self.embed_dim, depth=self.depth,
                            num_heads=self.num_heads,
                            patch_size=self.patch_size,
                            native_grid=self.native_grid,
                            mlp_type=self.mlp_type, keep_cls=True,
                            dtype=self.dtype, name="dino")

    def __call__(self, images):
        """images (B, H, W, 3) in [0, 1] -> (B, 1+P, C)."""
        return self.dino(images)


class DinoConditionerMV(nn.Module):
    """Multiview DINOv2 conditioner with per-view 1-D sincos embeddings.

    Equivalent of the reference's ``DinoImageEncoderMV``
    (conditioner.py:134-200): the ViT encodes every view, a per-SLOT view
    embedding (broadcast over that view's tokens, CLS included) is added,
    and views concatenate along the token axis.
    """

    embed_dim: int = 1536
    depth: int = 24
    num_heads: int = 24
    patch_size: int = 14
    native_grid: int = 37
    mlp_type: str = "swiglu"
    view_num: int = 4
    dtype: Any = jnp.float32

    def setup(self):
        self.dino = DinoViT(embed_dim=self.embed_dim, depth=self.depth,
                            num_heads=self.num_heads,
                            patch_size=self.patch_size,
                            native_grid=self.native_grid,
                            mlp_type=self.mlp_type, keep_cls=True,
                            dtype=self.dtype, name="dino")

    def __call__(self, images, view_idxs=None):
        """images (B, V, H, W, 3) in [0, 1]; ``view_idxs`` (B, V) int canonical
        slots (defaults to 0..V-1). Returns (B, V*(1+P), C)."""
        b, v, h, w, c = images.shape
        tokens = self.dino(images.reshape(b * v, h, w, c))
        p = tokens.shape[1]
        tokens = tokens.reshape(b, v, p, self.embed_dim)

        table = jnp.asarray(get_1d_sincos_pos_embed(
            self.embed_dim, np.arange(self.view_num, dtype=np.float32)),
            tokens.dtype)                       # (view_num, C) constant
        if view_idxs is None:
            view_idxs = jnp.broadcast_to(jnp.arange(v, dtype=jnp.int32),
                                         (b, v))
        view_emb = table[view_idxs]             # (B, V, C)
        tokens = tokens + view_emb[:, :, None, :]
        return tokens.reshape(b, v * p, self.embed_dim)


class SingleImageEncoder:
    """``{'main': encoder(...)}`` wrapper (reference conditioner.py:240-257)."""

    def __init__(self, main_image_encoder: nn.Module):
        self.main = main_image_encoder

    def apply(self, params, images, **kw):
        return {"main": self.main.apply(params["main"], images, **kw)}

    def init(self, rng, images, **kw):
        return {"main": self.main.init(rng, images, **kw)}

    def unconditional(self, cond: dict) -> dict:
        return {"main": jnp.zeros_like(cond["main"])}


class DualImageEncoder:
    """``{'main', 'additional'}`` wrapper (reference conditioner.py:214-238).

    ``main`` feeds the DiT; ``additional`` supports the legacy dual-guidance
    CFG where the no-drop / drop-main / all-drop triple is sampled together
    (reference pipelines.py:419-448,618-624).
    """

    def __init__(self, main_image_encoder: nn.Module,
                 additional_image_encoder: nn.Module):
        self.main = main_image_encoder
        self.additional = additional_image_encoder

    def apply(self, params, images, **kw):
        return {"main": self.main.apply(params["main"], images, **kw),
                "additional": self.additional.apply(params["additional"],
                                                    images, **kw)}

    def init(self, rngs, images, **kw):
        import jax
        r1, r2 = jax.random.split(rngs)
        return {"main": self.main.init(r1, images, **kw),
                "additional": self.additional.init(r2, images, **kw)}

    def unconditional(self, cond: dict) -> dict:
        return {k: jnp.zeros_like(v) for k, v in cond.items()}
