"""Positional / Fourier embedding ops (pure JAX, jit-friendly, static shapes).

Reproduces the reference's embedding math:
- :func:`frequency_embed`   <- FrequencyPositionalEmbedding (model/Pcd_motion.py:16-107)
- :func:`point_embed_basis` <- PointEmbed sin/cos basis (model/Pcd_motion.py:157-187)
- :func:`video_pos_embed`   <- generate_pos_embed 3D Fourier grid (model/Pcd_motion.py:230-266)
- :func:`resize_pos_embed`  <- trilinear re-interpolation for variable T/H/W
  (model/Pcd_motion.py:221-228), which lets checkpoints trained at T=12 run at T=256.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "frequency_embed",
    "point_embed_basis",
    "apply_point_basis",
    "video_pos_embed",
    "resize_pos_embed",
    "sinusoidal_time_embed",
]


def frequency_embed(x: jax.Array, num_freqs: int = 6, logspace: bool = True,
                    include_input: bool = True, include_pi: bool = True) -> jax.Array:
    """Per-dimension sin/cos frequency embedding.

    ``x[..., i] -> [x_i?, sin(f_0 x_i)...sin(f_{N-1} x_i), cos(f_0 x_i)...]``
    with frequencies ``f_j = 2^j`` (logspace) or linspace(1, 2^{N-1}), optionally
    scaled by pi. Output dim = ``D * (2*num_freqs + include_input)``.
    """
    if num_freqs <= 0:
        return x
    if logspace:
        freqs = 2.0 ** np.arange(num_freqs, dtype=np.float32)
    else:
        freqs = np.linspace(1.0, 2.0 ** (num_freqs - 1), num_freqs, dtype=np.float32)
    if include_pi:
        freqs = freqs * np.pi
    freqs = jnp.asarray(freqs, dtype=x.dtype)
    emb = (x[..., None] * freqs).reshape(*x.shape[:-1], -1)
    parts = ([x] if include_input else []) + [jnp.sin(emb), jnp.cos(emb)]
    return jnp.concatenate(parts, axis=-1)


def point_embed_basis(hidden_dim: int = 48) -> np.ndarray:
    """Block-diagonal 3D Fourier basis, shape ``(3, hidden_dim // 2)``.

    Row i carries frequencies ``pi * 2^j`` for coordinate i in its own block of
    columns and zeros elsewhere, so ``xyz @ basis`` gives per-axis projections.
    """
    assert hidden_dim % 6 == 0
    n = hidden_dim // 6
    e = (2.0 ** np.arange(n, dtype=np.float32)) * np.pi
    basis = np.zeros((3, 3 * n), dtype=np.float32)
    for i in range(3):
        basis[i, i * n:(i + 1) * n] = e
    return basis


def apply_point_basis(points: jax.Array, basis: jax.Array) -> jax.Array:
    """``(..., 3)`` points -> ``(..., hidden_dim + 3)`` [sin, cos, xyz] features."""
    proj = points @ basis.astype(points.dtype)
    return jnp.concatenate([jnp.sin(proj), jnp.cos(proj), points], axis=-1)


def video_pos_embed(t: int, h: int, w: int, embed_dim: int) -> np.ndarray:
    """3D Fourier positional embedding over a (T, H, W) latent grid.

    Coordinates are normalised to [-1, 1] per axis (0 for singleton axes), then
    mapped through ``embed_dim // 6`` octave frequencies ``2^linspace(0, 7)``
    with sin and cos. Returns ``(1, T*H*W, embed_dim)`` float32 (host numpy —
    this is a constant, computed once at model build).
    """
    def axis(n):
        a = np.arange(n, dtype=np.float32)
        return 2 * (a / (n - 1)) - 1 if n > 1 else np.zeros(1, dtype=np.float32)

    tt, hh, ww = np.meshgrid(axis(t), axis(h), axis(w), indexing="ij")
    pos = np.stack([tt, hh, ww], axis=-1)  # (T,H,W,3)
    freq = (2.0 ** np.linspace(0.0, 7.0, embed_dim // 6)).astype(np.float32)
    ang = pos[..., None] * freq  # (T,H,W,3,embed_dim//6)
    emb = np.concatenate([np.sin(ang), np.cos(ang)], axis=-1)
    return emb.reshape(1, t * h * w, embed_dim).astype(np.float32)


def resize_pos_embed(pos: jax.Array, src_shape: tuple[int, int, int],
                     target_shape: tuple[int, int, int]) -> jax.Array:
    """Trilinearly resample a ``(1, T*H*W, C)`` pos-embed to a new (T, H, W) grid.

    Matches torch ``F.interpolate(mode='trilinear', align_corners=False)``
    (jax.image.resize 'linear' uses the same half-pixel-center convention).
    """
    c = pos.shape[-1]
    grid = pos.reshape(1, *src_shape, c)
    # antialias=False: plain trilinear taps, matching torch's interpolate even
    # when downsampling.
    out = jax.image.resize(grid, (1, *target_shape, c), method="linear",
                           antialias=False)
    return out.reshape(1, target_shape[0] * target_shape[1] * target_shape[2], c)


def sinusoidal_time_embed(num_frames: int, embed_dim: int) -> np.ndarray:
    """Classic transformer sin/cos time embedding ``(T, C)`` (host constant)."""
    position = np.arange(num_frames, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, embed_dim, 2, dtype=np.float32)
                 * (-math.log(10000.0) / embed_dim))
    pe = np.zeros((num_frames, embed_dim), dtype=np.float32)
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div)
    return pe
