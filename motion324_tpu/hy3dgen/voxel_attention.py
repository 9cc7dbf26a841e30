"""Voxel-locality attention masks / indices for turbo multiview attention.

Pure-JAX port of the reference's turbo-mode spatial sparsification
(reference: scripts/hy3dgen/texgen/hunyuanpaint/unet/modules.py:302-402):
position maps are pooled into per-cell mean 3D positions, and

- :func:`voxel_grid_mask` marks pairs of cells (across all views) whose mean
  positions lie within one voxel diagonal — the attention mask that restricts
  multiview attention to spatially-near tokens;
- :func:`discrete_voxel_indices` quantises cell positions onto an integer
  voxel grid (used to bucket tokens for sparse attention kernels).

Multi-resolution wrappers key the outputs by token count, exactly as the
reference's dicts are keyed for lookup inside the UNet blocks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["voxel_grid_mask", "multi_resolution_mask",
           "voxel_positions", "multi_resolution_positions",
           "discrete_voxel_indices", "multi_resolution_voxel_indices",
           "ImplicitVoxelMask"]


@jax.tree_util.register_pytree_node_class
class ImplicitVoxelMask:
    """``(positions, radius)`` pair whose radius stays STATIC under jit.

    The radius is a pure function of the grid resolution (``1.73 / g``), so
    it must reach the Pallas kernel as a compile-time constant; as a plain
    tuple leaf it would be traced when the mask dict crosses a ``jax.jit``
    boundary and ``float(radius)`` would fail. Registering radius as pytree
    aux-data keeps it static (one compile per grid resolution, of which
    there are three). Supports tuple-style ``positions, radius = mask``
    unpacking.
    """

    def __init__(self, positions, radius: float):
        self.positions = positions
        self.radius = float(radius)

    def tree_flatten(self):
        return (self.positions,), self.radius

    @classmethod
    def tree_unflatten(cls, radius, children):
        return cls(children[0], radius)

    def __iter__(self):
        return iter((self.positions, self.radius))


def _cell_means(position, grid_resolution: int):
    """position (B, N, H, W, 3) in [0,1], background == 1 -> per-cell means
    ``(B, N, G, G, 3)`` with low-support cells zeroed (min 5 valid pixels)."""
    b, n, h, w, _ = position.shape
    g = grid_resolution
    valid = jnp.all(position != 1.0, axis=-1, keepdims=True)  # (B,N,H,W,1)
    pos = jnp.where(valid, position, 0.0)

    pos = pos.reshape(b, n, g, h // g, g, w // g, 3)
    val = valid.reshape(b, n, g, h // g, g, w // g, 1)
    summed = pos.sum(axis=(3, 5))            # (B,N,G,G,3)
    count = val.sum(axis=(3, 5))             # (B,N,G,G,1)
    mean = summed / jnp.maximum(count, 1)
    return jnp.where(count >= 5, mean, 0.0), count


def voxel_grid_mask(position, grid_resolution: int = 8):
    """(B, N, H, W, 3) position maps -> (B, N*L, N*L) boolean attention mask
    (L = grid_resolution^2), True where cell centers are within one cell
    diagonal ``1.73 / grid_resolution``."""
    b, n = position.shape[:2]
    mean, _ = _cell_means(position, grid_resolution)
    cells = mean.reshape(b, n, grid_resolution ** 2, 3)  # (B,N,L,3)
    a = cells[:, :, None, :, None, :]
    c = cells[:, None, :, None, :, :]
    dist = jnp.linalg.norm(a - c, axis=-1)  # (B,N,N,L,L)
    mask = dist < (1.73 / grid_resolution)
    l = grid_resolution ** 2
    return mask.transpose(0, 1, 3, 2, 4).reshape(b, n * l, n * l)


def multi_resolution_mask(position_maps, grid_resolutions=(32, 16, 8)):
    """Dict keyed by token count -> (B, T, T) masks (reference :350-358)."""
    out = {}
    for g in grid_resolutions:
        m = voxel_grid_mask(position_maps, g)
        out[m.shape[1]] = m
    return out


def voxel_positions(position, grid_resolution: int = 8):
    """(B, N, H, W, 3) position maps -> ((B, N*L, 3) cell means, radius).

    The IMPLICIT form of :func:`voxel_grid_mask`: the mask is exactly
    ``||p_i - p_j|| < radius`` over these per-token positions, evaluated
    tile-by-tile inside :func:`motion324_tpu.ops.masked_attention.
    masked_flash_attention` instead of materialising (S, S).
    """
    b, n = position.shape[:2]
    g = grid_resolution
    mean, _ = _cell_means(position, g)
    return mean.reshape(b, n * g * g, 3), 1.73 / g


def multi_resolution_positions(position_maps, grid_resolutions=(32, 16, 8)):
    """Dict keyed by joint token count -> (positions, radius) tuples, the
    kernel-friendly equivalent of :func:`multi_resolution_mask`."""
    out = {}
    for g in grid_resolutions:
        pos, radius = voxel_positions(position_maps, g)
        out[pos.shape[1]] = ImplicitVoxelMask(pos, radius)
    return out


def discrete_voxel_indices(position, grid_resolution: int = 8,
                           voxel_resolution: int = 128):
    """(B, N, H, W, 3) -> (B, N*L, 3) integer voxel coordinates."""
    b, n = position.shape[:2]
    mean, _ = _cell_means(position, grid_resolution)
    mean = jnp.clip(mean, 0.0, 1.0)
    idx = jnp.round(mean * (voxel_resolution - 1)).astype(jnp.int32)
    return idx.reshape(b, n * grid_resolution ** 2, 3)


def multi_resolution_voxel_indices(position_maps,
                                   grid_resolutions=(64, 32, 16, 8),
                                   voxel_resolutions=(512, 256, 128, 64)):
    out = {}
    for g, v in zip(grid_resolutions, voxel_resolutions):
        idx = discrete_voxel_indices(position_maps, g, v)
        out[idx.shape[1]] = {"voxel_indices": idx, "voxel_resolution": v}
    return out
