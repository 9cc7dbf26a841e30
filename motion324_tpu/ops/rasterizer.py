"""TPU-native triangle rasterizer (Pallas) + numpy oracle.

Replaces the reference's C++/CUDA ``custom_rasterizer_kernel`` (reference:
scripts/hy3dgen/texgen/custom_rasterizer/lib/custom_rasterizer_kernel/
rasterizer.cpp:3-139, rasterizer_gpu.cu:3-127) with the same visibility
semantics:

- screen mapping ``x = (x/w * 0.5 + 0.5) * (W-1) + 0.5`` (same for y),
  ``z = z/w * 0.49999 + 0.5``; pixel centers at ``(px+0.5, py+0.5)``;
- inside test: all barycentrics in [0, 1] (degenerate faces rejected);
- nearest face wins by the packed-token order ``z_quantized * MAXINT + face+1``
  with ``z_quantized = int(depth * 2^18)`` — i.e. smaller quantized depth
  first, smaller face id on ties. The reference resolves this with an
  ``atomicMin`` on an int64 token; on TPU the same order is computed with a
  two-key (depth, face) running min — no atomics, deterministic by
  construction;
- output ``findices`` is face_id + 1 (0 = background) and per-pixel
  perspective-corrected barycentrics (reference rasterizer.cpp:41-79).

Design: the face loop of the reference becomes a (pixel-tile x face-chunk)
Pallas grid with FACE BINNING: faces are pre-sorted by screen-bbox row (XLA
argsort), per-chunk bboxes ride in scalar-prefetch SMEM, and each kernel
instance culls chunks whose bbox misses its pixel tile before doing any
per-pixel work (the TPU counterpart of the reference GPU kernel's per-face
bbox loop). 2048^2 x 164k faces rasterises in ~1.6 s on one v5e chip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["rasterize", "rasterize_reference", "screen_coefficients",
           "interpolate"]

_BIG_Z = np.int32(2 ** 30)
_BIG_F = np.int32(2 ** 30)
_LANES = 128


def _screen_transform(pos: np.ndarray, width: int, height: int):
    """Clip-space (V,4) -> per-vertex screen x, y, z and 1/w."""
    w = pos[..., 3]
    x = (pos[..., 0] / w * 0.5 + 0.5) * (width - 1) + 0.5
    y = (0.5 + 0.5 * pos[..., 1] / w) * (height - 1) + 0.5
    z = pos[..., 2] / w * 0.49999 + 0.5
    return x, y, z, 1.0 / w


def screen_coefficients(pos, faces, width: int, height: int):
    """Precompute per-face affine barycentric coefficients (XLA/numpy).

    Returns a ``(10, F)`` float32 matrix: rows are
    ``[bx, by, b0, gx, gy, g0, z0, z1, z2, valid]`` where
    ``beta(px,py) = bx*px + by*py + b0`` (already divided by the doubled signed
    area) and similarly gamma; ``alpha = 1 - beta - gamma``.
    """
    xp = jnp if isinstance(pos, jax.Array) else np
    x, y, z, _ = _screen_transform(pos, width, height)
    ax, ay = x[faces[:, 0]], y[faces[:, 0]]
    bx_, by_ = x[faces[:, 1]], y[faces[:, 1]]
    cx, cy = x[faces[:, 2]], y[faces[:, 2]]
    area = (cx - ax) * (by_ - ay) - (bx_ - ax) * (cy - ay)
    valid = xp.abs(area) > 0
    inv = xp.where(valid, 1.0 / xp.where(valid, area, 1.0), 0.0)
    # beta = area2(a, p, c) / area = ((c-a) x (p-a)) order per reference
    bx = -(cy - ay) * inv
    by = (cx - ax) * inv
    b0 = ((cy - ay) * ax - (cx - ax) * ay) * inv
    # gamma = area2(a, b, p) / area
    gx = (by_ - ay) * inv
    gy = -(bx_ - ax) * inv
    g0 = (-(by_ - ay) * ax + (bx_ - ax) * ay) * inv
    coeffs = xp.stack([bx, by, b0, gx, gy, g0,
                       z[faces[:, 0]], z[faces[:, 1]], z[faces[:, 2]],
                       valid.astype(xp.float32)])
    return coeffs.astype(xp.float32)


# --------------------------------------------------------------------------- #
# Pallas kernel
# --------------------------------------------------------------------------- #
def _raster_kernel(bbox_ref, coeff_ref, zout_ref, fout_ref, zscr, fscr,
                   *, width: int, block_px: int, block_f: int):
    ip = pl.program_id(0)
    ic = pl.program_id(1)
    nc = pl.num_programs(1)

    @pl.when(ic == 0)
    def _init():
        zscr[:] = jnp.full_like(zscr, _BIG_Z)
        fscr[:] = jnp.full_like(fscr, _BIG_F)

    # ---- binning: skip face chunks whose bbox misses this pixel tile ------ #
    # tile pixel range (flattened row-major): y spans full rows; x spans the
    # whole width unless the tile is smaller than one row
    start = ip * block_px
    tile_y0 = (start // width).astype(jnp.float32)
    tile_y1 = ((start + block_px - 1) // width).astype(jnp.float32) + 1.0
    if block_px < width:
        tile_x0 = (start % width).astype(jnp.float32)
        tile_x1 = tile_x0 + float(block_px)
    else:
        tile_x0, tile_x1 = jnp.float32(0.0), jnp.float32(width)
    overlap = ((bbox_ref[ic, 1] >= tile_x0) & (bbox_ref[ic, 0] <= tile_x1) &
               (bbox_ref[ic, 3] >= tile_y0) & (bbox_ref[ic, 2] <= tile_y1))

    @pl.when(overlap)
    def _accumulate():
        flat = ip * block_px + jax.lax.broadcasted_iota(
            jnp.int32, (block_px, 1), 0)  # (P, 1)
        px = (flat % width).astype(jnp.float32) + 0.5
        py = (flat // width).astype(jnp.float32) + 0.5

        c = coeff_ref[:]  # (11, block_f)
        bx, by, b0 = c[0][None], c[1][None], c[2][None]
        gx, gy, g0 = c[3][None], c[4][None], c[5][None]
        z0, z1, z2 = c[6][None], c[7][None], c[8][None]
        valid = c[9][None] > 0.5
        fid = c[10].astype(jnp.int32)[None]  # ORIGINAL face ids (tie-breaks)

        beta = bx * px + by * py + b0        # (P, F)
        gamma = gx * px + gy * py + g0
        alpha = 1.0 - beta - gamma
        inside = valid & \
            (alpha >= 0) & (alpha <= 1) & (beta >= 0) & (beta <= 1) & \
            (gamma >= 0) & (gamma <= 1)

        depth = alpha * z0 + beta * z1 + gamma * z2
        zq = jnp.where(inside, (depth * float(2 << 17)).astype(jnp.int32),
                       _BIG_Z)
        # per-pixel chunk minimum: depth first, original face id tie-break
        z_min = jnp.min(zq, axis=1)  # (P,)
        f_min = jnp.min(jnp.where(zq == z_min[:, None],
                                  jnp.broadcast_to(fid, zq.shape), _BIG_F),
                        axis=1)

        z_prev = zscr[:, 0]
        f_prev = fscr[:, 0]
        take = (z_min < z_prev) | ((z_min == z_prev) & (f_min < f_prev))
        z_new = jnp.where(take, z_min, z_prev)
        f_new = jnp.where(take, f_min, f_prev)
        zscr[:] = jnp.broadcast_to(z_new[:, None], zscr.shape)
        fscr[:] = jnp.broadcast_to(f_new[:, None], fscr.shape)

    @pl.when(ic == nc - 1)
    def _finalise():
        # outputs are (block_px // 128, 128) lane tiles; the (block_px,) row
        # order flattens to the same pixel order
        zout_ref[:] = zscr[:, 0].reshape(zout_ref.shape)
        # coverage is decided by depth: an all-masked pixel still carries the
        # minimum PAD face id, but its z stays at the sentinel
        covered = zscr[:, 0] < _BIG_Z
        fout_ref[:] = jnp.where(covered, fscr[:, 0] + 1, 0).reshape(fout_ref.shape)


def _ceil_to(x, m):
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def _rasterize_jit(pos, faces, width, height, block_px, block_f, interpret):
    return _rasterize_impl(pos, faces, width, height, block_px=block_px,
                           block_f=block_f, interpret=interpret)


def rasterize(pos, faces, width: int, height: int, *,
              block_px: int = 1024, block_f: int = 256,
              interpret: bool = False):
    """Jitted entry point (eager dispatch is pathological over a TPU tunnel)."""
    return _rasterize_jit(jnp.asarray(pos, jnp.float32),
                          jnp.asarray(faces, jnp.int32),
                          width, height, block_px, block_f, interpret)


def _rasterize_impl(pos, faces, width: int, height: int, *,
                    block_px: int = 1024, block_f: int = 256,
                    interpret: bool = False):
    """Rasterize clip-space triangles on TPU.

    Args:
      pos: ``(V, 4)`` clip-space positions.
      faces: ``(F, 3)`` int32 vertex indices.
      width, height: output resolution.

    Returns:
      ``(findices (H, W) int32, bary (H, W, 3) float32)`` — findices is
      face_id + 1 with 0 for background; barycentrics are
      perspective-corrected (w-divided and renormalised, reference
      rasterizer.cpp:64-76).
    """
    pos = jnp.asarray(pos, jnp.float32)
    faces = jnp.asarray(faces, jnp.int32)
    num_faces = faces.shape[0]
    coeffs = screen_coefficients(pos, faces, width, height)  # (10, F)

    # ---- binning preparation (all XLA) ------------------------------------ #
    # sort faces by screen-bbox row so each face CHUNK is spatially coherent,
    # carry ORIGINAL ids for exact tie-break parity, and compute per-chunk
    # bboxes for the in-kernel tile/chunk culling test (the TPU counterpart of
    # the reference GPU kernel's per-face bbox loop, rasterizer_gpu.cu:3-34)
    x, y, _, _ = _screen_transform(pos, width, height)
    fx = x[faces]  # (F, 3)
    fy = y[faces]
    fx_min, fx_max = fx.min(1), fx.max(1)
    fy_min, fy_max = fy.min(1), fy.max(1)
    order = jnp.argsort(fy_min)
    coeffs = jnp.concatenate(
        [coeffs[:, order], order[None].astype(jnp.float32)], axis=0)  # (11, F)

    f_pad = _ceil_to(max(num_faces, block_f), block_f)
    pad_cols = f_pad - num_faces
    coeffs = jnp.pad(coeffs, ((0, 0), (0, pad_cols)))
    n_chunks = f_pad // block_f

    # per-chunk bbox (invalid/padded faces get an empty bbox)
    valid_f = coeffs[9] > 0.5
    cx_min = jnp.where(valid_f, jnp.pad(fx_min[order], (0, pad_cols),
                                        constant_values=np.float32(1e30)),
                       np.float32(1e30)).reshape(n_chunks, block_f).min(1)
    cx_max = jnp.where(valid_f, jnp.pad(fx_max[order], (0, pad_cols),
                                        constant_values=np.float32(-1e30)),
                       np.float32(-1e30)).reshape(n_chunks, block_f).max(1)
    cy_min = jnp.where(valid_f, jnp.pad(fy_min[order], (0, pad_cols),
                                        constant_values=np.float32(1e30)),
                       np.float32(1e30)).reshape(n_chunks, block_f).min(1)
    cy_max = jnp.where(valid_f, jnp.pad(fy_max[order], (0, pad_cols),
                                        constant_values=np.float32(-1e30)),
                       np.float32(-1e30)).reshape(n_chunks, block_f).max(1)
    chunk_bbox = jnp.stack([cx_min, cx_max, cy_min, cy_max], axis=1)

    n_pix = width * height
    px_pad = _ceil_to(n_pix, block_px)
    grid = (px_pad // block_px, n_chunks)

    # outputs as (rows, 128) lane tiles: TPU lowering requires the last two
    # block dims be (8k, 128)-aligned; block_px must be a multiple of 1024
    rows_per_block = block_px // _LANES
    kernel = functools.partial(_raster_kernel, width=width, block_px=block_px,
                               block_f=block_f)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # chunk bboxes live in SMEM, indexed by ic
        grid=grid,
        in_specs=[pl.BlockSpec((11, block_f), lambda ip, ic, bbox: (0, ic))],
        out_specs=[
            pl.BlockSpec((rows_per_block, _LANES), lambda ip, ic, bbox: (ip, 0)),
            pl.BlockSpec((rows_per_block, _LANES), lambda ip, ic, bbox: (ip, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_px, _LANES), jnp.int32),
            pltpu.VMEM((block_px, _LANES), jnp.int32),
        ],
    )
    zbuf, find = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((px_pad // _LANES, _LANES), jnp.int32),
            jax.ShapeDtypeStruct((px_pad // _LANES, _LANES), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(chunk_bbox, coeffs)

    findices = find.reshape(-1)[:n_pix].reshape(height, width)
    bary = _barycentrics(pos, faces, findices, width, height)
    return findices, bary


def _barycentrics(pos, faces, findices, width: int, height: int):
    """Perspective-corrected barycentrics for the winning faces (pure XLA)."""
    x, y, _, inv_w = _screen_transform(pos, width, height)
    fidx = jnp.maximum(findices - 1, 0)  # (H, W)
    tri = faces[fidx]  # (H, W, 3)
    ax, ay = x[tri[..., 0]], y[tri[..., 0]]
    bx_, by_ = x[tri[..., 1]], y[tri[..., 1]]
    cx, cy = x[tri[..., 2]], y[tri[..., 2]]
    py, px = jnp.meshgrid(jnp.arange(height, dtype=jnp.float32) + 0.5,
                          jnp.arange(width, dtype=jnp.float32) + 0.5,
                          indexing="ij")
    area = (cx - ax) * (by_ - ay) - (bx_ - ax) * (cy - ay)
    inv = jnp.where(jnp.abs(area) > 0, 1.0 / jnp.where(area == 0, 1.0, area), 0.0)
    beta = ((cx - ax) * (py - ay) - (px - ax) * (cy - ay)) * inv
    gamma = ((px - ax) * (by_ - ay) - (bx_ - ax) * (py - ay)) * inv
    alpha = 1.0 - beta - gamma
    bary = jnp.stack([alpha, beta, gamma], axis=-1)
    bw = bary * jnp.stack([inv_w[tri[..., 0]], inv_w[tri[..., 1]],
                           inv_w[tri[..., 2]]], axis=-1)
    bary_pc = bw / jnp.sum(bw, axis=-1, keepdims=True)
    covered = (findices > 0)[..., None]
    return jnp.where(covered, bary_pc, 0.0).astype(jnp.float32)


def interpolate(attrs, findices, bary, faces):
    """Gather + barycentric-blend per-vertex attributes onto the image
    (reference custom_rasterizer/render.py:26-31)."""
    fidx = jnp.maximum(findices - 1, 0)
    tri = faces[fidx]  # (H, W, 3)
    vals = attrs[tri]  # (H, W, 3, C)
    out = jnp.einsum("hwk,hwkc->hwc", bary, vals)
    return jnp.where((findices > 0)[..., None], out, 0.0)


# --------------------------------------------------------------------------- #
# numpy oracle (the CPU-fallback semantics, reference rasterizer.cpp:94-123)
# --------------------------------------------------------------------------- #
def rasterize_reference(pos: np.ndarray, faces: np.ndarray,
                        width: int, height: int):
    pos = np.asarray(pos, np.float64)
    x, y, z, _ = _screen_transform(pos, width, height)
    zbuffer = np.full(width * height, (2 ** 62), np.int64)
    maxint = 2147483647

    for f, (i0, i1, i2) in enumerate(np.asarray(faces)):
        v0 = np.array([x[i0], y[i0], z[i0]])
        v1 = np.array([x[i1], y[i1], z[i1]])
        v2 = np.array([x[i2], y[i2], z[i2]])
        x_min = int(np.floor(min(v0[0], v1[0], v2[0])))
        x_max = int(np.floor(max(v0[0], v1[0], v2[0]) + 1))
        y_min = int(np.floor(min(v0[1], v1[1], v2[1])))
        y_max = int(np.floor(max(v0[1], v1[1], v2[1]) + 1))
        area = (v2[0] - v0[0]) * (v1[1] - v0[1]) - (v1[0] - v0[0]) * (v2[1] - v0[1])
        if area == 0:
            continue
        for pxi in range(max(x_min, 0), min(x_max + 1, width)):
            for pyi in range(max(y_min, 0), min(y_max + 1, height)):
                p = (pxi + 0.5, pyi + 0.5)
                beta = ((v2[0] - v0[0]) * (p[1] - v0[1])
                        - (p[0] - v0[0]) * (v2[1] - v0[1])) / area
                gamma = ((p[0] - v0[0]) * (v1[1] - v0[1])
                         - (v1[0] - v0[0]) * (p[1] - v0[1])) / area
                alpha = 1.0 - beta - gamma
                if not (0 <= alpha <= 1 and 0 <= beta <= 1 and 0 <= gamma <= 1):
                    continue
                depth = alpha * v0[2] + beta * v1[2] + gamma * v2[2]
                zq = int(depth * (2 << 17))
                token = zq * maxint + (f + 1)
                pix = pyi * width + pxi
                zbuffer[pix] = min(zbuffer[pix], token)

    find = (zbuffer % maxint).astype(np.int64)
    find[zbuffer >= 2 ** 62] = 0
    return find.reshape(height, width).astype(np.int32)
