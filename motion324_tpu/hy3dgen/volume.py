"""Volume decoding: dense occupancy-grid evaluation of the ShapeVAE decoder.

Reproduces the reference's ``VanillaVolumeDecoder`` (reference:
scripts/hy3dgen/shapegen/models/autoencoders/volume_decoders.py:141-182):
an ``(R+1)^3`` grid over the bounding box is scored in fixed-size chunks.
TPU-first differences: chunks are a static shape (one compiled program reused
for every chunk via ``lax.map``), and the whole sweep runs inside one jit.
A coarse-to-fine (hierarchical) decode evaluates a low-res grid first and only
refines cells near the surface (reference HierarchicalVolumeDecoding
:185-277), cutting queries by ~an order of magnitude.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["make_grid", "decode_volume", "decode_volume_hierarchical",
           "decode_volume_flashvdm"]


def make_grid(resolution: int, box_v: float = 1.01) -> np.ndarray:
    """((R+1)^3, 3) query points over ``[-box_v, box_v]^3`` (x-major)."""
    ax = np.linspace(-box_v, box_v, resolution + 1, dtype=np.float32)
    x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
    return np.stack([x, y, z], axis=-1).reshape(-1, 3)


@functools.partial(jax.jit, static_argnums=(0, 4))
def _decode_chunks(query_fn, params, processed_latents, points_padded,
                   chunk: int):
    """points (M, 3) padded to a chunk multiple -> logits (M,).

    ``params`` flows in as an argument — closure capture would embed the VAE
    weights as XLA constants and stall compilation."""
    chunks = points_padded.reshape(-1, chunk, 3)

    def one(pts):
        return query_fn(params, pts[None], processed_latents)[0]

    return jax.lax.map(one, chunks).reshape(-1)


def decode_volume(query_fn, params, processed_latents, resolution: int = 384,
                  box_v: float = 1.01, chunk: int = 8192) -> np.ndarray:
    """Dense grid decode -> (R+1, R+1, R+1) float32 logits.

    ``query_fn(params, points (1, N, 3), latents) -> (1, N)`` is the jittable
    VAE query function.
    """
    pts = make_grid(resolution, box_v)
    n = len(pts)
    pad = (-n) % chunk
    if pad:
        pts = np.concatenate([pts, np.zeros((pad, 3), np.float32)])
    logits = _decode_chunks(query_fn, params, processed_latents,
                            jnp.asarray(pts), chunk)
    r = resolution + 1
    return np.asarray(logits[:n], np.float32).reshape(r, r, r)


def decode_volume_hierarchical(query_fn, params, processed_latents,
                               resolution: int = 384, box_v: float = 1.01,
                               chunk: int = 8192, coarse_factor: int = 4,
                               band: float = 4.0) -> np.ndarray:
    """Coarse-to-fine decode: full grid at ``resolution // coarse_factor``,
    then refinement only inside a band around the coarse iso surface.

    Cells whose coarse |logit| is within ``band`` of the iso level get their
    fine-grid points evaluated; everything else inherits the (upsampled)
    coarse value. Output matches :func:`decode_volume` near the surface, which
    is all marching cubes consumes.
    """
    coarse_res = max(resolution // coarse_factor, 16)
    coarse = decode_volume(query_fn, params, processed_latents, coarse_res,
                           box_v, chunk)

    r = resolution + 1
    # upsample coarse logits to the fine grid (trilinear)
    fine_init = jax.image.resize(jnp.asarray(coarse), (r, r, r),
                                 method="linear", antialias=False)
    fine_init = np.array(fine_init, np.float32)  # writable host copy

    # near-surface selection on the upsampled field itself (no grid-alignment
    # bookkeeping), dilated by one coarse cell of fine voxels
    from scipy.ndimage import binary_dilation
    mask = np.abs(fine_init) < band
    mask = binary_dilation(mask, iterations=coarse_factor)

    idx = np.argwhere(mask)
    if len(idx) == 0:
        return fine_init
    ax = np.linspace(-box_v, box_v, r, dtype=np.float32)
    pts = np.stack([ax[idx[:, 0]], ax[idx[:, 1]], ax[idx[:, 2]]], axis=-1)
    pad = (-len(pts)) % chunk
    pts_p = np.concatenate([pts, np.zeros((pad, 3), np.float32)]) if pad else pts
    logits = np.asarray(_decode_chunks(query_fn, params, processed_latents,
                                       jnp.asarray(pts_p), chunk))[:len(pts)]
    fine_init[idx[:, 0], idx[:, 1], idx[:, 2]] = logits
    return fine_init


def decode_volume_flashvdm(vae, params, processed_latents,
                           resolution: int = 384, box_v: float = 1.01,
                           chunk: int = 8192, coarse_factor: int = 4,
                           band: float = 4.0, topk: int = 64,
                           sort_grid: int = 8) -> np.ndarray:
    """FlashVDM-style decode: hierarchical refinement + grid-sorted top-k.

    TPU-native counterpart of the reference's ``FlashVDMVolumeDecoding``
    (reference: scripts/hy3dgen/shapegen/models/autoencoders/
    volume_decoders.py:280-435 and attention_processors.py:39-71): the coarse
    pass scores a ``resolution // coarse_factor`` grid, near-surface fine
    points are SORTED into ``sort_grid``^3 spatial cells (the reference's
    mini-grid reordering), and each fixed-size chunk — now spatially coherent —
    is scored by :meth:`ShapeVAE.query_topk`, cross-attending only against the
    ``topk`` latents ranked by the chunk's probe queries. Chunks stay a static
    shape so one compiled program serves the whole sweep.

    With ``topk >= num_latents`` this is exactly the hierarchical decode; the
    reference ships top-k at a fraction of the latent set for its turbo mode.
    """
    import functools as _ft

    @_ft.partial(jax.jit, static_argnums=(3,))
    def _topk_chunks(params, lat, pts_padded, chunk):
        chunks = pts_padded.reshape(-1, chunk, 3)

        def one(pts):
            return vae.apply(params, pts[None], lat, topk,
                             method=type(vae).query_topk)[0]

        return jax.lax.map(one, chunks).reshape(-1)

    def query_fn(params, pts, lat):
        return vae.apply(params, pts, lat, method=type(vae).query)

    coarse_res = max(resolution // coarse_factor, 16)
    coarse = decode_volume(query_fn, params, processed_latents, coarse_res,
                           box_v, chunk)
    r = resolution + 1
    fine_init = jax.image.resize(jnp.asarray(coarse), (r, r, r),
                                 method="linear", antialias=False)
    fine_init = np.array(fine_init, np.float32)

    from scipy.ndimage import binary_dilation
    mask = np.abs(fine_init) < band
    mask = binary_dilation(mask, iterations=coarse_factor)
    idx = np.argwhere(mask)
    if len(idx) == 0:
        return fine_init
    # mini-grid reordering: sort near-surface points by spatial cell so each
    # fixed chunk's probes agree on which latents matter
    cell = (idx * sort_grid // r)
    key = (cell[:, 0] * sort_grid + cell[:, 1]) * sort_grid + cell[:, 2]
    order = np.argsort(key, kind="stable")
    idx = idx[order]

    ax = np.linspace(-box_v, box_v, r, dtype=np.float32)
    pts = np.stack([ax[idx[:, 0]], ax[idx[:, 1]], ax[idx[:, 2]]], axis=-1)
    pad = (-len(pts)) % chunk
    pts_p = np.concatenate([pts, np.zeros((pad, 3), np.float32)]) if pad else pts
    logits = np.asarray(_topk_chunks(params, processed_latents,
                                     jnp.asarray(pts_p), chunk))[:len(pts)]
    fine_init[idx[:, 0], idx[:, 1], idx[:, 2]] = logits
    return fine_init
