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


def _flat_to_points(flat_idx, r: int, box_v: float):
    """flat grid indices (int32) -> (..., 3) coordinates, in-graph."""
    x = flat_idx // (r * r)
    y = (flat_idx // r) % r
    z = flat_idx % r
    step = 2.0 * box_v / (r - 1)
    return jnp.stack([x, y, z], axis=-1).astype(jnp.float32) * step - box_v


@functools.partial(jax.jit, static_argnums=(0, 3, 4, 5))
def _decode_grid(query_fn, params, processed_latents, resolution: int,
                 box_v: float, chunk: int):
    """Dense (R+1)^3 sweep with points GENERATED ON DEVICE (uploading a
    host-built 385^3 point grid costs ~680 MB over the link)."""
    r = resolution + 1
    n = r * r * r
    n_chunks = -(-n) // chunk if n % chunk == 0 else (n + chunk - 1) // chunk

    def one(i):
        flat = i * chunk + jnp.arange(chunk, dtype=jnp.int32)
        pts = _flat_to_points(jnp.minimum(flat, n - 1), r, box_v)
        # f16 halves the grid download (228 MB of f32 at 385^3 dominates wall
        # time on tunneled links); logits only feed iso-crossing extraction
        return query_fn(params, pts[None], processed_latents)[0] \
            .astype(jnp.float16)

    return jax.lax.map(one, jnp.arange(n_chunks, dtype=jnp.int32)).reshape(-1)


def decode_volume(query_fn, params, processed_latents, resolution: int = 384,
                  box_v: float = 1.01, chunk: int = 8192) -> np.ndarray:
    """Dense grid decode -> (R+1, R+1, R+1) float32 logits.

    ``query_fn(params, points (1, N, 3), latents) -> (1, N)`` is the jittable
    VAE query function.
    """
    r = resolution + 1
    n = r * r * r
    logits = _decode_grid(query_fn, params, processed_latents, resolution,
                          float(box_v), chunk)
    return np.asarray(logits[:n], np.float32).reshape(r, r, r)




def _dilate(mask: np.ndarray, iterations: int) -> np.ndarray:
    """Cross-structured binary dilation via shifted ORs (equivalent to
    scipy.ndimage.binary_dilation's default, ~5x faster at 385^3 — the scipy
    call was a measurable chunk of FlashVDM wall time)."""
    m = mask
    for _ in range(iterations):
        out = m.copy()
        out[1:] |= m[:-1];  out[:-1] |= m[1:]
        out[:, 1:] |= m[:, :-1];  out[:, :-1] |= m[:, 1:]
        out[:, :, 1:] |= m[:, :, :-1];  out[:, :, :-1] |= m[:, :, 1:]
        m = out
    return m


def _shell_indices_numpy(volume: np.ndarray, band: float, iters: int,
                         sort_grid: int) -> np.ndarray:
    """Numpy reference for :func:`native.shell_indices` (also the fallback):
    flat indices of the dilated ``|v| < band`` shell, stable-sorted by
    ``sort_grid``^3 spatial cell (``sort_grid=1`` = plain argwhere order)."""
    r = volume.shape[0]
    mask = np.abs(volume) < band
    mask = _dilate(mask, iters)
    idx = np.argwhere(mask).astype(np.int32)
    if sort_grid > 1 and len(idx):
        cell = idx * sort_grid // r
        key = (cell[:, 0] * sort_grid + cell[:, 1]) * sort_grid + cell[:, 2]
        idx = idx[np.argsort(key, kind="stable")]
    return ((idx[:, 0].astype(np.int64) * r + idx[:, 1]) * r
            + idx[:, 2]).astype(np.int32)


def _shell_indices(volume: np.ndarray, band: float, iters: int,
                   sort_grid: int) -> np.ndarray:
    from motion324_tpu import native
    out = native.shell_indices(volume, band, iters, sort_grid)
    if out is not None:  # C++: one pass, ~0.5 s at 385^3 (the numpy chain's
        return out       # 57 MB temporaries swing 2.5-6 s under allocator
    return _shell_indices_numpy(volume, band, iters, sort_grid)  # pressure)


def _lerp_last(a: np.ndarray, f: int) -> np.ndarray:
    """Upsample the LAST axis by integer factor ``f`` with edge-aligned
    linear interpolation: n points -> (n-1)*f + 1. Contiguous last-axis
    arithmetic only — strided-axis broadcasting is ~50x slower at 385^3."""
    lo, hi = a[..., :-1], a[..., 1:]
    w = np.arange(f, dtype=np.float32) / f
    seg = lo[..., None] * (1.0 - w) + hi[..., None] * w   # (..., n-1, f)
    out = seg.reshape(a.shape[:-1] + ((a.shape[-1] - 1) * f,))
    return np.concatenate([out, a[..., -1:]], axis=-1)


def _host_trilinear(coarse: np.ndarray, r: int) -> np.ndarray:
    """(c, c, c) -> (r, r, r) trilinear upsample on host.

    The grids are edge-aligned with (r-1) an integer multiple of (c-1)
    (coarse_factor subdivision), so this is three axis-wise integer-factor
    lerps — ~6x faster than ``scipy.ndimage.zoom`` at 385^3 (3.2 -> ~0.5 s),
    which dominated the FlashVDM decode wall time. Falls back to zoom for
    non-integer factors.
    """
    c = coarse.shape[0]
    if (r - 1) % (c - 1) == 0:
        f = (r - 1) // (c - 1)
        from motion324_tpu import native
        out = native.trilinear_upsample(np.asarray(coarse, np.float32), f)
        if out is not None:  # C++: no temporaries, ~0.3 s at 385^3 (the
            return out       # numpy path swings 0.8-8 s with memory pressure)
        out = np.asarray(coarse, np.float32)
        for _ in range(3):  # cycle axes so each lerp runs on the last axis
            out = _lerp_last(
                np.ascontiguousarray(np.transpose(out, (1, 2, 0))), f)
        return np.ascontiguousarray(out, np.float32)
    from scipy.ndimage import zoom
    out = zoom(np.asarray(coarse, np.float32), r / c, order=1,
               mode="nearest", grid_mode=True)
    # zoom can be off by one voxel on exact size; pad/crop defensively
    if out.shape != (r, r, r):
        out = out[:r, :r, :r]
        pad = [(0, r - s) for s in out.shape]
        out = np.pad(out, pad, mode="edge")
    return np.ascontiguousarray(out, np.float32)

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
    # upsample coarse logits to the fine grid ON HOST (the coarse grid is a
    # few MB; upsampling on device and copying the fine grid back costs a
    # ~230 MB transfer, which dominates on tunneled-TPU links)
    fine_init = _host_trilinear(coarse, r)

    # near-surface selection on the upsampled field itself (no grid-alignment
    # bookkeeping), dilated by one coarse cell of fine voxels: the band is
    # measured on the UPSAMPLED field, so the true surface is within ~half a
    # coarse cell of it. One fused host pass (C++ when built).
    flat = _shell_indices(fine_init, band, max(coarse_factor // 2, 1), 1)
    if len(flat) == 0:
        return fine_init
    # upload PACKED int32 flat indices (4 B/pt instead of 12 B of f32 coords);
    # coordinates regenerate on device
    logits = _refine_indices(query_fn, params, processed_latents,
                             flat, r, float(box_v), chunk)
    fine_init.reshape(-1)[flat] = logits[:len(flat)]
    return fine_init


@functools.partial(jax.jit, static_argnums=(0, 3, 4, 5))
def _refine_run(query_fn, params, processed_latents, r, box_v, chunk, idx):
    def one(ii):
        pts = _flat_to_points(ii, r, box_v)
        return query_fn(params, pts[None], processed_latents)[0] \
            .astype(jnp.float16)  # halved download, see _decode_grid

    return jax.lax.map(one, idx.reshape(-1, chunk)).reshape(-1)


def _refine_indices(query_fn, params, processed_latents, flat_idx, r: int,
                    box_v: float, chunk: int) -> np.ndarray:
    # bucket the chunk count so repeated decodes with varying surface sizes
    # reuse a few compiled programs: powers of two below 64 chunks, then
    # multiples of 64 (pure pow2 wasted up to 2x device work — e.g. a 528
    # -chunk surface decoded 1024 chunks; <=12% overhead this way)
    n_chunks = max((len(flat_idx) + chunk - 1) // chunk, 1)
    if n_chunks <= 64:
        n_chunks = 1 << (n_chunks - 1).bit_length()
    else:
        n_chunks = ((n_chunks + 63) // 64) * 64
    pad = n_chunks * chunk - len(flat_idx)
    if pad:
        flat_idx = np.concatenate([flat_idx, np.zeros(pad, np.int32)])
    out = _refine_run(query_fn, params, processed_latents, r, box_v, chunk,
                      jnp.asarray(flat_idx))
    return np.asarray(out, np.float32)


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
    query_fn = _ft_partial_query(vae)

    coarse_res = max(resolution // coarse_factor, 16)
    coarse = decode_volume(query_fn, params, processed_latents, coarse_res,
                           box_v, chunk)
    r = resolution + 1
    fine_init = _host_trilinear(coarse, r)  # see decode_volume_hierarchical

    # shell selection + mini-grid reordering (sort near-surface points by
    # spatial cell so each fixed chunk's probes agree on which latents
    # matter) in ONE fused host pass — C++ counting sort when built, the
    # numpy mask/dilate/argwhere/radix-argsort chain otherwise.
    flat = _shell_indices(fine_init, band, max(coarse_factor // 2, 1),
                          sort_grid)
    if len(flat) == 0:
        return fine_init

    # packed flat-index upload + on-device coordinates (see _refine_indices)
    logits = _refine_indices(_ft_partial_topk(vae, topk), params,
                             processed_latents, flat, r, float(box_v), chunk)
    fine_init.reshape(-1)[flat] = logits[:len(flat)]
    return fine_init


@functools.lru_cache(maxsize=None)
def _ft_partial_query(vae):
    """Module-level cached query fn: defining closures per decode call would
    defeat jax.jit's cache and recompile every sweep."""
    def query_fn(params, pts, lat):
        return vae.apply(params, pts, lat, method=type(vae).query)
    return query_fn


@functools.lru_cache(maxsize=None)
def _ft_partial_topk(vae, topk: int):
    def topk_fn(params, pts, lat):
        return vae.apply(params, pts, lat, topk,
                         method=type(vae).query_topk)
    return topk_fn
