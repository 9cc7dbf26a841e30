"""End-to-end inference pipeline: mesh + video -> animated GLB.

The TPU-native counterpart of the reference's ``inference_with_video_mesh.py``
(reference: scripts/inference_with_video_mesh.py:301-430):

1. load mesh (GLB/OBJ), unit-cube normalise, sample ``num_shape_samples``
   textured surface points, transfer colors to vertices via nearest neighbour;
2. load video, optional foreground segmentation;
3. model inference with sliding-window chunking for long videos — with two
   TPU-first improvements over the reference: the shape encoding is computed
   ONCE and reused across windows (the reference re-encodes per window), and
   vertex decoding runs in fixed-size padded chunks so every window reuses one
   compiled program;
4. smoothing (threshold + gaussian), Blender-convention axis remap
   (x, y, z) -> (x, -z, y), animated-GLB export via morph targets.
"""

from __future__ import annotations

import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from motion324_tpu.io.glb import export_animated_glb
from motion324_tpu.io.mesh import (TriMesh, load_mesh, nearest_colors,
                                   normalize_unit_cube, sample_with_albedo,
                                   vertex_normals)
from motion324_tpu.inference.smoothing import smooth_trajectories
from motion324_tpu.inference.windowing import sliding_window_predict
from motion324_tpu.models.motion_model import ModelConfig, MotionLatentModel
from motion324_tpu.utils.logging import log

__all__ = ["MotionPipeline", "prepare_mesh_inputs", "load_video"]

DECODE_CHUNK = 4096  # reference model/Pcd_motion.py:527 eval chunk size


def load_video(path: str, max_frames: int | None = None,
               dtype=np.float32, resize_to: int | None = None) -> np.ndarray:
    """Read a video or image file into ``(T, H, W, 3)`` RGB.

    float32 in [0, 1] by default; ``dtype=np.uint8`` keeps the decoded
    bytes (4x less memory — see :func:`motion324_tpu.io.video.read_video`).
    ``resize_to`` fuses the per-frame resize into video decode (image files
    are resized after decode instead; same result).
    """
    if path.endswith((".mp4", ".mov", ".avi", ".mkv")):
        from motion324_tpu.io.video import read_video
        return read_video(path, max_frames, dtype=dtype, resize_to=resize_to)
    import imageio.v3 as iio
    frames = np.asarray(iio.imread(path))
    if frames.ndim == 3:
        frames = frames[None]
    if max_frames:
        frames = frames[:max_frames]
    frames = frames[..., :3]
    # normalise whatever the image codec returned (u8/u16 ints, or floats
    # in [0,1]) to [0,1] f32 — a bare astype(u8) on u16 sources would
    # truncate modulo 256
    if np.issubdtype(frames.dtype, np.integer):
        unit = frames.astype(np.float32) / np.iinfo(frames.dtype).max
    else:
        unit = np.clip(frames.astype(np.float32), 0.0, 1.0)
    out = ((unit * 255 + 0.5).astype(np.uint8)
           if np.dtype(dtype) == np.uint8 else unit)
    if resize_to:
        out = resize_frames(out, resize_to)
    return out


def prepare_mesh_inputs(mesh: TriMesh, num_shape_samples: int = 16384,
                        seed: int = 0):
    """Normalise and sample a mesh into the model's input dict (host numpy).

    Returns ``(inputs, norm)`` where ``inputs`` has batched (1, ...) arrays and
    ``norm = (center, scale)`` undoes the unit-cube transform.
    """
    verts, center, scale = normalize_unit_cube(mesh.vertices)
    mesh = mesh.with_vertices(verts)
    pts, normals, colors = sample_with_albedo(mesh, num_shape_samples, seed=seed)
    vert_rgb = nearest_colors(pts, colors, verts)
    vnorm = vertex_normals(verts, mesh.faces)
    inputs = {
        "ref_shape_pcd": pts[None], "ref_shape_normals": normals[None],
        "ref_shape_rgbs": colors[None],
        "ref_pcd": verts[None].astype(np.float32), "ref_normal": vnorm[None],
        "ref_rgb": vert_rgb[None].astype(np.float32),
    }
    return inputs, (center, scale), mesh


def _border_segment(x, border: int = 8, sigma_factor: float = 4.0):
    """In-graph border-statistics foreground mask, (B, T, H, W, 3) -> mask.

    Same math as :func:`motion324_tpu.inference.segmentation.threshold_segment`
    (background color distribution from the frame borders), traced into the
    video-encode program so the fallback segmentation costs ~nothing instead
    of ~0.3 s of host numpy per clip.
    """
    h, w = x.shape[2], x.shape[3]
    bmask = np.zeros((h, w), bool)
    bmask[:border] = bmask[-border:] = True
    bmask[:, :border] = bmask[:, -border:] = True
    border_pix = x[:, :, np.argwhere(bmask)[:, 0],
                   np.argwhere(bmask)[:, 1]]  # (B, T, P, 3)
    mean = border_pix.mean(axis=2)[:, :, None, None]  # (B, T, 1, 1, 3)
    std = border_pix.std(axis=2)[:, :, None, None] + 1e-3
    dist = jnp.abs(x - mean) / std
    return (dist.max(axis=-1) > sigma_factor).astype(x.dtype)


def resize_frames(video: np.ndarray, size: int) -> np.ndarray:
    """Host-side bilinear resize of ``(T, H, W, 3)`` frames to ``size``^2.

    Matches the model's in-graph resize (and the reference's
    ``F.interpolate(mode="bilinear", align_corners=False)``,
    model/Pcd_motion.py:472) — cv2 INTER_LINEAR uses the same half-pixel
    convention. Doing this on host before upload shrinks the host->device
    transfer ~10x for 720p inputs (50 MB -> 4.8 MB uint8 per 32-frame clip
    over the tunnel), which dominated e2e wall-time variance.
    """
    import cv2
    if video.shape[1] == size and video.shape[2] == size:
        return video
    out = np.empty((video.shape[0], size, size, 3), dtype=video.dtype)
    for i, frame in enumerate(video):
        cv2.resize(frame, (size, size), dst=out[i],
                   interpolation=cv2.INTER_LINEAR)
    return out


def to_blender_coords(trajs: np.ndarray) -> np.ndarray:
    """(x, y, z) -> (x, -z, y) (reference scripts/inference_with_video_mesh.py:411-418)."""
    out = trajs.copy()
    out[..., 0] = trajs[..., 0]
    out[..., 1] = -trajs[..., 2]
    out[..., 2] = trajs[..., 1]
    return out


class MotionPipeline:
    """Holds jitted encode/decode programs for repeated clip inference.

    ``mesh``: optional ``jax.sharding.Mesh`` with an ``mp`` axis; ``parallel``
    picks the partitioning:

    - ``"tp"`` (default): tensor parallel — parameters sharded Megatron-style
      (:mod:`motion324_tpu.parallel.tp`), GSPMD inserts the collectives.
    - ``"sp"``: sequence parallel over the FRAME axis — each device encodes
      its frame block (DINO + local attention run frame-local), the global
      attention all-gathers K/V over ICI, and decoding stays frame-local.
      Right for LONG windows (the global attention's S^2 dominates at
      T=256: 82944 tokens), where TP's per-layer all-reduces lose to one
      KV gather per global layer. Window length must divide by the axis.
    - ``"pp"``: pipeline parallel over the alternating stack's LAYER axis
      (:mod:`motion324_tpu.parallel.pp`): each device holds a stage of
      layers, activations rotate over ICI. One ppermute per stage per
      window — the lightest communication of the three; right when weights
      don't fit one chip and windows are short (its bubble shrinks with
      more clips, so pair it with the batched path).

    Single-chip behaviour is unchanged when ``mesh`` is None.
    """

    def __init__(self, cfg: ModelConfig, params, window: int = 12,
                 decode_chunk: int = DECODE_CHUNK, mesh=None,
                 parallel: str = "tp", u16_readback: bool = True,
                 yuv420_upload: bool = False,
                 programs_from: "MotionPipeline | None" = None,
                 seg_params=None):
        import dataclasses

        self.cfg = cfg
        self.model = MotionLatentModel(cfg)
        self.window = window
        self.decode_chunk = decode_chunk
        self.mesh = mesh
        self._seg = None
        if seg_params is not None:
            self.set_segmentation(seg_params)
        # I420 wire format works on the fused single-chip and TP (GSPMD)
        # paths; the SP/PP shard_map programs take a plain video array, so
        # it is dropped there (with a log) rather than crashing in in_specs
        self._yuv = bool(yuv420_upload) and (mesh is None or parallel == "tp")
        if yuv420_upload and not self._yuv:
            log(f"yuv420_upload ignored under parallel='{parallel}' "
                "(shard_map video programs take plain RGB arrays)")

        if programs_from is not None:
            # share the donor's jitted callables (and their compiled-program
            # caches): a fresh instance would otherwise recompile EVERY
            # program because jax.jit caches per function object. The wire
            # format is not baked into the traces — the video-encode math
            # branches on the input STRUCTURE (I420 dict vs RGB array), so
            # one callable serves both and only the genuinely new input
            # signature compiles (seen as a 50 s mid-bench stall in r3).
            if (programs_from.cfg != cfg or programs_from.window != window
                    or programs_from.decode_chunk != decode_chunk
                    or programs_from.mesh is not mesh):
                raise ValueError("programs_from requires identical "
                                 "cfg/window/decode_chunk/mesh")
            self.params = params
            self._window_fused = programs_from._window_fused
            self._encode_shape = programs_from._encode_shape
            self._encode_video = programs_from._encode_video
            self._decode = programs_from._decode
            # shared traces closed over the DONOR's segmentation state
            self._seg = programs_from._seg
            return

        sp_n = 1
        pp_n = 1
        if mesh is not None and parallel == "sp":
            from jax.sharding import NamedSharding, PartitionSpec as P
            sp_n = int(mesh.shape.get("mp", 1))
            if window % max(sp_n, 1):
                raise ValueError(
                    f"sequence parallelism needs window ({window}) divisible "
                    f"by the mp axis ({sp_n})")
            params = jax.device_put(params, NamedSharding(mesh, P()))
        elif mesh is not None and parallel == "pp":
            from jax.sharding import NamedSharding
            from motion324_tpu.parallel.pp import pp_spec_for
            pp_n = int(mesh.shape.get("mp", 1))
            params = jax.device_put(params, jax.tree_util.tree_map_with_path(
                lambda p, leaf: NamedSharding(mesh, pp_spec_for(p, leaf)),
                params))
        elif mesh is not None and mesh.shape.get("mp", 1) >= 1:
            from motion324_tpu.parallel.tp import tp_shardings
            params = jax.device_put(params, tp_shardings(params, mesh))
        self.params = params

        model = self.model

        @jax.jit
        def _encode_shape(params, sp, sn, sr):
            return model.apply(params, sp, sn, sr,
                               method=MotionLatentModel.encode_shape)

        def _encode_video_math(model, params, video, mesh_feat, segment):
            # video ships as uint8 (4x less tunnel/host->HBM traffic than
            # f32 — the transfer dominated e2e wall time) or as I420 planes
            # (6x less; see inference/yuv.py) and normalises in-graph;
            # segmentation also runs in-graph: the real U2Net when the
            # pipeline holds converted weights (set_segmentation), else the
            # border-statistics fallback (host-segmentation versions cost
            # 0.3-70 s/clip depending on resolution and wire format)
            x = video
            if isinstance(x, dict):
                from motion324_tpu.inference.yuv import yuv420_to_rgb
                x = yuv420_to_rgb(x)
            elif x.dtype == jnp.uint8:
                x = x.astype(jnp.float32) / 255.0
            # segment is a STATIC tri-state: False / True ("border") /
            # "u2net" (requires set_segmentation weights)
            if segment == "u2net":
                seg_net, seg_p = self._seg
                b_, t_, hh, ww, _ = x.shape
                prob = seg_net.apply(
                    seg_p, x.reshape(b_ * t_, hh, ww, 3)
                    .astype(seg_net.dtype))
                m = (prob > 0.5).reshape(b_, t_, hh, ww)
                x = x * m.astype(x.dtype)[..., None]
            elif segment:
                x = x * _border_segment(x)[..., None]
            return model.apply(params, x, mesh_feat,
                               method=MotionLatentModel.encode_video)

        if sp_n > 1:
            from jax.sharding import PartitionSpec as P
            sp_model = MotionLatentModel(dataclasses.replace(
                cfg, sp_axis="mp", sp_size=sp_n))

            @functools.partial(jax.jit, static_argnums=(3,))
            def _sp_encode_video(params, video, mesh_feat, segment=False):
                f = functools.partial(_encode_video_math, sp_model)
                return jax.shard_map(
                    lambda p, v, m: f(p, v, m, segment), mesh=mesh,
                    in_specs=(P(), P(None, "mp"), P()),
                    out_specs=P(None, "mp"), check_vma=False,
                )(params, video, mesh_feat)

            @functools.partial(jax.jit, static_argnums=(3,))
            def _rep_encode_video(params, video, mesh_feat, segment=False):
                return _encode_video_math(model, params, video, mesh_feat,
                                          segment)

            @jax.jit
            def _sp_decode(params, tokens, p, n, c):
                def f(params, tokens, p, n, c):
                    return model.apply(params, tokens, p, n, c,
                                       method=MotionLatentModel.decode_points)
                return jax.shard_map(
                    f, mesh=mesh,
                    in_specs=(P(), P(None, "mp"), P(), P(), P()),
                    out_specs=P(None, "mp"), check_vma=False,
                )(params, tokens, p, n, c)

            @jax.jit
            def _rep_decode(params, tokens, p, n, c):
                return model.apply(params, tokens, p, n, c,
                                   method=MotionLatentModel.decode_points)

            # videos shorter than the window (e.g. a clip below
            # training.frames) have frame counts that need not divide the
            # mesh: run those replicated instead of crashing in shard_map
            def _encode_video(params, video, mesh_feat, segment=False):
                if video.shape[1] % sp_n:
                    return _rep_encode_video(params, video, mesh_feat, segment)
                return _sp_encode_video(params, video, mesh_feat, segment)

            def _decode(params, tokens, p, n, c):
                if tokens.shape[1] % sp_n:
                    return _rep_decode(params, tokens, p, n, c)
                return _sp_decode(params, tokens, p, n, c)

            self._window_fused = None  # SP keeps per-stage shard_map programs
        elif pp_n > 1:
            from jax.sharding import PartitionSpec as P
            from motion324_tpu.parallel.pp import pp_spec_for
            pp_model = MotionLatentModel(dataclasses.replace(
                cfg, pp_axis="mp", pp_size=pp_n, pp_microbatches=1))
            pspecs = jax.tree_util.tree_map_with_path(
                lambda pth, leaf: pp_spec_for(pth, leaf), self.params)

            @functools.partial(jax.jit, static_argnums=(3,))
            def _encode_video(params, video, mesh_feat, segment=False):
                f = functools.partial(_encode_video_math, pp_model)
                return jax.shard_map(
                    lambda p, v, m: f(p, v, m, segment), mesh=mesh,
                    in_specs=(pspecs, P(), P()), out_specs=P(),
                    check_vma=False,
                )(params, video, mesh_feat)

            # the decoder is outside the pipeline: plain replicated apply
            # (the stage-sharded stack leaves are unused and DCE'd)
            @jax.jit
            def _decode(params, tokens, p, n, c):
                return model.apply(params, tokens, p, n, c,
                                   method=MotionLatentModel.decode_points)

            self._window_fused = None
        else:
            @functools.partial(jax.jit, static_argnums=(3,))
            def _encode_video(params, video, mesh_feat, segment: bool = False):
                return _encode_video_math(model, params, video, mesh_feat,
                                          segment)

            @jax.jit
            def _decode(params, tokens, p, n, c):
                return model.apply(params, tokens, p, n, c,
                                   method=MotionLatentModel.decode_points)

            # one dispatch + one readback per window: video encode and ALL
            # decode chunks in a single program. Each separate dispatch costs
            # a tunnel round trip (~30 ms, with multi-second tail latency),
            # so the per-chunk decode loop dominated e2e wall time at 16384
            # points / 4096-chunks even though device time is ~0.16 s/clip.
            @functools.partial(jax.jit, static_argnums=(6, 7))
            def _window_fused(params, video, mesh_feat, p, n, c,
                              segment: bool = False, n_valid: int = 0):
                tokens = _encode_video_math(model, params, video, mesh_feat,
                                            segment)

                def body(_, pnc):
                    out = model.apply(params, tokens, *pnc,
                                      method=MotionLatentModel.decode_points)
                    return None, out

                _, outs = jax.lax.scan(body, None, (p, n, c))
                # outs: (chunks, b, T, ck, 3)
                if not u16_readback:
                    return outs
                # quantized readback: trajectories ship as uint16 fixed-point
                # (per-clip, per-axis range), HALVING the device->host tunnel
                # transfer (~25 MB/s) vs f32; max error = range/65535 (~3e-5
                # for unit-cube meshes), far below model noise. Ranges reduce
                # over (chunks, T, ck) but NOT the clip axis, so a clip's
                # quantization grid is identical whether it runs alone or
                # stacked in a batch (min/max are exactly associative) — the
                # batched path stays bit-equal to per-clip calls. Decoded
                # PADDING points (chunk round-up) are masked out of the range
                # so they cannot widen the grid; their quantized values are
                # garbage and sliced away on host.
                of = outs.astype(jnp.float32)
                chunks, _, _, ck, _ = of.shape
                if n_valid and n_valid < chunks * ck:
                    idx = (jnp.arange(chunks * ck).reshape(chunks, 1, 1, ck, 1)
                           < n_valid)
                    lo = jnp.where(idx, of, jnp.inf).min(axis=(0, 2, 3))
                    hi = jnp.where(idx, of, -jnp.inf).max(axis=(0, 2, 3))
                else:
                    lo = of.min(axis=(0, 2, 3))  # (b, 3)
                    hi = of.max(axis=(0, 2, 3))
                scale = jnp.maximum((hi - lo) / 65535.0, 1e-12)
                bc = lambda x: x[None, :, None, None, :]
                q = jnp.round((of - bc(lo)) / bc(scale))
                q = jnp.clip(q, 0, 65535).astype(jnp.uint16)
                return q, lo, scale

            self._window_fused = _window_fused

        self._encode_shape = _encode_shape
        self._encode_video = _encode_video
        self._decode = _decode

    # ------------------------------------------------------------------ #
    def set_segmentation(self, seg_params) -> None:
        """Install converted U2Net weights for IN-GRAPH segmentation.

        The mask pass fuses into the video-encode program at model
        resolution (the reference's rembg session also runs U2Net at a
        reduced 320^2, not full video res — rmbg_for_black_bg.py:26 — so
        only the mask's upsample-before-multiply order differs). Must be
        called before the first segmented encode is traced; params are
        committed to device once in bf16.
        """
        from motion324_tpu.inference.segmentation import U2Net
        if self._seg is not None:
            return

        def commit(a):
            a = np.asarray(a)
            if np.issubdtype(a.dtype, np.floating):
                a = a.astype(jnp.bfloat16)
            return jax.device_put(a)
        self._seg = (U2Net(dtype=jnp.bfloat16),
                     jax.tree.map(commit, seg_params))

    def _chunked_points(self, inputs):
        """Pad + chunk the decode point arrays to ``(chunks, b, ck, 3)``.

        Device-put once per mesh so sliding windows reuse the buffers
        instead of re-uploading per window. ``b`` follows the inputs'
        leading axis (1 for single-clip, B for the batched path).
        """
        b, n = inputs["ref_pcd"].shape[:2]
        ck = self.decode_chunk
        chunks = max(1, -(-n // ck))

        def prep(x):
            pad = chunks * ck - n
            x = np.pad(x, ((0, 0), (0, pad), (0, 0)))
            return jax.device_put(
                np.transpose(x.reshape(b, chunks, ck, 3), (1, 0, 2, 3)))

        return (prep(inputs["ref_pcd"]), prep(inputs["ref_normal"]),
                prep(inputs["ref_rgb"]), n)

    def _wire(self, video_batched):
        """Apply the wire format to a (b, T, H, W, 3) window before upload:
        uint8 RGB -> I420 planes when ``yuv420_upload`` is on (6x smaller
        than f32, 2x smaller than u8 RGB; see :mod:`.yuv`)."""
        if self._yuv and getattr(video_batched, "dtype", None) == np.uint8:
            from motion324_tpu.inference.yuv import rgb_to_yuv420
            return rgb_to_yuv420(video_batched)
        return video_batched

    @staticmethod
    def _resolve_window(out, n):
        """Blocking readback of a fused-window result -> (b, T, N, 3) f32.

        ``out`` is either the raw (chunks, b, T, ck, 3) array or the
        quantized triple ``(q_u16, lo, scale)`` — fetched in ONE device_get
        (one tunnel round trip, not three) and dequantized on host."""
        if isinstance(out, tuple):
            q, lo, scale = jax.device_get(out)
            bc = lambda x: x[None, :, None, None, :]
            out = q.astype(np.float32) * bc(scale) + bc(lo)
        else:
            out = np.asarray(out)
        out = np.transpose(out, (1, 2, 0, 3, 4))
        return out.reshape(out.shape[0], out.shape[1], -1, 3)[:, :, :n]

    def _dispatch_window(self, window_video, mesh_feat, chunked,
                         segment: bool):
        """Async dispatch of one fused window (wire format + device program);
        resolve the returned handle with :meth:`_resolve_window`."""
        p, nn, c, n = chunked
        return self._window_fused(self.params, self._wire(window_video),
                                  mesh_feat, p, nn, c, segment, n)

    def predict_window(self, mesh_feat, window_video, inputs,
                       segment: bool = False, _chunked=None):
        """One window: video encode + chunked point decode -> (1, T, N, 3)."""
        chunked = (_chunked if _chunked is not None
                   else self._chunked_points(inputs))
        p, nn, c, n = chunked
        if self._window_fused is not None:
            out = self._dispatch_window(window_video, mesh_feat, chunked,
                                        segment)
            return self._resolve_window(out, n)
        tokens = self._encode_video(self.params, self._wire(window_video),
                                    mesh_feat, segment)
        parts = [np.asarray(self._decode(self.params, tokens,
                                         p[i], nn[i], c[i]))
                 for i in range(p.shape[0])]
        return np.concatenate(parts, axis=2)[:, :, :n]

    def predict(self, inputs, video: np.ndarray,
                segment: bool = False) -> np.ndarray:
        """Full-video trajectories ``(1, T, N, 3)`` with sliding windows.

        ``video`` may be float32 in [0, 1] or uint8 (preferred: 4x smaller
        host->device transfer); ``segment`` applies the in-graph
        border-statistics foreground mask per frame.
        """
        mesh_feat = self._encode_shape(
            self.params, inputs["ref_shape_pcd"], inputs["ref_shape_normals"],
            inputs["ref_shape_rgbs"])
        chunked = self._chunked_points(inputs)

        if self._window_fused is not None:
            # software-pipelined windows: dispatch window k+1 (host slice +
            # async upload + async device program) before window k's blocking
            # readback — the tunnel transfer hides under device compute
            n = chunked[3]
            return sliding_window_predict(
                lambda w: self._dispatch_window(w[None], mesh_feat, chunked,
                                                segment),
                video, self.window, inputs["ref_pcd"],
                finalize=lambda out: self._resolve_window(out, n))

        def forward(window):
            return self.predict_window(mesh_feat, window[None], inputs,
                                       segment=segment, _chunked=chunked)

        return sliding_window_predict(forward, video, self.window,
                                      inputs["ref_pcd"])

    def predict_batch(self, inputs, videos: np.ndarray,
                      segment: bool = False) -> np.ndarray:
        """B same-shape clips per device program: ``(B, T, N, 3)``.

        The throughput path for the `long_videos.txt` batch driver
        (reference: dataset/long_videos.txt protocol): clips that share
        static shapes (frame count, resolution, sample count) stack on the
        leading batch axis, so the MXU runs at batch B instead of B
        dispatches at batch 1 — amortising per-dispatch overhead and padding
        losses. ``inputs`` holds ``(B, ...)``-stacked mesh arrays; ``videos``
        is ``(B, T, H, W, 3)`` float32 or uint8.

        Window stitching reuses :func:`sliding_window_predict` unchanged by
        feeding it the TIME-MAJOR video ``(T, B, H, W, 3)`` — its slicing is
        over axis 0 and its merge logic is over axes (0=batch, 1=time) of the
        per-window outputs, both already batch-shape-agnostic.
        """
        mesh_feat = self._encode_shape(
            self.params, inputs["ref_shape_pcd"], inputs["ref_shape_normals"],
            inputs["ref_shape_rgbs"])
        chunked = self._chunked_points(inputs)
        vt = np.swapaxes(videos, 0, 1)

        if self._window_fused is not None:
            # same software pipelining as predict(): one window in flight
            n = chunked[3]

            def dispatch(window):
                wb = np.ascontiguousarray(np.swapaxes(window, 0, 1))
                return self._dispatch_window(wb, mesh_feat, chunked, segment)

            return sliding_window_predict(
                dispatch, vt, self.window, inputs["ref_pcd"],
                finalize=lambda out: self._resolve_window(out, n))

        def forward(window):
            wb = np.ascontiguousarray(np.swapaxes(window, 0, 1))
            return self.predict_window(mesh_feat, wb, inputs,
                                       segment=segment, _chunked=chunked)

        return sliding_window_predict(forward, vt, self.window,
                                      inputs["ref_pcd"])

    # ------------------------------------------------------------------ #
    def run(self, mesh_path: str, video_path: str, output_dir: str,
            num_shape_samples: int = 16384, smooth: bool = True,
            fps: int = 12, max_frames: int | None = None,
            use_segmentation: bool = True,
            segmentation_params=None, uint8_upload: bool = True,
            host_resize: bool = True) -> str:
        """The `4D_from_existing` product path: mesh + video -> animated GLB.

        ``use_segmentation`` masks the video to a black background before the
        model, as the reference does by default in this path (reference:
        scripts/inference_with_video_mesh.py:357-358, 4D_from_existing.sh:62);
        ``segmentation_params`` selects converted U2Net weights, else the
        border-statistics fallback segments; both run IN-GRAPH at model
        resolution inside the video-encode program (the reference's rembg
        session also runs U2Net at a reduced 320^2 —
        rmbg_for_black_bg.py:26 — only the mask upsample-before-multiply
        order differs; a host full-res segment costs 70+ s/clip over the
        tunnel and was removed). ``uint8_upload`` quantizes the
        video for a 4x smaller host->device transfer (<=1/510 per-pixel
        error). For EXACT-parity runs against the reference's float
        pipeline, disable this AND construct the pipeline with
        ``u16_readback=False`` (the trajectory readback is otherwise
        quantized to uint16, ~3e-5 error) — the CLI's ``--exact`` flag sets
        both. ``host_resize`` downsamples frames to the model's
        input size on host before upload (see :func:`resize_frames`);
        disable to reproduce the in-graph resize exactly.
        """
        from concurrent.futures import ThreadPoolExecutor
        from motion324_tpu.utils.profiling import phase_timer
        os.makedirs(output_dir, exist_ok=True)
        t0 = time.perf_counter()

        if segmentation_params is not None:
            # converted U2Net weights fuse into the video-encode program
            # (same in-graph slot as the border fallback; see
            # set_segmentation for the resolution-order note)
            self.set_segmentation(segmentation_params)

        def _decode_video():
            # decoded bytes stay uint8 (segmentation runs in-graph), and the
            # resize fuses into the decode loop (per frame, before the
            # stack): keeps the working set at model resolution instead of
            # materialising the full-res clip — measured 4x faster on
            # 128x720^2 inputs
            return load_video(
                video_path, max_frames,
                dtype=np.uint8 if uint8_upload else np.float32,
                resize_to=self.cfg.image_size if host_resize else None)

        # video decode+resize overlaps mesh load+sample on a worker thread
        # (cv2/PIL release the GIL; each side is ~0.1 s of host time per clip)
        with ThreadPoolExecutor(1) as pool:
            video_fut = pool.submit(_decode_video)
            with phase_timer("mesh load+sample"):
                mesh = load_mesh(mesh_path)
                inputs, _, norm_mesh = prepare_mesh_inputs(
                    mesh, num_shape_samples)
            with phase_timer("video decode (overlapped)"):
                video = video_fut.result()
        # static in-graph mode: "u2net" when weights were passed to THIS
        # call, border fallback otherwise, off when masking is disabled
        seg_in_graph = use_segmentation and (
            "u2net" if segmentation_params is not None else True)
        seg_tag = ""
        if use_segmentation:
            seg_tag = (" (segmented, u2net)" if seg_in_graph == "u2net"
                       else " (segmented)")
        log(f"mesh {norm_mesh.vertices.shape[0]} verts, "
            f"video {video.shape}{seg_tag}")

        with phase_timer("model predict"):
            if uint8_upload and video.dtype != np.uint8:
                # ship the video as uint8: 4x smaller host->device transfer
                video = (np.clip(video, 0.0, 1.0) * 255 + 0.5).astype(np.uint8)
            trajs = self.predict(inputs, video, segment=seg_in_graph)
        if smooth:
            with phase_timer("smoothing"):
                trajs = smooth_trajectories(trajs, method="combined",
                                            motion_threshold=0.002, sigma=1.0)
        trajs_b = to_blender_coords(trajs[0])
        verts_b = to_blender_coords(norm_mesh.vertices)
        out_path = os.path.join(output_dir, "output_animation.glb")
        with phase_timer("glb export"):
            export_animated_glb(out_path, verts_b, norm_mesh.faces, trajs_b,
                                fps=fps, uv=norm_mesh.uv,
                                texture=norm_mesh.texture,
                                vertex_colors=norm_mesh.vertex_colors)
        log(f"animated GLB written to {out_path} "
            f"({time.perf_counter() - t0:.2f}s total)")
        return out_path

    # ------------------------------------------------------------------ #
    def run_batch(self, jobs, output_dir: str,
                  num_shape_samples: int = 16384, smooth: bool = True,
                  fps: int = 12, max_frames: int | None = None,
                  use_segmentation: bool = True,
                  uint8_upload: bool = True) -> list:
        """Batched `long_videos.txt` driver: N (mesh, video) jobs, grouped by
        decoded video shape, each group predicted at batch B in one program.

        ``jobs`` is a list of ``(mesh_path, video_path)``; outputs land in
        ``output_dir/<video_stem>/output_animation.glb``. Jobs stack into one
        program only when ALL their static shapes agree — decoded video shape
        AND mesh vertex count (``ref_pcd`` carries the mesh's own vertices,
        which differ per mesh); anything else falls into its own group.
        """
        from concurrent.futures import ThreadPoolExecutor
        os.makedirs(output_dir, exist_ok=True)

        def _load(job):
            mesh_path, video_path = job
            mesh = load_mesh(mesh_path)
            inputs, _, norm_mesh = prepare_mesh_inputs(mesh, num_shape_samples)
            video = load_video(video_path, max_frames,
                               dtype=np.uint8 if uint8_upload else np.float32)
            video = resize_frames(video, self.cfg.image_size)
            stem = os.path.splitext(os.path.basename(video_path))[0]
            return inputs, norm_mesh, video, stem

        # host loading (GLB/texture decode, surface sampling, mp4 decode) is
        # per-job independent and GIL-light (cv2/PIL/numpy) — load in parallel
        with ThreadPoolExecutor(min(8, max(1, len(jobs)))) as pool:
            loaded = list(pool.map(_load, jobs))

        groups: dict = {}
        for idx, (inputs, _, video, _) in enumerate(loaded):
            key = (video.shape,) + tuple(sorted(
                (k, v.shape[1:]) for k, v in inputs.items()))
            groups.setdefault(key, []).append(idx)

        out_paths = [None] * len(loaded)
        for key, idxs in groups.items():
            batch_inputs = {
                k: np.concatenate([loaded[i][0][k] for i in idxs], axis=0)
                for k in loaded[idxs[0]][0]}
            videos = np.stack([loaded[i][2] for i in idxs], axis=0)
            t0 = time.perf_counter()
            # in-graph U2Net when the pipeline holds weights (ctor
            # seg_params / set_segmentation), else the border fallback
            seg = use_segmentation and (
                "u2net" if self._seg is not None else True)
            trajs = self.predict_batch(batch_inputs, videos, segment=seg)
            dt = time.perf_counter() - t0
            log(f"batch predict: {len(idxs)} clips x {key[0][0]} frames in "
                f"{dt:.2f}s ({len(idxs) / dt:.2f} clips/s)")
            if smooth:
                trajs = smooth_trajectories(trajs, method="combined",
                                            motion_threshold=0.002, sigma=1.0)
            for bi, i in enumerate(idxs):
                _, norm_mesh, _, stem = loaded[i]
                clip_dir = os.path.join(output_dir, stem)
                os.makedirs(clip_dir, exist_ok=True)
                out_path = os.path.join(clip_dir, "output_animation.glb")
                export_animated_glb(
                    out_path, to_blender_coords(norm_mesh.vertices),
                    norm_mesh.faces, to_blender_coords(trajs[bi]), fps=fps,
                    uv=norm_mesh.uv, texture=norm_mesh.texture,
                    vertex_colors=norm_mesh.vertex_colors)
                out_paths[i] = out_path
        return out_paths
