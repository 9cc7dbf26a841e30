"""Benchmark: TRUE end-to-end seconds per 32-frame clip on one chip.

Times the full `4D_from_existing` product path via ``MotionPipeline.run`` on
the REAL reference assets — chili.glb (13 465 verts, 2048^2 texture) +
chili.mp4 (720^2) from /root/reference/examples — covering video decode,
foreground segmentation, mesh load + unit-cube normalisation, 16384 textured
surface samples, model inference (shape encode, video encode, chunked point
decode), trajectory smoothing, and animated-GLB export. The headline runs
with the REAL U2Net segmentation network (random init) in the pipeline; the
cheap border-statistics fallback is a secondary A/B. BASELINE target:
< 5 s per 32-frame clip on v5e. Weights are random (no reference checkpoints
exist in this environment); the compute path and data movement are identical
to a converted-weights run. Falls back to the synthetic blob assets when the
reference tree is not mounted.

Prints ONE JSON line on stdout (p50 of >= 10 timed runs). Secondary metrics
go to stderr:
  - run spread (p90 / min / max): the e2e number is host-sensitive — decode,
    sampling and GLB export run on host, so concurrent host load inflates it
    (measured round 3: a parallel pytest made 2.6 s runs read 80-130 s);
  - long-video sliding-window throughput (128 frames through 32-frame
    windows, frames/s);
  - model-only device seconds per clip (chained-iteration methodology:
    ``block_until_ready`` does not synchronise on tunneled backends) and
    inference MFU from the compiled programs' XLA flop counts;
  - real-segmentation cost (a randomly-initialised U2Net over one clip) —
    bounds the headline's segmentation-fallback caveat (see README).

All secondaries are also persisted as ``BENCH_extra.json`` next to this file
so each round's record is structured, not stderr-only.
"""

import json
import os
import sys
import time

import numpy as np

TARGET_SEC = 5.0
T, N_SHAPE = 32, 16384
PEAK_FLOPS = 197e12  # v5e bf16
REF_MESH = "/root/reference/examples/chili.glb"
REF_VIDEO = "/root/reference/examples/chili.mp4"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def ensure_assets(tmp="/tmp/motion324_bench"):
    if os.path.exists(REF_MESH) and os.path.exists(REF_VIDEO):
        return REF_MESH, REF_VIDEO
    log("reference examples not mounted - falling back to synthetic assets")
    os.makedirs(tmp, exist_ok=True)
    mesh = os.path.join(tmp, "blob.glb")
    video = os.path.join(tmp, "blob32.mp4")
    if not (os.path.exists(mesh) and os.path.exists(video)):
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "examples"))
        import make_synthetic_example as gen
        gen.main(["--out", tmp, "--frames", str(T)])
        os.rename(os.path.join(tmp, "blob.mp4"), video)
    return mesh, video


def main():
    from motion324_tpu.utils.jit_cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from motion324_tpu.inference.pipeline import MotionPipeline
    from motion324_tpu.models.motion_model import ModelConfig, MotionLatentModel

    extra = {}  # secondary metrics, persisted to BENCH_extra.json at the end
    mesh_path, video_path = ensure_assets()
    # decode all 32 window frames in one decoder step (inference is
    # forward-only; the per-frame scan was dispatch-overhead-bound)
    cfg = ModelConfig(dtype=jnp.bfloat16, frames=12, decode_frames_chunk=T)
    model = MotionLatentModel(cfg)

    example = {k: jnp.zeros((1, 64, 3)) for k in
               ("ref_shape_pcd", "ref_shape_normals", "ref_shape_rgbs",
                "ref_pcd", "ref_normal", "ref_rgb")}
    example["rgb_video"] = jnp.zeros((1, 2, cfg.image_size, cfg.image_size, 3))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), example)

    pipeline = MotionPipeline(cfg, params, window=T)

    # The HEADLINE runs with the REAL U2Net segmentation network in the
    # pipeline (random weights — no released weights exist here; compute and
    # data movement are identical to a converted-weights run). The
    # border-statistics fallback is timed as a secondary A/B below.
    from motion324_tpu.inference.segmentation import U2Net
    seg_net = U2Net(dtype=jnp.bfloat16)
    seg_params = jax.jit(seg_net.init)(jax.random.PRNGKey(1),
                                       jnp.zeros((1, 64, 64, 3)))

    out_dir = "/tmp/motion324_bench/out"
    run = lambda: pipeline.run(mesh_path, video_path, out_dir,
                               num_shape_samples=N_SHAPE, max_frames=T,
                               segmentation_params=seg_params)
    run_fallback = lambda: pipeline.run(mesh_path, video_path, out_dir,
                                        num_shape_samples=N_SHAPE,
                                        max_frames=T)

    t0 = time.perf_counter()
    run()  # compile + warm caches
    run_fallback()  # warm the fallback-segmentation program variant too
    # warm the I420-wire program variant NOW too (same jitted callables via
    # programs_from; the dict-shaped video input is a new trace -> its XLA
    # compile cost 50 s mid-bench in r3 when it first ran inside the A/B)
    yuv_pipe = MotionPipeline(cfg, pipeline.params, window=T,
                              yuv420_upload=True, programs_from=pipeline)
    yuv_run = lambda: yuv_pipe.run(mesh_path, video_path, out_dir,
                                   num_shape_samples=N_SHAPE, max_frames=T)
    try:
        yuv_run()
    except Exception as e:
        log(f"yuv warm-up skipped: {e}")
    log(f"warm-up (incl. compile, both wire formats): "
        f"{time.perf_counter() - t0:.1f}s  "
        f"[{os.path.basename(mesh_path)} + {os.path.basename(video_path)}]")

    times = []
    for i in range(10):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    e2e = float(np.percentile(times, 50))
    p90 = float(np.percentile(times, 90))
    log(f"e2e per 32-frame clip (REAL U2Net segmentation in the pipeline) "
        f"over {len(times)} runs: p50 {e2e:.3f}s  "
        f"p90 {p90:.3f}s  min {min(times):.3f}s  max {max(times):.3f}s  "
        f"(spread is host-load-sensitive; see module docstring)")
    extra["e2e_sec"] = {"p50": round(e2e, 3), "p90": round(p90, 3),
                        "min": round(min(times), 3),
                        "max": round(max(times), 3), "runs": len(times),
                        "segmentation": "u2net_random_init"}

    # ---- secondary: border-statistics fallback segmentation A/B ------------
    try:
        ft = [_timed(run_fallback) for _ in range(5)]
        f_p50 = float(np.percentile(ft, 50))
        log(f"fallback-segmentation A/B: p50 {f_p50:.3f}s over {len(ft)} "
            f"runs (border-statistics in-graph; headline uses real U2Net)")
        extra["fallback_seg_p50_sec"] = round(f_p50, 3)
    except Exception as e:
        log(f"fallback-seg A/B skipped: {e}")

    # ---- secondary: long-video sliding-window throughput -------------------
    try:
        t0 = time.perf_counter()
        pipeline.run(mesh_path, video_path, out_dir,
                     num_shape_samples=N_SHAPE, max_frames=128)
        dt = time.perf_counter() - t0
        log(f"long-video: 128 frames via 32-frame sliding windows in "
            f"{dt:.2f}s ({128 / dt:.1f} frames/s e2e)")
        extra["long_video_128f"] = {"sec": round(dt, 2),
                                    "frames_per_s": round(128 / dt, 1)}
    except Exception as e:
        log(f"long-video bench skipped: {e}")

    # ---- secondary: I420 wire-format A/B (opt-in product flag; program
    # compiled during warm-up above) ------------------------------------
    try:
        yt = [_timed(yuv_run) for _ in range(5)]
        yuv_p50 = float(np.percentile(yt, 50))
        log(f"--yuv-upload A/B: p50 {yuv_p50:.3f}s over "
            f"{len(yt)} runs (vs {e2e:.3f}s RGB wire; upload 2.4 vs 4.8 MB)")
        extra["yuv_upload_p50_sec"] = round(yuv_p50, 3)
    except Exception as e:
        log(f"yuv A/B skipped: {e}")

    # ---- secondary: real-segmentation cost (headline caveat) ---------------
    # The in-graph segmentation in the headline runs is the border-statistics
    # fallback (no U2Net weights exist in this environment). Quantify the
    # caveat: device seconds for a REAL (randomly-initialised) U2Net forward
    # over one 32-frame clip at the pipeline's 224^2 working resolution —
    # the upper bound on what the headline gains if the fallback is swapped
    # for the real network.
    try:
        seg_sec = _u2net_cost(jax, jnp)
        log(f"real-segmentation cost: U2Net (bf16, random init) over a "
            f"{T}x224^2 clip: {seg_sec:.3f}s device "
            f"(headline delta bound if the border fallback were the real net)")
        extra["u2net_seg_sec_per_clip"] = round(seg_sec, 3)
    except Exception as e:
        log(f"u2net cost bench skipped: {e}")

    # ---- secondary: device-only model seconds + MFU ------------------------
    try:
        model_sec, mfu = _model_only(pipeline, jax, jnp)
        log(f"model-only device sec/clip: {model_sec:.3f}  "
            f"inference MFU: {mfu * 100:.1f}%")
        extra["model_only"] = {"sec_per_clip": round(model_sec, 3),
                               "mfu_pct": round(mfu * 100, 1)}
    except Exception as e:  # never fail the primary metric
        log(f"model-only bench skipped: {e}")

    # ---- secondary: batched multi-clip throughput (batch_inference --batch)
    # The decoder's frame-chunk is tuned to the batch: folded (chunk*B)
    # rows ~32 keep the fused MLP working set at the B=1 sweet spot
    # (B=8 decode was 69.6 ms/clip at chunk 32, 47.5 at chunk 4 — the
    # whole-window chunk spills at large B). batch_inference.py applies
    # the same rule.
    try:
        for b in (4, 8):
            cfg_b = ModelConfig(dtype=jnp.bfloat16, frames=12,
                                decode_frames_chunk=max(1, 32 // b))
            pipe_b = MotionPipeline(cfg_b, pipeline.params, window=T)
            sec, mfu = _model_only(pipe_b, jax, jnp, b=b)
            log(f"batched clips (B={b}, decode chunk {32 // b}): device "
                f"{sec:.3f}s/window = {b / sec:.1f} clips/s  "
                f"MFU {mfu * 100:.1f}%")
            extra[f"batched_B{b}"] = {"sec_per_window": round(sec, 3),
                                      "clips_per_s": round(b / sec, 1),
                                      "mfu_pct": round(mfu * 100, 1)}
    except Exception as e:
        log(f"batched throughput bench skipped: {e}")

    try:  # structured copy of the stderr secondaries for the record;
        # MERGE so records written by other benches (paint, golden-real
        # wall times) survive a bench.py rerun
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BENCH_extra.json")
        merged = {}
        if os.path.exists(path):
            with open(path) as f:
                merged = json.load(f)
        merged.update(extra)
        with open(path, "w") as f:
            json.dump(merged, f, indent=1)
    except (OSError, ValueError) as e:
        log(f"BENCH_extra.json not written: {e}")

    print(json.dumps({
        "metric": "e2e_sec_per_32frame_clip",
        "value": round(e2e, 3),
        "unit": "s",
        "vs_baseline": round(e2e / TARGET_SEC, 4),
    }))


def _inference_flops(b: int) -> float:
    """Analytic forward-flop count for one batched window (``b`` clips).

    XLA ``cost_analysis`` counts a ``lax.scan`` body ONCE (not x trip count),
    so it under-reported the alternating stack 8x and DINO 12x — the r3
    "21.9% inference MFU" was a measurement artifact. Same matmul+attention
    accounting as scripts/bench_train.py (model/Pcd_motion.py:394-429 shapes);
    Pallas attention flops are invisible to XLA either way.
    """
    C, L, H, D, mlp = 768, 324, 12, 64, 4
    S = T * L
    proj = 4 * 2 * b * S * C * C              # qkvo per block
    ffn = 2 * 2 * b * S * C * C * mlp         # fc1+fc2 per block
    attn_g = 4 * b * H * S * S * D            # QK^T + PV, global
    attn_l = 4 * b * H * T * L * L * D
    alt = 8 * (2 * (proj + ffn) + attn_g + attn_l)
    toks = b * T * 257                        # DINO ViT-B, 257 tokens/frame
    dino = 12 * (4 * 2 * toks * C * C + 2 * 2 * toks * C * C * mlp
                 + 4 * b * T * H * 257 * 257 * D)
    n = N_SHAPE                               # decoder: qo+ffn+head per frame
    dec = T * (2 * 2 * b * n * C * C + 2 * 2 * b * n * C * C * mlp
               + 2 * b * n * C * C) + 2 * 2 * b * n * C * C
    enc = 2 * 2 * b * N_SHAPE * C * C         # shape-encoder projections
    return float(alt + dino + dec + enc)


def _u2net_cost(jax, jnp):
    """Chained device timing of one U2Net forward over a (T, 224, 224, 3)
    clip — same serialisation trick as :func:`_model_only` (tunneled backends
    don't synchronise on ``block_until_ready``)."""
    from motion324_tpu.inference.segmentation import U2Net
    net = U2Net(dtype=jnp.bfloat16)
    x = jnp.zeros((T, 224, 224, 3), jnp.bfloat16)
    params = jax.jit(net.init)(jax.random.PRNGKey(0), x[:1])
    fwd = jax.jit(net.apply)

    def chain(n):
        s = jnp.float32(0.0)
        for _ in range(n):
            s = fwd(params, x + s.astype(x.dtype) * 0).mean()
        return float(s)

    chain(1)  # compile
    t1 = min(_timed(chain, 1) for _ in range(2))
    tn = min(_timed(chain, 4) for _ in range(2))
    return max(tn - t1, 0.0) / 3


def _model_only(pipeline, jax, jnp, b: int = 1):
    """Chained device-only timing of encode_shape+encode_video+decode at the
    bench shapes (``b`` clips per program), plus MFU from an analytic flop
    count (see :func:`_inference_flops`)."""
    r = np.random.RandomState(0)
    f32 = lambda *s: jnp.asarray(r.rand(*s).astype(np.float32))
    inputs = {
        "ref_shape_pcd": f32(b, N_SHAPE, 3),
        "ref_shape_normals": f32(b, N_SHAPE, 3),
        "ref_shape_rgbs": f32(b, N_SHAPE, 3),
        "ref_pcd": f32(b, N_SHAPE, 3), "ref_normal": f32(b, N_SHAPE, 3),
        "ref_rgb": f32(b, N_SHAPE, 3),
    }
    video = f32(b, T, 224, 224, 3)

    def one_clip(params, video, inputs):
        mesh = pipeline._encode_shape(params, inputs["ref_shape_pcd"],
                                      inputs["ref_shape_normals"],
                                      inputs["ref_shape_rgbs"])
        tokens = pipeline._encode_video(params, video, mesh)
        outs = []
        ck = pipeline.decode_chunk
        for i in range(0, N_SHAPE, ck):
            outs.append(pipeline._decode(
                params, tokens,
                inputs["ref_pcd"][:, i:i + ck],
                inputs["ref_normal"][:, i:i + ck],
                inputs["ref_rgb"][:, i:i + ck]))
        traj = jnp.concatenate(outs, axis=2)
        return traj.mean()

    def chain(n):
        s = jnp.float32(0.0)
        for _ in range(n):
            v = video + s * 1e-12  # data dependency serialises the chain
            s = one_clip(pipeline.params, v, inputs)
        return float(s)

    chain(1)
    t1 = min(_timed(chain, 1) for _ in range(3))
    tn = min(_timed(chain, 6) for _ in range(3))
    sec = max(tn - t1, 1e-9) / 5

    mfu = _inference_flops(b) / sec / PEAK_FLOPS
    return sec, mfu


def _timed(fn, *args):
    t0 = time.perf_counter()
    fn(*args)
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
