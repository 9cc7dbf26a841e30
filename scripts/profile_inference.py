"""Trace the batched model-only inference program and report top device ops.

The r3 bench showed batched inference saturating at ~5.2 clips/s from B=4
(B=8 buys nothing) at ~20% MFU, with no trace-driven analysis of WHERE the
device time goes (VERDICT r3 weak #1). This script runs the same program
bench.py's ``_model_only`` times — encode_shape + encode_video + chunked
decode for B clips — under ``jax.profiler.trace`` and aggregates the device
trace by op, so the saturation cause is measurable instead of guessed::

    python scripts/profile_inference.py --batch 8 [--trace-dir /tmp/infer_trace]

Works over the axon tunnel (the profiler plugin supports it; parse the
written ``*.trace.json.gz`` like TODO.md's training traces).
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

T = 32
N_SHAPE = 16384


def parse_trace(trace_dir: str, top: int = 25):
    """Aggregate device-op durations from a jax.profiler chrome trace."""
    paths = glob.glob(os.path.join(trace_dir, "plugins", "profile",
                                   "*", "*.trace.json.gz"))
    if not paths:
        raise FileNotFoundError(f"no trace under {trace_dir}")
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device PIDs: process_name metadata containing 'TPU' / 'Device'
    dev_pids = {e["pid"] for e in events
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and any(k in str(e.get("args", {}).get("name", ""))
                        for k in ("TPU", "Device", "device"))}
    # skip the host-side pids (python, plugins)
    agg = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        if name.startswith(("$", "process_")):
            continue
        dur = float(e.get("dur", 0.0)) / 1e3  # us -> ms
        agg[name] += dur
        total += dur
    rows = sorted(agg.items(), key=lambda kv: -kv[1])[:top]
    return rows, total


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--trace-dir", default="/tmp/motion324_infer_trace")
    p.add_argument("--parse-only", action="store_true",
                   help="just re-parse an existing trace dir")
    p.add_argument("--top", type=int, default=25)
    args = p.parse_args(argv)

    if not args.parse_only:
        import jax
        import jax.numpy as jnp
        import numpy as np

        from motion324_tpu.inference.pipeline import MotionPipeline
        from motion324_tpu.models.motion_model import (ModelConfig,
                                                       MotionLatentModel)

        b = args.batch
        cfg = ModelConfig(dtype=jnp.bfloat16, frames=12,
                          decode_frames_chunk=T)
        model = MotionLatentModel(cfg)
        example = {k: jnp.zeros((1, 64, 3)) for k in
                   ("ref_shape_pcd", "ref_shape_normals", "ref_shape_rgbs",
                    "ref_pcd", "ref_normal", "ref_rgb")}
        example["rgb_video"] = jnp.zeros((1, 2, cfg.image_size,
                                          cfg.image_size, 3))
        params = jax.jit(model.init)(jax.random.PRNGKey(0), example)
        pipeline = MotionPipeline(cfg, params, window=T)

        r = np.random.RandomState(0)
        f32 = lambda *s: jnp.asarray(r.rand(*s).astype(np.float32))
        inputs = {k: f32(b, N_SHAPE, 3) for k in
                  ("ref_shape_pcd", "ref_shape_normals", "ref_shape_rgbs",
                   "ref_pcd", "ref_normal", "ref_rgb")}
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
            return jnp.concatenate(outs, axis=2).mean()

        float(one_clip(pipeline.params, video, inputs))  # compile + warm
        t0 = time.perf_counter()
        float(one_clip(pipeline.params, video, inputs))
        wall = time.perf_counter() - t0
        print(f"B={b}: {wall:.3f}s/window = {b / wall:.2f} clips/s "
              f"(incl. ~26 ms tunnel latency)", flush=True)

        with jax.profiler.trace(args.trace_dir):
            float(one_clip(pipeline.params, video, inputs))

    rows, total = parse_trace(args.trace_dir, args.top)
    print(f"\ndevice total: {total:.1f} ms")
    for name, ms in rows:
        print(f"  {ms:8.2f} ms  {ms / max(total, 1e-9) * 100:5.1f}%  "
              f"{name[:110]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
