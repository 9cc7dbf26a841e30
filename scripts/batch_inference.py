"""CLI: batch sliding-window inference over a list of long videos.

The `long_videos.txt` batch driver from the BASELINE configs: one line per
job, ``mesh_path video_path`` (or just ``video_path`` for the video-only
path). Shares one compiled pipeline across all clips — the window length and
decode chunks are static shapes, so every clip after the first runs without
recompilation.

Usage::

    python scripts/batch_inference.py --list long_videos.txt \
        --checkpoint ckpt.pt --output ./outputs/batch [training.frames=256]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--list", required=True, dest="list_path")
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--output", default="./outputs/batch")
    parser.add_argument("--config", default="configs/dyscene.yaml")
    parser.add_argument("--parallel", default=None, choices=("tp", "sp", "pp"),
                        help="multi-chip partitioning over the mp mesh axis "
                             "('sp' shards the frame axis: right for the "
                             "long-video windows this driver batches)")
    parser.add_argument("--yuv-upload", action="store_true",
                        help="ship videos as I420 planes (2x smaller upload)")
    parser.add_argument("--u2net", default=None,
                        help="U2Net .pt weights: real in-graph segmentation "
                             "instead of the border-statistics fallback")
    parser.add_argument("--batch", type=int, default=1,
                        help="clips per device program: jobs are grouped by "
                             "decoded video shape and predicted at batch B "
                             "(throughput mode; B=1 runs jobs one at a time)")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    from motion324_tpu.utils.jit_cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import numpy as np

    from motion324_tpu.config import load_config
    from motion324_tpu.inference.pipeline import MotionPipeline
    from motion324_tpu.models.motion_model import ModelConfig, MotionLatentModel
    from motion324_tpu.utils.logging import log

    cfg = load_config(args.config, args.overrides)
    mcfg = ModelConfig.from_config(cfg, dtype="bfloat16", remat=False)
    # inference is forward-only: decode whole frame-chunks per decoder scan
    # step. The sweet spot is a FOLDED batch (chunk x B) of ~32 rows: at
    # B=1 the whole window in one step (the training-sized chunk left a
    # dispatch-bound frame scan), at B=8 a 4-frame chunk — the fused
    # (chunk*B, N, 4C) MLP working set otherwise spills (measured r5:
    # B=8 decode 69.6 -> 47.5 ms/clip at chunk 32 -> 4).
    import dataclasses
    window = int(cfg.training.frames)
    chunk = max(1, min(window, 32 // max(args.batch, 1)))
    while window % chunk:
        chunk -= 1
    mcfg = dataclasses.replace(mcfg, decode_frames_chunk=chunk)
    model = MotionLatentModel(mcfg)

    if args.checkpoint and args.checkpoint.endswith(".pt"):
        from motion324_tpu.utils.torch_convert import (
            convert_motion_checkpoint, load_torch_state_dict)
        params = convert_motion_checkpoint(load_torch_state_dict(args.checkpoint))
    else:
        import jax.numpy as jnp
        example = {k: jnp.zeros((1, 64, 3)) for k in
                   ("ref_shape_pcd", "ref_shape_normals", "ref_shape_rgbs",
                    "ref_pcd", "ref_normal", "ref_rgb")}
        example["rgb_video"] = jnp.zeros((1, 2, mcfg.image_size,
                                          mcfg.image_size, 3))
        params = jax.jit(model.init)(jax.random.PRNGKey(0), example)
        log("WARNING: random weights (no --checkpoint)")

    seg_params = None
    if args.u2net:
        from motion324_tpu.utils.torch_convert import (convert_u2net,
                                                       load_torch_state_dict)
        seg_params = convert_u2net(load_torch_state_dict(args.u2net))
        log(f"loaded U2Net segmentation weights from {args.u2net}")

    mesh = None
    if args.parallel:
        from motion324_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(dp=1, mp=len(jax.devices()))
    pipeline = MotionPipeline(mcfg, params, window=window,
                              mesh=mesh, parallel=args.parallel or "tp",
                              yuv420_upload=args.yuv_upload,
                              seg_params=seg_params)

    with open(args.list_path) as f:
        jobs = [line.split() for line in f if line.strip()
                and not line.startswith("#")]
    log(f"{len(jobs)} jobs from {args.list_path}")

    n_samples = int(cfg.training.get("num_shape_samples", 16384))
    failures = 0
    good = [j for j in jobs if len(j) >= 2]
    failures += len(jobs) - len(good)
    for j in jobs:
        if len(j) < 2:
            log(f"skipping malformed line: {j}")

    if args.batch > 1:
        # throughput mode: run_batch groups same-shape clips and predicts
        # them at batch B in one program per window
        for i in range(0, len(good), args.batch):
            chunk = [(j[0], j[1]) for j in good[i:i + args.batch]]
            try:
                pipeline.run_batch(chunk, args.output,
                                   num_shape_samples=n_samples)
            except Exception as e:
                # keep the B=1 path's per-job isolation: retry the chunk's
                # jobs individually so one bad asset fails one job, not B
                log(f"batch group {i // args.batch} failed ({e!r}); "
                    f"retrying its {len(chunk)} jobs individually")
                for mesh_path, video_path in chunk:
                    stem = os.path.splitext(os.path.basename(video_path))[0]
                    try:
                        pipeline.run(mesh_path, video_path,
                                     os.path.join(args.output, stem),
                                     num_shape_samples=n_samples)
                    except Exception as e2:
                        log(f"job {stem} FAILED: {e2!r}")
                        failures += 1
    else:
        for job in good:
            mesh_path, video_path = job[0], job[1]
            stem = os.path.splitext(os.path.basename(video_path))[0]
            out_dir = os.path.join(args.output, stem)
            try:
                pipeline.run(mesh_path, video_path, out_dir,
                             num_shape_samples=n_samples)
            except Exception as e:  # keep the batch going (reference batch mode)
                log(f"job {stem} FAILED: {e!r}")
                failures += 1
    log(f"batch done: {len(jobs) - failures}/{len(jobs)} succeeded")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
