"""Inference CLI: existing mesh + video -> animated GLB.

Product-path equivalent of the reference's ``scripts/4D_from_existing.sh`` ->
``inference_with_video_mesh.py`` (reference: scripts/inference_with_video_mesh.py,
scripts/4D_from_existing.sh:55-66). Usage::

    python scripts/inference_with_video_mesh.py \
        --mesh examples/chili.glb --video examples/chili.mp4 \
        --checkpoint /path/to/ckpt --output ./outputs/chili \
        [training.frames=256 training.num_shape_samples=16384 ...]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--mesh", required=True, help="GLB/OBJ mesh path")
    parser.add_argument("--video", required=True, help="video path (mp4)")
    parser.add_argument("--checkpoint", default=None,
                        help="our Orbax dir, or a reference .pt to convert")
    parser.add_argument("--output", default="./outputs")
    parser.add_argument("--config", default="configs/dyscene.yaml")
    parser.add_argument("--max-frames", type=int, default=None)
    parser.add_argument("--no-smooth", action="store_true")
    parser.add_argument("--parallel", default=None, choices=("tp", "sp", "pp"),
                        help="multi-chip partitioning over the mp mesh axis: "
                             "'tp' tensor parallel, 'sp' sequence parallel "
                             "over frames (long windows)")
    parser.add_argument("--exact", action="store_true",
                        help="bit-exact float pipeline: f32 video upload and "
                             "f32 trajectory readback (no u8/u16 wire "
                             "quantization) for parity comparisons")
    parser.add_argument("--yuv-upload", action="store_true",
                        help="ship video as I420 planes (2x smaller upload; "
                             "mean wire error <1.5/255 on mp4 content, see "
                             "motion324_tpu/inference/yuv.py)")
    parser.add_argument("--no-segmentation", action="store_true",
                        help="skip foreground masking (reference default is "
                             "use_segmentation=True, 4D_from_existing.sh:62)")
    parser.add_argument("--u2net", default=None,
                        help="U2Net .pt weights: run the real segmentation "
                             "network instead of the border-statistics "
                             "fallback (reference inference_utils.py:237)")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    from motion324_tpu.utils.jit_cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from motion324_tpu.config import load_config
    from motion324_tpu.inference.pipeline import MotionPipeline
    from motion324_tpu.models.motion_model import ModelConfig, MotionLatentModel
    from motion324_tpu.utils.logging import log

    cfg = load_config(args.config, args.overrides)
    mcfg = ModelConfig.from_config(cfg, dtype="bfloat16", remat=False)
    # inference is forward-only: decode the whole window per decoder
    # step (the training-sized chunk left a dispatch-bound frame scan)
    import dataclasses
    mcfg = dataclasses.replace(mcfg,
                               decode_frames_chunk=int(cfg.training.frames))
    model = MotionLatentModel(mcfg)

    if args.checkpoint and args.checkpoint.endswith(".pt"):
        from motion324_tpu.utils.torch_convert import (
            convert_motion_checkpoint, load_torch_state_dict)
        params = convert_motion_checkpoint(load_torch_state_dict(args.checkpoint))
        log(f"converted torch checkpoint {args.checkpoint}")
    elif args.checkpoint:
        from motion324_tpu.training.checkpoints import restore_params
        example = {
            "ref_shape_pcd": jnp.zeros((1, 64, 3)), "ref_shape_normals": jnp.zeros((1, 64, 3)),
            "ref_shape_rgbs": jnp.zeros((1, 64, 3)), "ref_pcd": jnp.zeros((1, 64, 3)),
            "ref_normal": jnp.zeros((1, 64, 3)), "ref_rgb": jnp.zeros((1, 64, 3)),
            "rgb_video": jnp.zeros((1, 2, 28, 28, 3)),
        }
        template = jax.eval_shape(model.init, jax.random.PRNGKey(0), example)
        params = restore_params(args.checkpoint, template)
        log(f"restored checkpoint {args.checkpoint}")
    else:
        log("WARNING: no checkpoint given; using random weights (smoke mode)")
        example = {k: jnp.zeros((1, 64, 3)) for k in
                   ("ref_shape_pcd", "ref_shape_normals", "ref_shape_rgbs",
                    "ref_pcd", "ref_normal", "ref_rgb")}
        example["rgb_video"] = jnp.zeros((1, 2, mcfg.image_size, mcfg.image_size, 3))
        params = jax.jit(model.init)(jax.random.PRNGKey(0), example)

    mesh = None
    if args.parallel:
        from motion324_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(dp=1, mp=len(jax.devices()))
    seg_params = None
    if args.u2net:
        from motion324_tpu.utils.torch_convert import (convert_u2net,
                                                       load_torch_state_dict)
        seg_params = convert_u2net(load_torch_state_dict(args.u2net))
        log(f"loaded U2Net segmentation weights from {args.u2net}")

    pipeline = MotionPipeline(mcfg, params, window=int(cfg.training.frames),
                              mesh=mesh, parallel=args.parallel or "tp",
                              u16_readback=not args.exact,
                              yuv420_upload=args.yuv_upload and not args.exact)
    out = pipeline.run(args.mesh, args.video, args.output,
                       num_shape_samples=int(cfg.training.get(
                           "num_shape_samples", 16384)),
                       smooth=not args.no_smooth, max_frames=args.max_frames,
                       use_segmentation=not args.no_segmentation,
                       segmentation_params=seg_params)
    log(f"done: {out}")


if __name__ == "__main__":
    sys.exit(main())
