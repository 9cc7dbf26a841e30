"""Inference CLI: video only -> generated mesh -> animated GLB.

Product-path equivalent of the reference's ``scripts/4D_from_video.sh`` three
stages (reference: scripts/4D_from_video.sh:57-105, rmbg_for_black_bg.py,
hunyuan_Gen.py, inference_with_video_only.py):

1. preprocess: per-frame foreground segmentation, global bbox, 512^2 crops;
2. shape+texture generation from the first frame (flow-matching DiT ->
   ShapeVAE -> marching cubes -> cleanup -> UV unwrap + multiview texture);
3. motion: MotionLatentModel over the full video, sliding windows, smoothing,
   animated-GLB export.

Without trained generation weights (--shapegen-random), stages 2-3 still run
end-to-end on random weights for pipeline validation.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--video", required=True)
    parser.add_argument("--output", default="./outputs/video_only")
    parser.add_argument("--config", default="configs/dyscene.yaml")
    parser.add_argument("--checkpoint", default=None,
                        help="motion model checkpoint (.pt converts)")
    parser.add_argument("--max-frames", type=int, default=None)
    parser.add_argument("--octree-resolution", type=int, default=384)
    parser.add_argument("--max-faces", type=int, default=40000)
    parser.add_argument("--steps", type=int, default=50)
    parser.add_argument("--texture", action="store_true",
                        help="run the multiview texture pipeline")
    parser.add_argument("--hy3d-ckpt", default=None,
                        help="Hunyuan3D-2 single-file ckpt "
                             "(hunyuan3d-dit-v2-0/model.fp16.ckpt) for the "
                             "shape pipeline; omitted = random weights")
    parser.add_argument("--shape-tiny", action="store_true",
                        help="tiny random shape pipeline (CI smoke: the "
                             "full-dim random conditioner is minutes of "
                             "wasted CPU when no weights exist anyway)")
    parser.add_argument("--u2net", default=None,
                        help="U2Net .pt weights for the frame segmentation "
                             "stage (else border-statistics fallback; "
                             "reference rmbg_for_black_bg.py:26)")
    parser.add_argument("--paint-unet", default=None,
                        help="HunyuanPaint UNet2p5D .pt (diffusers layout); "
                             "with --paint-vae enables the real multiview "
                             "diffusion texture synthesizer")
    parser.add_argument("--paint-vae", default=None,
                        help="SD AutoencoderKL .pt for the paint pipeline")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    from motion324_tpu.utils.jit_cache import enable_compilation_cache
    enable_compilation_cache()

    import jax.numpy as jnp
    import numpy as np

    from motion324_tpu.config import load_config
    from motion324_tpu.hy3dgen.paint_pipeline import PaintPipeline
    from motion324_tpu.hy3dgen.postprocess import (reduce_faces,
                                                   remove_degenerate,
                                                   remove_floaters)
    from motion324_tpu.hy3dgen.shape_pipeline import ShapeGenPipeline
    from motion324_tpu.inference.pipeline import (MotionPipeline, load_video,
                                                  prepare_mesh_inputs,
                                                  to_blender_coords)
    from motion324_tpu.inference.preprocess import preprocess_video_frames
    from motion324_tpu.inference.smoothing import smooth_trajectories
    from motion324_tpu.io.glb import export_animated_glb, export_glb
    from motion324_tpu.io.mesh import normalize_unit_cube
    from motion324_tpu.utils.logging import log

    cfg = load_config(args.config, args.overrides)
    os.makedirs(args.output, exist_ok=True)

    # ---- stage 1: preprocess ------------------------------------------ #
    seg_params = None
    if args.u2net:
        from motion324_tpu.utils.torch_convert import (convert_u2net,
                                                       load_torch_state_dict)
        seg_params = convert_u2net(load_torch_state_dict(args.u2net))
        log(f"loaded U2Net segmentation weights from {args.u2net}")
    raw = load_video(args.video, args.max_frames)
    frames, masks, bbox = preprocess_video_frames(raw, size=512,
                                                  params=seg_params)
    log(f"preprocessed {len(frames)} frames, bbox={bbox}")

    # ---- stage 2: shape (+texture) from the first frame ---------------- #
    if args.hy3d_ckpt:
        pipe = ShapeGenPipeline.from_hunyuan_ckpt(args.hy3d_ckpt)
        log(f"loaded Hunyuan3D shape weights from {args.hy3d_ckpt}")
    elif args.shape_tiny:
        pipe = ShapeGenPipeline.init_random(
            image_size=224, cond_dim=256, cond_depth=2, cond_heads=4,
            dit_hidden=128, dit_heads=4, dit_depth=2, dit_single=2,
            vae_width=128, vae_heads=4, vae_layers=2, num_latents=64,
            latent_dim=8)
    else:
        pipe = ShapeGenPipeline.init_random(image_size=518)
    mesh = pipe(frames[0], num_inference_steps=args.steps,
                octree_resolution=args.octree_resolution)
    if len(mesh.faces) > 4_000_000:
        # random/degenerate weights can emit a noise-level occupancy field
        # whose 385^3 marching-cubes surface has 1e8+ faces; QEM and the
        # component scan would grind for hours. O(F) grid clustering first.
        log(f"raw mesh has {len(mesh.faces)} faces (noise-level shape "
            "output); cluster-decimating before cleanup")
        mesh = reduce_faces(mesh, 2_000_000, method="cluster")
    mesh = remove_floaters(mesh)
    mesh = remove_degenerate(mesh)
    mesh = reduce_faces(mesh, args.max_faces)
    log(f"cleaned mesh: {len(mesh.vertices)} verts {len(mesh.faces)} faces")
    pipe.params = None  # release the shape models' HBM before paint/motion
    del pipe

    if args.texture and len(mesh.faces):
        if args.paint_unet and args.paint_vae:
            import torch

            from motion324_tpu.hy3dgen.paint_diffusion import MultiviewDiffusion
            unet_sd = {k: v.float().numpy() for k, v in torch.load(
                args.paint_unet, map_location="cpu",
                weights_only=True).items()}
            vae_sd = {k: v.float().numpy() for k, v in torch.load(
                args.paint_vae, map_location="cpu",
                weights_only=True).items()}
            # learned text embeddings live inside the UNet2p5D state dict
            # (reference modules.py:447-448)
            text_gen = unet_sd.pop("unet.learned_text_clip_gen")[None]
            text_ref = unet_sd.pop("unet.learned_text_clip_ref")[None]
            mv = MultiviewDiffusion.from_diffusers(
                unet_sd, vae_sd, text_gen, text_ref,
                context_dim=text_gen.shape[-1])
            painter = PaintPipeline(multiview_model=mv)
            log(f"loaded HunyuanPaint weights from {args.paint_unet}")
        else:
            painter = PaintPipeline()
        mesh = painter(mesh, frames[0])
        painter.multiview_model = None  # release paint HBM before motion
        del painter
    if len(mesh.faces):
        export_glb(os.path.join(args.output, "generated_mesh.glb"),
                   mesh.vertices, mesh.faces, uv=mesh.uv, texture=mesh.texture)

    if not len(mesh.faces):
        log("WARNING: shape generation produced an empty mesh "
            "(random weights?); stopping before motion")
        return 1

    # ---- stage 3: motion ----------------------------------------------- #
    from motion324_tpu.models.motion_model import ModelConfig, MotionLatentModel
    import jax

    mcfg = ModelConfig.from_config(cfg, dtype="bfloat16", remat=False)
    # inference is forward-only: decode the whole window per decoder
    # step (the training-sized chunk left a dispatch-bound frame scan)
    import dataclasses
    mcfg = dataclasses.replace(mcfg,
                               decode_frames_chunk=int(cfg.training.frames))
    model = MotionLatentModel(mcfg)
    inputs, _, norm_mesh = prepare_mesh_inputs(
        mesh, int(cfg.training.get("num_shape_samples", 16384)))

    if args.checkpoint and args.checkpoint.endswith(".pt"):
        from motion324_tpu.utils.torch_convert import (
            convert_motion_checkpoint, load_torch_state_dict)
        params = convert_motion_checkpoint(load_torch_state_dict(args.checkpoint))
    else:
        example = dict(inputs, rgb_video=np.zeros(
            (1, 2, mcfg.image_size, mcfg.image_size, 3), np.float32))
        params = jax.jit(model.init)(jax.random.PRNGKey(0), example)
        log("WARNING: motion model running with random weights")

    motion = MotionPipeline(mcfg, params, window=int(cfg.training.frames))
    trajs = motion.predict(inputs, frames)
    trajs = smooth_trajectories(trajs, method="combined",
                                motion_threshold=0.002, sigma=1.0)

    out_path = os.path.join(args.output, "output_animation.glb")
    export_animated_glb(out_path, to_blender_coords(norm_mesh.vertices),
                        norm_mesh.faces, to_blender_coords(trajs[0]),
                        uv=norm_mesh.uv, texture=norm_mesh.texture)
    # the reference's video-only product emits FBX
    # (inference_with_video_only.py:596-604 via bpy); ours writes it natively
    from motion324_tpu.io.fbx import export_animated_fbx
    fbx_path = os.path.join(args.output, "output_animation.fbx")
    export_animated_fbx(fbx_path, to_blender_coords(norm_mesh.vertices),
                        norm_mesh.faces, to_blender_coords(trajs[0]),
                        uv=norm_mesh.uv)
    log(f"done: {out_path} + {fbx_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
