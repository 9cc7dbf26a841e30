"""Synthesize random weight files in the EXACT released-checkpoint layouts.

Real released weights cannot be downloaded in this environment (no egress),
so this generates random-valued files with the same key names, shapes, and
container formats the real ones ship in, at full product dims — letting the
entire real-weights path (`scripts/golden_eval.py --mode real`) execute end
to end before weights ever arrive. The layouts:

  motion.pt      reference ``Motion_Latent_Model`` torch state dict (768-d,
                 8 global/local pairs, 4 pcd layers) with the frozen DINOv2
                 ViT-B/14 under ``image_encoder.model.*`` in torch-hub naming
                 (reference train.py:254-269 checkpoint contents; consumed by
                 utils/torch_convert.convert_motion_checkpoint).
  hy3d_dit.ckpt  Hunyuan3D-2 single-file ckpt: ``{'model','vae',
                 'conditioner'}`` state dicts produced by instantiating the
                 REFERENCE torch modules at release dims (DiT 1024/16h/16+32,
                 ShapeVAE 1024w/16L, DINOv2-giant 1536/40L SwiGLU) — the
                 snapshot file hunyuan3d-dit-v2-0/model.fp16.ckpt (reference
                 shapegen/pipelines.py:130-193; consumed by
                 ShapeGenPipeline.from_hunyuan_ckpt).
  paint_unet.pt  HunyuanPaint UNet2p5D diffusers state dict: ``unet.``-
                 prefixed SD-2-class UNet + refview/multiview attentions +
                 camera ``class_embedding`` + the two learned text embeddings
                 (reference hunyuanpaint/unet/modules.py:404-599; consumed by
                 utils/sd_convert.convert_sd_unet).
  paint_vae.pt   diffusers AutoencoderKL state dict (SD VAE).
  u2net.pt       public U-2-Net full-size state dict (consumed by
                 utils/torch_convert.convert_u2net).

Generated motion weights are STRUCTURE-VALIDATED in-process: the converted
tree must match ``MotionLatentModel.init`` leaf-for-leaf at the full config.
Values are seeded-random at realistic init scales (attention/MLP weights
~N(0, 0.02), norms ~1), so full pipelines run at sane activation magnitudes.

Usage::

    python scripts/make_synthetic_weights.py --output ./weights
    python scripts/make_synthetic_weights.py --output /tmp/w --tiny  # CI
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


# --------------------------------------------------------------------------- #
# motion.pt — reference Motion_Latent_Model layout
# --------------------------------------------------------------------------- #
def motion_state_dict(rng, dim=768, head=64, tokens=64, pairs=8, pcd=4,
                      point_hidden=48, dino_depth=12, dino_dim=768,
                      dino_mlp=3072):
    """Reference-named state dict (model/Pcd_motion.py:268-341 module names,
    model/transformer.py parameter layout; DINOv2 in torch-hub naming)."""
    import numpy as np
    sd = {}

    def dense(name, din, dout, bias=False, scale=0.02):
        sd[f"{name}.weight"] = (rng.randn(dout, din) * scale).astype("f2")
        if bias:
            sd[f"{name}.bias"] = np.zeros(dout, "f2")

    def ln(name, d, bias=False):
        sd[f"{name}.weight"] = np.ones(d, "f2")
        if bias:
            sd[f"{name}.bias"] = np.zeros(d, "f2")

    def rms(name, d):
        sd[f"{name}.weight"] = np.ones(d, "f2")

    def self_block(name):
        ln(f"{name}.norm1", dim)
        dense(f"{name}.attn.to_qkv", dim, 3 * dim)
        dense(f"{name}.attn.fc", dim, dim)
        rms(f"{name}.attn.q_norm", head)
        rms(f"{name}.attn.k_norm", head)
        ln(f"{name}.norm2", dim)
        dense(f"{name}.mlp.mlp.0", dim, 4 * dim)
        dense(f"{name}.mlp.mlp.2", 4 * dim, dim)

    def cross_block(name):
        ln(f"{name}.norm_q", dim)
        ln(f"{name}.norm_kv", dim)
        for p in ("to_q", "to_k", "to_v", "fc"):
            dense(f"{name}.attn.{p}", dim, dim)
        rms(f"{name}.attn.q_norm", head)
        rms(f"{name}.attn.k_norm", head)
        ln(f"{name}.norm2", dim)
        dense(f"{name}.mlp.mlp.0", dim, 4 * dim)
        dense(f"{name}.mlp.mlp.2", 4 * dim, dim)

    sd["learnable_tokens"] = (rng.randn(1, tokens, dim) * 0.02).astype("f2")
    sd["special_token_0"] = (rng.randn(1, 4, dim) * 0.02).astype("f2")
    sd["special_token_rest"] = (rng.randn(1, 4, dim) * 0.02).astype("f2")
    dense("point_embed.mlp", point_hidden + 3, dim, bias=True)
    dense("point_normal_rgb_proj", dim + 6, dim, bias=True)
    cross_block("encoder_cross_attn")
    cross_block("decoder_cross_attn")
    ln("transformer_input_layernorm", dim)
    ln("shared_mlp_output.0", dim, bias=True)
    dense("shared_mlp_output.1", dim, dim, bias=True)
    dense("shared_mlp_output.3", dim, 3, bias=True)
    for i in range(pcd):
        self_block(f"points_transformer_blocks.{i}")
    for i in range(pairs):
        self_block(f"global_transformer_blocks.{i}")
        self_block(f"local_transformer_blocks.{i}")

    # frozen DINOv2 ViT-B/14, torch-hub layout under image_encoder.model.
    # (pos_embed native grid 37x37 + cls = 1370 slots: 518px pretraining)
    d = f"image_encoder.model"
    sd[f"{d}.cls_token"] = (rng.randn(1, 1, dino_dim) * 0.02).astype("f2")
    sd[f"{d}.pos_embed"] = (rng.randn(1, 1370, dino_dim) * 0.02).astype("f2")
    sd[f"{d}.patch_embed.proj.weight"] = (
        rng.randn(dino_dim, 3, 14, 14) * 0.02).astype("f2")
    sd[f"{d}.patch_embed.proj.bias"] = np.zeros(dino_dim, "f2")
    for i in range(dino_depth):
        b = f"{d}.blocks.{i}"
        ln(f"{b}.norm1", dino_dim, bias=True)
        dense(f"{b}.attn.qkv", dino_dim, 3 * dino_dim, bias=True)
        dense(f"{b}.attn.proj", dino_dim, dino_dim, bias=True)
        sd[f"{b}.ls1.gamma"] = np.full(dino_dim, 1e-5, "f2")
        ln(f"{b}.norm2", dino_dim, bias=True)
        dense(f"{b}.mlp.fc1", dino_dim, dino_mlp, bias=True)
        dense(f"{b}.mlp.fc2", dino_mlp, dino_dim, bias=True)
        sd[f"{b}.ls2.gamma"] = np.full(dino_dim, 1e-5, "f2")
    ln(f"{d}.norm", dino_dim, bias=True)
    return sd


def validate_motion(sd, tiny: bool):
    """Converted tree must match MotionLatentModel.init leaf-for-leaf."""
    import jax
    import numpy as np

    from motion324_tpu.models.motion_model import (ModelConfig,
                                                   MotionLatentModel)
    from motion324_tpu.utils.torch_convert import convert_motion_checkpoint

    npsd = {k: np.asarray(v, np.float32) for k, v in sd.items()}
    if tiny:
        cfg = ModelConfig(feat_dim=96, tokens=8, pcd_layers=1,
                          n_alternating_layers=2, head_dim=24, frames=2,
                          image_size=28, dino_depth=2, dino_heads=2)
        conv = convert_motion_checkpoint(npsd, n_pairs=1, pcd_layers=1)
    else:
        cfg = ModelConfig()
        conv = convert_motion_checkpoint(npsd)
    model = MotionLatentModel(cfg)
    sample = {k: np.zeros((1, 8, 3), np.float32) for k in
              ("ref_shape_pcd", "ref_shape_normals", "ref_shape_rgbs",
               "ref_pcd", "ref_normal", "ref_rgb")}
    sample["rgb_video"] = np.zeros(
        (1, 2, cfg.image_size, cfg.image_size, 3), np.float32)
    init = jax.eval_shape(model.init, jax.random.PRNGKey(0), sample)
    want = {jax.tree_util.keystr(k): v.shape for k, v in
            jax.tree_util.tree_flatten_with_path(init)[0]}
    got = {jax.tree_util.keystr(k): np.shape(v) for k, v in
           jax.tree_util.tree_flatten_with_path(conv)[0]}
    assert want == got, (
        "motion layout drifted from MotionLatentModel.init:\n"
        f"missing: {sorted(set(want) - set(got))[:8]}\n"
        f"extra:   {sorted(set(got) - set(want))[:8]}\n"
        f"shape-mismatch: "
        f"{[(k, got[k], want[k]) for k in want if k in got and want[k] != got[k]][:8]}")


# --------------------------------------------------------------------------- #
# hy3d_dit.ckpt — reference torch modules at release dims
# --------------------------------------------------------------------------- #
def hy3d_ckpt(tiny: bool):
    import torch

    from ref_oracle import ref_dit_module, ref_shape_vae
    mod = ref_dit_module()
    torch.manual_seed(0)
    if tiny:
        dit = mod.Hunyuan3DDiT(in_channels=8, context_in_dim=24,
                               hidden_size=32, num_heads=4, depth=2,
                               depth_single_blocks=3, axes_dim=[8])
        vae = ref_shape_vae()(num_latents=16, embed_dim=8, num_freqs=8,
                              include_pi=True, heads=4, width=32,
                              num_decoder_layers=2)
        dino_cfg = dict(hidden_size=24, num_hidden_layers=2,
                        num_attention_heads=4, intermediate_size=48,
                        use_swiglu_ffn=True,  # like the real giant
                        patch_size=14, image_size=28)
    else:
        dit = mod.Hunyuan3DDiT(in_channels=64, context_in_dim=1536,
                               hidden_size=1024, num_heads=16, depth=16,
                               depth_single_blocks=32, axes_dim=[64])
        vae = ref_shape_vae()(num_latents=512, embed_dim=64, num_freqs=8,
                              include_pi=True, heads=16, width=1024,
                              num_decoder_layers=16)
        # DINOv2-giant conditioner: 1536-d, 40 layers, SwiGLU FFN
        dino_cfg = dict(hidden_size=1536, num_hidden_layers=40,
                        num_attention_heads=24, intermediate_size=4096,
                        use_swiglu_ffn=True, patch_size=14, image_size=518)

    import transformers
    dino = transformers.Dinov2Model(transformers.Dinov2Config(**dino_cfg))
    cond_sd = {f"main_image_encoder.model.{k}": v.half()
               for k, v in dino.state_dict().items()}
    return {"model": {k: v.half() for k, v in dit.state_dict().items()},
            "vae": {k: v.half() for k, v in vae.state_dict().items()},
            "conditioner": cond_sd}


# --------------------------------------------------------------------------- #
# paint_unet.pt / paint_vae.pt — diffusers layout via the synth exporters
# --------------------------------------------------------------------------- #
def paint_state_dicts(tiny: bool):
    import numpy as np
    import torch

    from motion324_tpu.hy3dgen.paint_diffusion import MultiviewDiffusion
    from test_sd_convert import synth_unet_sd, synth_vae_sd

    if tiny:
        from motion324_tpu.hy3dgen.sd_unet import UNet2p5D
        from motion324_tpu.hy3dgen.sd_vae import AutoencoderKL
        mv = MultiviewDiffusion.init_random(
            image_size=64, context_dim=32,
            unet=UNet2p5D(block_channels=(8, 8, 8, 8), context_dim=32,
                          head_dim=8),
            vae=AutoencoderKL(block_channels=(4, 4, 4, 4)))
    else:
        mv = MultiviewDiffusion.init_random(image_size=512)

    def t16(sd):
        # via f32: jax commits params in bf16, which torch can't ingest
        return {k: torch.from_numpy(np.asarray(v, np.float32)).half()
                for k, v in sd.items()}

    unet_sd = synth_unet_sd({"params": mv.params["unet"]["params"]},
                            prefix="unet.")
    # the two learned text embeddings live inside the UNet2p5D state dict
    # (reference modules.py:447-448)
    unet_sd["unet.learned_text_clip_gen"] = np.asarray(
        mv.params["text_gen"])[0]
    unet_sd["unet.learned_text_clip_ref"] = np.asarray(
        mv.params["text_ref"])[0]
    vae_sd = synth_vae_sd({"params": mv.params["vae"]["params"]})
    return t16(unet_sd), t16(vae_sd)


# --------------------------------------------------------------------------- #
def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--output", required=True)
    p.add_argument("--tiny", action="store_true",
                   help="small dims for CI (same layouts)")
    p.add_argument("--only", nargs="+", default=None,
                   choices=["motion", "hy3d", "paint", "u2net"])
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    # weight synthesis is host work; never pay tunneled-TPU round trips for
    # the flax inits (the env var alone does not override a pre-registered
    # TPU plugin, so set the config knob before any JAX initialisation)
    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass

    import numpy as np
    import torch

    os.makedirs(args.output, exist_ok=True)
    todo = args.only or ["motion", "hy3d", "paint", "u2net"]
    rng = np.random.RandomState(args.seed)

    def save(name, obj):
        path = os.path.join(args.output, name)
        torch.save(obj, path)
        mb = os.path.getsize(path) / 1e6
        print(f"wrote {path} ({mb:.1f} MB)")

    if "motion" in todo:
        if args.tiny:
            sd = motion_state_dict(rng, dim=96, head=24, tokens=8, pairs=1,
                                   pcd=1, dino_depth=2, dino_dim=96,
                                   dino_mlp=384)
        else:
            sd = motion_state_dict(rng)
        validate_motion(sd, args.tiny)
        save("motion.pt", {"model": {k: torch.from_numpy(np.asarray(v))
                                     for k, v in sd.items()}})

    if "hy3d" in todo:
        save("hy3d_dit.ckpt", hy3d_ckpt(args.tiny))

    if "paint" in todo:
        unet_sd, vae_sd = paint_state_dicts(args.tiny)
        save("paint_unet.pt", unet_sd)
        save("paint_vae.pt", vae_sd)

    if "u2net" in todo:
        from test_torch_convert import _u2net_torch_sd
        sd = _u2net_torch_sd(rng)  # already full size
        save("u2net.pt", {k: torch.from_numpy(v) for k, v in sd.items()})

    return 0


if __name__ == "__main__":
    sys.exit(main())
