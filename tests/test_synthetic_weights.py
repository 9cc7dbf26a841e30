"""Synthetic released-layout weight files load through the real converters.

``scripts/make_synthetic_weights.py`` generates random weights in the exact
external layouts (reference motion .pt, Hunyuan3D-2 single-file ckpt,
HunyuanPaint diffusers sd, U-2-Net sd) so the real-weights golden path can
execute before weights exist. This test runs the generator at tiny dims and
pushes every file through the same loader path the CLIs use.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_generate_and_load_all_layouts(tmp_path):
    w = str(tmp_path)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts",
                                      "make_synthetic_weights.py"),
         "--output", w, "--tiny"],
        capture_output=True, text=True, timeout=900, cwd=REPO)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    for f in ("motion.pt", "hy3d_dit.ckpt", "paint_unet.pt", "paint_vae.pt",
              "u2net.pt"):
        assert os.path.exists(os.path.join(w, f)), f

    import torch

    from motion324_tpu.utils.torch_convert import (convert_motion_checkpoint,
                                                   convert_u2net,
                                                   load_torch_state_dict)
    sd = load_torch_state_dict(os.path.join(w, "motion.pt"))
    p = convert_motion_checkpoint(sd, n_pairs=1, pcd_layers=1)
    assert "image_encoder" in p["params"]

    import jax
    u = convert_u2net(load_torch_state_dict(os.path.join(w, "u2net.pt")))
    assert len(jax.tree.leaves(u)) > 600  # full-size U2Net

    from motion324_tpu.hy3dgen.shape_pipeline import ShapeGenPipeline
    pipe = ShapeGenPipeline.from_hunyuan_ckpt(
        os.path.join(w, "hy3d_dit.ckpt"), image_size=28)
    assert pipe.latent_dim == 8  # inferred from the state dict

    from motion324_tpu.hy3dgen.paint_diffusion import MultiviewDiffusion
    from motion324_tpu.hy3dgen.sd_unet import UNet2p5D
    from motion324_tpu.hy3dgen.sd_vae import AutoencoderKL
    unet_sd = {k: v.float().numpy() for k, v in torch.load(
        os.path.join(w, "paint_unet.pt"), map_location="cpu",
        weights_only=True).items()}
    vae_sd = {k: v.float().numpy() for k, v in torch.load(
        os.path.join(w, "paint_vae.pt"), map_location="cpu",
        weights_only=True).items()}
    tg = unet_sd.pop("unet.learned_text_clip_gen")[None]
    tr = unet_sd.pop("unet.learned_text_clip_ref")[None]
    mv = MultiviewDiffusion.from_diffusers(
        unet_sd, vae_sd, tg, tr, context_dim=tg.shape[-1],
        unet=UNet2p5D(block_channels=(8, 8, 8, 8), context_dim=32,
                      head_dim=8),
        vae=AutoencoderKL(block_channels=(4, 4, 4, 4)))
    out = mv.generate(np.zeros((64, 64, 3), np.float32),
                      np.zeros((2, 64, 64, 6), np.float32), num_steps=2)
    assert out.shape == (2, 64, 64, 3)
    assert np.isfinite(out).all()
