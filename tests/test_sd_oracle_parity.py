"""Numerical parity: converted flax SD modules vs the torch diffusers-layout
oracles (tests/sd_oracle.py).

Closes the round-2 gap "UNet2p5D/SD-VAE/ControlNet converters unvalidated
against real modules": the oracles mirror the public diffusers forward
semantics with checkpoint-exact key names, so a pass here means released
weights produce the same numbers through ``utils/sd_convert.py`` +
``hy3dgen/sd_unet.py`` / ``sd_vae.py`` / ``img2img.py`` that they produce
through diffusers (reference consumer:
scripts/hy3dgen/texgen/hunyuanpaint/unet/modules.py:404-599).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

import sd_oracle
from motion324_tpu.hy3dgen.img2img import ControlNet
from motion324_tpu.hy3dgen.sd_unet import UNet2p5D
from motion324_tpu.hy3dgen.sd_vae import AutoencoderKL
from motion324_tpu.utils.sd_convert import (convert_controlnet,
                                            convert_sd_unet, convert_sd_vae)

CFG = dict(block_channels=(8, 8, 8, 8), layers_per_block=2, context_dim=16,
           head_dim=4, tf_depth=1)


def _sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def _randomize(model, seed):
    torch.manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn_like(p) * 0.05)
    return model.eval()


def test_sd_unet_matches_torch_oracle():
    ref = _randomize(sd_oracle.UNet2DConditionModel(
        in_channels=4, out_channels=4, **CFG), 0)
    ours = UNet2p5D(in_channels=4, out_channels=4, **CFG)
    params = convert_sd_unet(_sd(ref))

    rng = np.random.RandomState(0)
    x = rng.randn(2, 16, 16, 4).astype(np.float32)
    t = np.array([3.0, 11.0], np.float32)
    ctx = rng.randn(2, 5, 16).astype(np.float32)

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                      torch.from_numpy(t),
                      torch.from_numpy(ctx)).numpy().transpose(0, 2, 3, 1)
    out = np.asarray(ours.apply(params, jnp.asarray(x), jnp.asarray(t),
                                jnp.asarray(ctx)))
    np.testing.assert_allclose(out, ref_out, atol=1e-4, rtol=1e-4)


def test_sd_vae_matches_torch_oracle():
    ref = _randomize(sd_oracle.AutoencoderKL(
        block_channels=(4, 8, 8, 8), layers_per_block=1), 1)
    ours = AutoencoderKL(block_channels=(4, 8, 8, 8), layers_per_block=1)
    params = convert_sd_vae(_sd(ref))

    rng = np.random.RandomState(1)
    img = rng.randn(1, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        mean_t, logvar_t = ref.encode(torch.from_numpy(
            img.transpose(0, 3, 1, 2)))
        dec_t = ref.decode(mean_t).numpy().transpose(0, 2, 3, 1)
        mean_t = mean_t.numpy().transpose(0, 2, 3, 1)
        logvar_t = logvar_t.numpy().transpose(0, 2, 3, 1)

    mean, logvar = ours.apply(params, jnp.asarray(img),
                              method=AutoencoderKL.encode)
    np.testing.assert_allclose(np.asarray(mean), mean_t, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(logvar), logvar_t, atol=1e-4,
                               rtol=1e-4)
    dec = ours.apply(params, jnp.asarray(mean), method=AutoencoderKL.decode)
    np.testing.assert_allclose(np.asarray(dec), dec_t, atol=1e-4, rtol=1e-4)


def test_controlnet_matches_torch_oracle_and_injects():
    """ControlNet residuals match the oracle, and a full controlled UNet
    forward (residual injection included) matches end-to-end."""
    # default hint channels (16,32,96,256) — the released depth-ControlNet
    # progression; _randomize overwrites the zero-convs with real weights,
    # as a trained checkpoint would.
    ref_cn = _randomize(sd_oracle.ControlNetModel(in_channels=4, **CFG), 2)
    ours_cn = ControlNet(in_channels=4, **CFG)
    cn_params = convert_controlnet(_sd(ref_cn))

    rng = np.random.RandomState(2)
    x = rng.randn(2, 8, 8, 4).astype(np.float32)
    t = np.array([5.0, 2.0], np.float32)
    ctx = rng.randn(2, 5, 16).astype(np.float32)
    hint = rng.rand(2, 64, 64, 3).astype(np.float32)

    with torch.no_grad():
        down_t, mid_t = ref_cn(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                               torch.from_numpy(t), torch.from_numpy(ctx),
                               torch.from_numpy(hint.transpose(0, 3, 1, 2)),
                               conditioning_scale=0.7)
        down_t = [d.numpy().transpose(0, 2, 3, 1) for d in down_t]
        mid_t = mid_t.numpy().transpose(0, 2, 3, 1)

    down, mid = ours_cn.apply(cn_params, jnp.asarray(x), jnp.asarray(t),
                              jnp.asarray(ctx), jnp.asarray(hint),
                              conditioning_scale=0.7)
    assert len(down) == len(down_t)
    for ours_d, ref_d in zip(down, down_t):
        np.testing.assert_allclose(np.asarray(ours_d), ref_d, atol=1e-4,
                                   rtol=1e-4)
    np.testing.assert_allclose(np.asarray(mid), mid_t, atol=1e-4, rtol=1e-4)

    # end-to-end: controlled UNet forward
    ref_unet = _randomize(sd_oracle.UNet2DConditionModel(
        in_channels=4, out_channels=4, **CFG), 3)
    ours_unet = UNet2p5D(in_channels=4, out_channels=4, **CFG)
    unet_params = convert_sd_unet(_sd(ref_unet))
    with torch.no_grad():
        ref_out = ref_unet(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(t),
            torch.from_numpy(ctx),
            control_residuals=([torch.from_numpy(d.transpose(0, 3, 1, 2))
                                for d in down_t],
                               torch.from_numpy(mid_t.transpose(0, 3, 1, 2)))
        ).numpy().transpose(0, 2, 3, 1)
    out = np.asarray(ours_unet.apply(
        unet_params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx),
        control_residuals=([jnp.asarray(d) for d in down_t],
                           jnp.asarray(mid_t))))
    np.testing.assert_allclose(out, ref_out, atol=1e-4, rtol=1e-4)
