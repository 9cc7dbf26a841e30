"""Multiview diffusion UNet / VAE / sampler at tiny dims."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motion324_tpu.hy3dgen.paint_diffusion import MultiviewDiffusion, sd_sigmas
from motion324_tpu.hy3dgen.sd_unet import UNet2p5D
from motion324_tpu.hy3dgen.sd_vae import AutoencoderKL

TINY_UNET = dict(block_channels=(16, 32), layers_per_block=1, context_dim=8,
                 head_dim=8, num_camera_embeds=16)
TINY_VAE = dict(block_channels=(8, 16), layers_per_block=1)


def test_sd_sigmas_monotone():
    ts, sig = sd_sigmas(10)
    assert len(ts) == 10 and len(sig) == 11
    assert (np.diff(sig) <= 0).all()
    assert sig[-1] == 0.0
    assert ts[0] == 999 and ts[-1] == 0


def test_unet_ref_and_multiview_paths():
    unet = UNet2p5D(**TINY_UNET)
    n_views = 3
    x = jax.random.normal(jax.random.PRNGKey(0), (n_views, 16, 16, 12))
    t = jnp.zeros((n_views,))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (n_views, 5, 8))
    cam = jnp.arange(n_views, dtype=jnp.int32)
    params = unet.init(jax.random.PRNGKey(2), x, t, ctx, cam, n_views, "wr")

    out_w, vars_w = unet.apply(params, x, t, ctx, cam, n_views, "w",
                               mutable=["ref_bank"])
    assert out_w.shape == (n_views, 16, 16, 4)

    bank = vars_w["ref_bank"]
    out_r1 = unet.apply(params, x, t, ctx, cam, n_views, "r", bank,
                        ref_scale=1.0)
    out_r0 = unet.apply(params, x, t, ctx, cam, n_views, "r", bank,
                        ref_scale=0.0)
    # ref_scale gates the reference-attention contribution
    assert not np.allclose(np.asarray(out_r1), np.asarray(out_r0))

    # multiview attention mixes views: perturbing view 0 changes view 2
    x2 = x.at[0].add(1.0)
    out_p = unet.apply(params, x2, t, ctx, cam, n_views, "r", bank,
                       ref_scale=0.0)
    assert not np.allclose(np.asarray(out_p[2]), np.asarray(out_r0[2]))


def test_vae_shapes_roundtrip():
    vae = AutoencoderKL(**TINY_VAE)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))
    params = vae.init(jax.random.PRNGKey(1), x)
    mean, logvar = vae.apply(params, x, method=AutoencoderKL.encode)
    assert mean.shape == (1, 16, 16, 4)  # 2 stages -> /2 spatial
    img = vae.apply(params, mean, method=AutoencoderKL.decode)
    assert img.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(img)).all()


def test_multiview_diffusion_end_to_end_tiny():
    pipe = MultiviewDiffusion.init_random(
        image_size=32,
        unet=UNet2p5D(**TINY_UNET),
        vae=AutoencoderKL(**TINY_VAE),
        text_len=4, context_dim=8, dtype=jnp.float32)
    ref = np.random.RandomState(0).rand(32, 32, 3).astype(np.float32)
    control = np.random.RandomState(1).rand(2, 32, 32, 6).astype(np.float32)
    out = pipe.generate(ref, control, num_steps=2)
    assert out.shape == (2, 32, 32, 3)
    assert np.isfinite(out).all()
    assert out.min() >= 0 and out.max() <= 1


def test_turbo_masks_and_generation():
    """Turbo mode: voxel masks derived from render position maps flow through
    the multiview UNet; same latent-space token counts as the masks' keys."""
    import numpy as np
    from motion324_tpu.hy3dgen.paint_diffusion import MultiviewDiffusion
    from motion324_tpu.hy3dgen.sd_unet import UNet2p5D
    pipe = MultiviewDiffusion.init_random(
        image_size=64, context_dim=TINY_UNET["context_dim"],
        unet=UNet2p5D(**TINY_UNET), vae=AutoencoderKL(**TINY_VAE))
    h = 64
    renders = []
    for i in range(2):
        normal = np.zeros((h, h, 3), np.float32)
        position = np.full((h, h, 3), -0.25 + 0.5 * i, np.float32)
        mask = np.zeros((h, h), bool)
        mask[8:56, 8:56] = True
        renders.append({"normal": normal, "position": position, "mask": mask})
    masks = MultiviewDiffusion.turbo_masks(renders, grid_resolutions=(8, 4))
    assert set(masks) == {2 * 64, 2 * 16}
    # run the synthesizer with turbo masks end-to-end
    cond = np.random.RandomState(0).rand(48, 48, 3).astype(np.float32)
    views = [(0, 0, 1.0), (180, 0, 0.5)]
    pipe_call = lambda: pipe.generate(
        cond[:64, :64], np.stack([np.concatenate(
            [(r["normal"] + 1) / 2, r["position"] + 0.5], -1)
            for r in renders]).astype(np.float32),
        num_steps=2, mva_masks=MultiviewDiffusion.turbo_masks(
            renders, grid_resolutions=(8, 4)))
    outs = pipe_call()
    assert outs.shape == (2, h, h, 3)
    assert np.isfinite(outs).all()
