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


# --------------------------------------------------------------------------- #
# LCM / turbo sampler vs the reference's DDIMSolver + LCM helpers
# --------------------------------------------------------------------------- #
def test_lcm_schedule_matches_reference_solver():
    """Our lcm_schedule vs the reference DDIMSolver grid + turbo index walk
    (reference hunyuanpaint/pipeline.py:139-165, :595-600)."""
    import torch
    from ref_oracle import ref_hunyuanpaint_module
    from motion324_tpu.hy3dgen.paint_diffusion import (_alphas_cumprod,
                                                       lcm_schedule)
    mod = ref_hunyuanpaint_module()
    ac_full = _alphas_cumprod()
    solver = mod.DDIMSolver(ac_full, timesteps=1000, ddim_timesteps=30)

    # the reference's hardcoded turbo walk: stride 3 down from index 29
    index = torch.arange(29, -1, -3).long()
    ts, ac, ac_prev = lcm_schedule(10, ddim_steps=30)
    np.testing.assert_array_equal(ts, solver.ddim_timesteps[index].numpy())
    np.testing.assert_allclose(ac, solver.ddim_alpha_cumprods[index].numpy(),
                               rtol=1e-12)
    # prev alpha-bar = alpha-bar at the NEXT (lower) selected timestep
    np.testing.assert_allclose(ac_prev[:-1], ac[1:], rtol=1e-12)


def test_lcm_boundary_scalings_match_reference():
    import torch
    from ref_oracle import ref_hunyuanpaint_module
    from motion324_tpu.hy3dgen.paint_diffusion import lcm_boundary_scalings
    mod = ref_hunyuanpaint_module()
    for t in (2.0, 98.0, 494.0, 989.0):
        ref_skip, ref_out = mod.scalings_for_boundary_conditions(
            torch.tensor(t))
        skip, out = lcm_boundary_scalings(t)
        np.testing.assert_allclose(skip, ref_skip.numpy(), rtol=1e-6)
        np.testing.assert_allclose(out, ref_out.numpy(), rtol=1e-6)


def test_lcm_step_update_matches_reference_math():
    """_lcm_step's post-UNet update == reference composition: epsilon ->
    get_predicted_original_sample -> boundary scalings -> alpha-bar-prev
    noise injection (pipeline.py:84-117 + LCMScheduler.step semantics)."""
    import torch
    from ref_oracle import ref_hunyuanpaint_module
    from motion324_tpu.hy3dgen.paint_diffusion import (_alphas_cumprod,
                                                       lcm_schedule)
    mod = ref_hunyuanpaint_module()

    pipe = MultiviewDiffusion.init_random(
        image_size=32, unet=UNet2p5D(**TINY_UNET),
        vae=AutoencoderKL(**TINY_VAE), text_len=4, context_dim=8,
        dtype=jnp.float32)
    n, lat = 2, 8
    rng = np.random.RandomState(3)
    x = rng.randn(n, lat, lat, 4).astype(np.float32)
    ctrl = rng.randn(n, lat, lat, 8).astype(np.float32)
    ref_lat = rng.randn(1, lat, lat, 4).astype(np.float32)
    noise = rng.randn(n, lat, lat, 4).astype(np.float32)
    text_gen = np.repeat(np.asarray(pipe.params["text_gen"]), n, 0)
    text_ref = np.asarray(pipe.params["text_ref"])
    cams = jnp.arange(n, dtype=jnp.int32) + 5

    ts, ac, ac_prev = lcm_schedule(8)
    i = 2
    denoised, stepped = pipe._lcm_step_fn(
        pipe.params["unet"], jnp.asarray(x), jnp.asarray(ctrl),
        jnp.asarray(ref_lat), jnp.asarray(text_gen), jnp.asarray(text_ref),
        cams, float(ts[i]), float(ac[i]), float(ac_prev[i]),
        jnp.asarray(noise))

    # recover the UNet's eps exactly as _lcm_step computes it
    _, vars_w = pipe.unet.apply(
        pipe.params["unet"],
        jnp.concatenate([jnp.asarray(ref_lat)] +
                        [jnp.zeros_like(jnp.asarray(ref_lat))] * 2, -1),
        jnp.zeros((1,)), jnp.asarray(text_ref), jnp.zeros((1,), jnp.int32),
        1, "w", mutable=["ref_bank"])
    eps = pipe.unet.apply(
        pipe.params["unet"],
        jnp.concatenate([jnp.asarray(x), jnp.asarray(ctrl)], -1),
        jnp.full((n,), float(ts[i])), jnp.asarray(text_gen), cams, n, "r",
        vars_w["ref_bank"], ref_scale=1.0)

    # reference composition in torch (NCHW with a leading batch of 1)
    ac_full = torch.from_numpy(_alphas_cumprod())
    alphas, sigmas = ac_full.sqrt(), (1 - ac_full).sqrt()
    x_t = torch.from_numpy(x.transpose(0, 3, 1, 2))
    eps_t = torch.from_numpy(np.asarray(eps, np.float64).transpose(0, 3, 1, 2))
    t_idx = torch.full((1,), int(ts[i])).long()
    x0_ref = mod.get_predicted_original_sample(
        eps_t, t_idx, x_t.reshape(1, n, 4, lat, lat).double(), "epsilon",
        alphas, sigmas, n).reshape(n, 4, lat, lat)
    c_skip, c_out = mod.scalings_for_boundary_conditions(
        torch.tensor(float(ts[i])))
    den_ref = c_out * x0_ref + c_skip * x_t
    noise_t = torch.from_numpy(noise.transpose(0, 3, 1, 2)).double()
    step_ref = (np.sqrt(ac_prev[i]) * den_ref
                + np.sqrt(1 - ac_prev[i]) * noise_t)

    np.testing.assert_allclose(
        np.asarray(denoised).transpose(0, 3, 1, 2), den_ref.numpy(),
        atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(
        np.asarray(stepped).transpose(0, 3, 1, 2), step_ref.numpy(),
        atol=2e-5, rtol=2e-5)


@pytest.mark.slow
def test_turbo_lcm_synthesizer_few_steps():
    """Turbo synthesizer: 6 views in <= 8 LCM steps (one UNet sweep per
    step, no CFG pair), same output contract as the 30-step Euler path."""
    pipe = MultiviewDiffusion.init_random(
        image_size=64, context_dim=TINY_UNET["context_dim"],
        unet=UNet2p5D(**TINY_UNET), vae=AutoencoderKL(**TINY_VAE))
    h = 64
    rng = np.random.RandomState(0)
    renders = []
    for i in range(6):
        mask = np.zeros((h, h), bool)
        mask[8:56, 8:56] = True
        renders.append({
            "normal": rng.rand(h, h, 3).astype(np.float32) * 2 - 1,
            "position": np.full((h, h, 3), -0.3 + 0.1 * i, np.float32),
            "mask": mask})
    cond = rng.rand(h, h, 3).astype(np.float32)
    views = [(a, 0, 1.0) for a in range(0, 360, 60)]

    calls = {"lcm": 0, "euler": 0}
    orig_lcm, orig_euler = pipe._lcm_step_fn, pipe._step
    pipe._lcm_step_fn = lambda *a, **k: (
        calls.__setitem__("lcm", calls["lcm"] + 1) or orig_lcm(*a, **k))
    pipe._step = lambda *a, **k: (
        calls.__setitem__("euler", calls["euler"] + 1) or orig_euler(*a, **k))

    turbo = pipe(cond, views, renders, turbo=True)
    assert calls["lcm"] <= 8 and calls["euler"] == 0
    normal = pipe(cond, views, renders, turbo=False)
    assert calls["euler"] == 30  # the non-turbo CFG path
    assert len(turbo) == len(normal) == 6
    for t_img, n_img in zip(turbo, normal):
        assert t_img.shape == n_img.shape == (h, h, 3)
        assert np.isfinite(t_img).all() and np.isfinite(n_img).all()
        assert 0 <= t_img.min() and t_img.max() <= 1
