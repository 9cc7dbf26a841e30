"""SR / img2img extras: latent x4 upscaler, ControlNet, IP-Adapter, resampler.

Covers the reference's texture-pipeline extras (imagesuper_utils.py:18-35,
alignImg4Tex_utils.py:21-124) at tiny dims: shape/finiteness of each pipeline,
and the two behavioural contracts that survive random weights — ControlNet is
a no-op at init (zero convs), and ip_scale=0 reproduces the no-image-prompt
output exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motion324_tpu.hy3dgen.img2img import (ControlNet, Img2ImgControlPipeline,
                                           Resampler)
from motion324_tpu.hy3dgen.sd_unet import UNet2p5D
from motion324_tpu.hy3dgen.sd_vae import AutoencoderKL
from motion324_tpu.hy3dgen.super_resolution import (Upscaler,
                                                    ddpm_alphas_cumprod,
                                                    upscale_x4)


pytestmark = pytest.mark.slow  # multi-minute diffusers-class stacks


def _tiny_upscaler(prediction_type="v"):
    unet = UNet2p5D(in_channels=7, out_channels=4,
                    block_channels=(8, 8, 8, 8), head_dim=4, context_dim=16,
                    num_camera_embeds=1000, tf_depth=1)
    vae = AutoencoderKL(block_channels=(8, 8, 8))
    return Upscaler.init_random(jax.random.PRNGKey(1), image_size=8,
                                unet=unet, vae=vae, context_dim=16,
                                text_len=4, prediction_type=prediction_type,
                                dtype=jnp.float32)


def _tiny_img2img():
    unet = UNet2p5D(in_channels=4, block_channels=(8, 8, 8, 8), head_dim=4,
                    context_dim=16, tf_depth=1)
    vae = AutoencoderKL(block_channels=(4, 4, 4, 4), layers_per_block=1)
    resampler = Resampler(dim=8, depth=1, heads=2, num_queries=4,
                          output_dim=16)
    return Img2ImgControlPipeline.init_random(
        jax.random.PRNGKey(2), image_size=64, ip_feature_dim=8, unet=unet,
        vae=vae, resampler=resampler, context_dim=16, text_len=4,
        dtype=jnp.float32)


class TestUpscaler:
    def test_fallback_without_weights(self):
        sr = Upscaler(params=None)
        img = np.random.default_rng(0).random((12, 10, 3), np.float32)
        up = sr(img)
        assert up.shape == (48, 40, 3)
        assert up.min() >= 0 and up.max() <= 1

    def test_lanczos_identity_on_constant(self):
        img = np.full((8, 8, 3), 0.25, np.float32)
        up = upscale_x4(img)
        assert up.shape == (32, 32, 3)
        np.testing.assert_allclose(up, 0.25, atol=1e-5)

    @pytest.mark.parametrize("pred", ["v", "epsilon"])
    def test_diffusion_upscale_shapes(self, pred):
        sr = _tiny_upscaler(pred)
        img = np.random.default_rng(1).random((8, 8, 3), np.float32)
        up = sr(img, num_steps=2)
        assert up.shape == (32, 32, 3)
        assert np.isfinite(up).all()
        assert up.min() >= 0 and up.max() <= 1

    def test_alphas_monotone(self):
        a = ddpm_alphas_cumprod()
        assert a.shape == (1000,)
        assert (np.diff(a) < 0).all() and 0 < a[-1] < a[0] < 1


class TestControlNet:
    def test_zero_init_is_noop(self):
        """At init every ControlNet output conv is zero, so injecting its
        residuals must not change the UNet output (diffusers contract)."""
        pipe = _tiny_img2img()
        lat = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 4))
        ctx = jax.random.normal(jax.random.PRNGKey(4), (1, 4, 16))
        hint = jnp.zeros((1, 64, 64, 3)) + 0.5
        t = jnp.zeros((1,))
        res = pipe.controlnet.apply(pipe.params["controlnet"], lat, t, ctx,
                                    hint)
        down, mid = res
        assert len(down) == 12  # 1 conv_in + 4 stages x (2 res) + 3 downsample
        for r in down:
            np.testing.assert_array_equal(np.asarray(r), 0.0)
        np.testing.assert_array_equal(np.asarray(mid), 0.0)
        out_plain = pipe.unet.apply(pipe.params["unet"], lat, t, ctx)
        out_ctrl = pipe.unet.apply(pipe.params["unet"], lat, t, ctx,
                                   control_residuals=res)
        np.testing.assert_allclose(np.asarray(out_ctrl),
                                   np.asarray(out_plain), atol=1e-6)

    def test_nonzero_weights_change_output(self):
        pipe = _tiny_img2img()
        lat = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 4))
        ctx = jnp.zeros((1, 4, 16))
        hint = jax.random.uniform(jax.random.PRNGKey(5), (1, 64, 64, 3))
        t = jnp.zeros((1,))
        # perturb the zero convs so residuals become non-trivial
        cn = jax.tree_util.tree_map(
            lambda x: x + 0.05, pipe.params["controlnet"])
        res = pipe.controlnet.apply(cn, lat, t, ctx, hint)
        out_plain = pipe.unet.apply(pipe.params["unet"], lat, t, ctx)
        out_ctrl = pipe.unet.apply(pipe.params["unet"], lat, t, ctx,
                                   control_residuals=res)
        assert np.abs(np.asarray(out_ctrl) - np.asarray(out_plain)).max() > 1e-6

    def test_conditioning_scale_scales_residuals(self):
        pipe = _tiny_img2img()
        lat = jnp.zeros((1, 8, 8, 4))
        ctx = jnp.zeros((1, 4, 16))
        hint = jnp.ones((1, 64, 64, 3))
        t = jnp.zeros((1,))
        cn = jax.tree_util.tree_map(
            lambda x: x + 0.05, pipe.params["controlnet"])
        d1, m1 = pipe.controlnet.apply(cn, lat, t, ctx, hint,
                                       conditioning_scale=1.0)
        d2, m2 = pipe.controlnet.apply(cn, lat, t, ctx, hint,
                                       conditioning_scale=0.5)
        np.testing.assert_allclose(np.asarray(m2), 0.5 * np.asarray(m1),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(d2[3]), 0.5 * np.asarray(d1[3]),
                                   rtol=1e-5, atol=1e-6)


class TestIPAdapter:
    def test_scale_zero_matches_no_ip(self):
        pipe = _tiny_img2img()
        lat = jax.random.normal(jax.random.PRNGKey(6), (1, 8, 8, 4))
        ctx = jax.random.normal(jax.random.PRNGKey(7), (1, 4, 16))
        ip = jax.random.normal(jax.random.PRNGKey(8), (1, 4, 16))
        t = jnp.zeros((1,))
        out_none = pipe.unet.apply(pipe.params["unet"], lat, t, ctx)
        out_zero = pipe.unet.apply(pipe.params["unet"], lat, t, ctx,
                                   ip_tokens=ip, ip_scale=0.0)
        out_one = pipe.unet.apply(pipe.params["unet"], lat, t, ctx,
                                  ip_tokens=ip, ip_scale=1.0)
        np.testing.assert_allclose(np.asarray(out_zero), np.asarray(out_none),
                                   atol=1e-6)
        assert np.abs(np.asarray(out_one) - np.asarray(out_none)).max() > 1e-6

    def test_resampler_shapes(self):
        rs = Resampler(dim=8, depth=2, heads=2, num_queries=4, output_dim=16)
        feats = jax.random.normal(jax.random.PRNGKey(9), (3, 10, 8))
        params = rs.init(jax.random.PRNGKey(0), feats)
        out = rs.apply(params, feats)
        assert out.shape == (3, 4, 16)
        assert np.isfinite(np.asarray(out)).all()


class TestImg2ImgPipeline:
    def test_generation(self):
        pipe = _tiny_img2img()
        rng = np.random.default_rng(2)
        control = rng.random((64, 64, 3), np.float32)
        feats = rng.standard_normal((1, 16, 8)).astype(np.float32)
        out = pipe(control, image_features=feats, num_steps=2)
        assert out.shape == (64, 64, 3)
        assert np.isfinite(out).all()
        assert out.min() >= 0 and out.max() <= 1

    def test_img2img_strength(self):
        pipe = _tiny_img2img()
        rng = np.random.default_rng(3)
        control = rng.random((64, 64, 3), np.float32)
        init = rng.random((64, 64, 3), np.float32)
        out = pipe(control, init_image=init, strength=0.5, num_steps=4)
        assert out.shape == (64, 64, 3)
        assert np.isfinite(out).all()
