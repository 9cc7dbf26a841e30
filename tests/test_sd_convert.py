"""diffusers-layout converter tests (SD UNet / VAE / ControlNet).

diffusers itself is not importable in this environment, so these tests pin the
mapping from the other side: flax-initialised params are serialised INTO the
public diffusers key layout (inverse tensor transforms), run through the
strict converters, and must come back bit-identical. This catches any drift in
either naming scheme, missing keys, transpose errors, and unconsumed keys
(the converters raise on leftovers). When real diffusers checkpoints are
available the same converters apply unchanged
(reference consumers: texgen/hunyuanpaint/unet/modules.py:404-599,
texgen/utils/alignImg4Tex_utils.py:22-30, utils/imagesuper_utils.py:20-24).
"""

import jax
import jax.numpy as jnp
import numpy as np

from motion324_tpu.hy3dgen.img2img import ControlNet
from motion324_tpu.hy3dgen.sd_unet import UNet2p5D
from motion324_tpu.hy3dgen.sd_vae import AutoencoderKL
from motion324_tpu.utils.sd_convert import (convert_controlnet,
                                            convert_sd_unet, convert_sd_vae)

# ---------------------------------------------------------------- synthesis


def _t_dense(p, out, name, conv1x1=False):
    w = np.asarray(p["kernel"]).T
    out[f"{name}.weight"] = w[..., None, None] if conv1x1 else w
    if "bias" in p:
        out[f"{name}.bias"] = np.asarray(p["bias"])


def _t_conv(p, out, name):
    out[f"{name}.weight"] = np.asarray(p["kernel"]).transpose(3, 2, 0, 1)
    if "bias" in p:
        out[f"{name}.bias"] = np.asarray(p["bias"])


def _t_norm(p, out, name):
    out[f"{name}.weight"] = np.asarray(p["scale"])
    out[f"{name}.bias"] = np.asarray(p["bias"])


def _t_resnet(p, out, name, vae=False):
    _t_norm(p["norm1"], out, f"{name}.norm1")
    _t_conv(p["conv1"], out, f"{name}.conv1")
    if not vae:
        _t_dense(p["time_emb_proj"], out, f"{name}.time_emb_proj")
    _t_norm(p["norm2"], out, f"{name}.norm2")
    _t_conv(p["conv2"], out, f"{name}.conv2")
    if "shortcut" in p:
        _t_conv(p["shortcut"], out, f"{name}.conv_shortcut")


def _t_attn(p, out, name):
    _t_dense(p["to_q"], out, f"{name}.to_q")
    _t_dense(p["to_k"], out, f"{name}.to_k")
    _t_dense(p["to_v"], out, f"{name}.to_v")
    _t_dense(p["to_out"], out, f"{name}.to_out.0")


def _t_tf(p, out, name, conv1x1=False):
    _t_norm(p["norm"], out, f"{name}.norm")
    _t_dense(p["proj_in"], out, f"{name}.proj_in", conv1x1)
    _t_dense(p["proj_out"], out, f"{name}.proj_out", conv1x1)
    d = 0
    while f"block_{d}" in p:
        b = p[f"block_{d}"]
        pre = f"{name}.transformer_blocks.{d}"
        _t_norm(b["norm1"], out, f"{pre}.norm1")
        _t_attn(b["attn1"], out, f"{pre}.attn1")
        _t_norm(b["norm2"], out, f"{pre}.norm2")
        _t_attn(b["attn2"], out, f"{pre}.attn2")
        _t_norm(b["norm3"], out, f"{pre}.norm3")
        _t_dense(b["ff"]["proj_in"], out, f"{pre}.ff.net.0.proj")
        _t_dense(b["ff"]["proj_out"], out, f"{pre}.ff.net.2")
        for extra in ("attn_refview", "attn_multiview"):
            if extra in b:
                _t_attn(b[extra], out, f"{pre}.{extra}")
        d += 1


def _synth_unet_body(p, out, n_blocks, layers, conv1x1=False):
    _t_conv(p["conv_in"], out, "conv_in")
    _t_dense(p["time_fc1"], out, "time_embedding.linear_1")
    _t_dense(p["time_fc2"], out, "time_embedding.linear_2")
    for bi in range(n_blocks):
        for li in range(layers):
            _t_resnet(p[f"down_{bi}_res_{li}"], out,
                      f"down_blocks.{bi}.resnets.{li}")
            key = f"down_{bi}_tf_{li}"
            if key in p:
                _t_tf(p[key], out, f"down_blocks.{bi}.attentions.{li}",
                      conv1x1)
        if f"down_{bi}_downsample" in p:
            _t_conv(p[f"down_{bi}_downsample"], out,
                    f"down_blocks.{bi}.downsamplers.0.conv")
    _t_resnet(p["mid_res_0"], out, "mid_block.resnets.0")
    _t_tf(p["mid_tf"], out, "mid_block.attentions.0", conv1x1)
    _t_resnet(p["mid_res_1"], out, "mid_block.resnets.1")


def synth_unet_sd(params, n_blocks=4, layers=2, prefix="", conv1x1=False):
    p = params["params"]
    out: dict = {}
    _synth_unet_body(p, out, n_blocks, layers, conv1x1)
    if "camera_embedding" in p:
        out["camera_embedding.weight"] = np.asarray(
            p["camera_embedding"]["embedding"])
    for bi in range(n_blocks):
        u = n_blocks - 1 - bi
        for li in range(layers + 1):
            _t_resnet(p[f"up_{bi}_res_{li}"], out,
                      f"up_blocks.{u}.resnets.{li}")
            key = f"up_{bi}_tf_{li}"
            if key in p:
                _t_tf(p[key], out, f"up_blocks.{u}.attentions.{li}", conv1x1)
        if f"up_{bi}_upsample" in p:
            _t_conv(p[f"up_{bi}_upsample"], out,
                    f"up_blocks.{u}.upsamplers.0.conv")
    _t_norm(p["norm_out"], out, "conv_norm_out")
    _t_conv(p["conv_out"], out, "conv_out")
    return {prefix + k: v for k, v in out.items()}


def synth_controlnet_sd(params, n_blocks=4, layers=2):
    p = params["params"]
    out: dict = {}
    _synth_unet_body(p, out, n_blocks, layers)
    he = p["hint_encoder"]
    _t_conv(he["conv_in"], out, "controlnet_cond_embedding.conv_in")
    _t_conv(he["conv_out"], out, "controlnet_cond_embedding.conv_out")
    i = 0
    while f"block_{i}_a" in he:
        _t_conv(he[f"block_{i}_a"], out,
                f"controlnet_cond_embedding.blocks.{2 * i}")
        _t_conv(he[f"block_{i}_b"], out,
                f"controlnet_cond_embedding.blocks.{2 * i + 1}")
        i += 1
    i = 0
    while f"zero_conv_{i}" in p:
        _t_conv(p[f"zero_conv_{i}"], out, f"controlnet_down_blocks.{i}")
        i += 1
    _t_conv(p["zero_conv_mid"], out, "controlnet_mid_block")
    return out


def synth_vae_sd(params, n_blocks=4, layers=2):
    p = params["params"]
    out: dict = {}
    _t_conv(p["enc_conv_in"], out, "encoder.conv_in")
    for bi in range(n_blocks):
        for li in range(layers):
            _t_resnet(p[f"enc_{bi}_res_{li}"], out,
                      f"encoder.down_blocks.{bi}.resnets.{li}", vae=True)
        if f"enc_{bi}_down" in p:
            _t_conv(p[f"enc_{bi}_down"], out,
                    f"encoder.down_blocks.{bi}.downsamplers.0.conv")
    _t_resnet(p["enc_mid_res0"], out, "encoder.mid_block.resnets.0", vae=True)
    _t_attn(p["enc_mid_attn"], out, "encoder.mid_block.attentions.0")
    _t_norm(p["enc_mid_attn"]["norm"], out,
            "encoder.mid_block.attentions.0.group_norm")
    _t_resnet(p["enc_mid_res1"], out, "encoder.mid_block.resnets.1", vae=True)
    _t_norm(p["enc_norm_out"], out, "encoder.conv_norm_out")
    _t_conv(p["enc_conv_out"], out, "encoder.conv_out")
    _t_conv(p["quant_conv"], out, "quant_conv")
    _t_conv(p["post_quant_conv"], out, "post_quant_conv")
    _t_conv(p["dec_conv_in"], out, "decoder.conv_in")
    _t_resnet(p["dec_mid_res0"], out, "decoder.mid_block.resnets.0", vae=True)
    _t_attn(p["dec_mid_attn"], out, "decoder.mid_block.attentions.0")
    _t_norm(p["dec_mid_attn"]["norm"], out,
            "decoder.mid_block.attentions.0.group_norm")
    _t_resnet(p["dec_mid_res1"], out, "decoder.mid_block.resnets.1", vae=True)
    for i in range(n_blocks):
        for li in range(layers + 1):
            _t_resnet(p[f"dec_{i}_res_{li}"], out,
                      f"decoder.up_blocks.{i}.resnets.{li}", vae=True)
        if f"dec_{i}_up" in p:
            _t_conv(p[f"dec_{i}_up"], out,
                    f"decoder.up_blocks.{i}.upsamplers.0.conv")
    _t_norm(p["dec_norm_out"], out, "decoder.conv_norm_out")
    _t_conv(p["dec_conv_out"], out, "decoder.conv_out")
    return out


# -------------------------------------------------------------------- tests


def _trees_equal(a, b):
    from flax.core import unfreeze
    a, b = unfreeze(a), unfreeze(b)
    la, ta = jax.tree_util.tree_flatten(a)
    lb, tb = jax.tree_util.tree_flatten(b)
    assert ta == tb, f"tree structure differs:\n{ta}\nvs\n{tb}"
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


class TestConvertSDUNet:
    def _init_unet(self, with_25d):
        unet = UNet2p5D(in_channels=12 if with_25d else 4,
                        block_channels=(8, 8, 8, 8), head_dim=4,
                        context_dim=16, tf_depth=1)
        x = jnp.zeros((2, 8, 8, unet.in_channels))
        ctx = jnp.zeros((2, 3, 16))
        cam = jnp.zeros((2,), jnp.int32)
        mode = "wr" if with_25d else ""
        n_views = 2 if with_25d else 1
        variables = unet.init(jax.random.PRNGKey(0), x, jnp.zeros((2,)), ctx,
                              cam, n_views, mode)
        return unet, {"params": variables["params"]}

    def test_roundtrip_plain(self):
        _, params = self._init_unet(with_25d=False)
        sd = synth_unet_sd(params)
        _trees_equal(convert_sd_unet(sd), params)

    def test_roundtrip_2p5d_with_prefix(self):
        """HunyuanPaint layout: unet.-prefixed keys + refview/multiview
        attention + camera embedding table."""
        _, params = self._init_unet(with_25d=True)
        sd = synth_unet_sd(params, prefix="unet.")
        _trees_equal(convert_sd_unet(sd), params)

    def test_conv1x1_projections(self):
        """SD1.5 stores transformer proj_in/out as 1x1 convs; the converter
        squeezes them onto our Dense kernels."""
        _, params = self._init_unet(with_25d=False)
        sd = synth_unet_sd(params, conv1x1=True)
        _trees_equal(convert_sd_unet(sd), params)

    def test_strict_rejects_leftovers(self):
        _, params = self._init_unet(with_25d=False)
        sd = synth_unet_sd(params)
        sd["some.unknown.weight"] = np.zeros((2, 2), np.float32)
        try:
            convert_sd_unet(sd)
        except KeyError as e:
            assert "unconsumed" in str(e)
        else:
            raise AssertionError("strict converter accepted junk keys")


class TestConvertControlNet:
    def test_roundtrip(self):
        cn = ControlNet(block_channels=(8, 8, 8, 8), head_dim=4,
                        context_dim=16)
        params = cn.init(jax.random.PRNGKey(1), jnp.zeros((1, 4, 4, 4)),
                         jnp.zeros((1,)), jnp.zeros((1, 3, 16)),
                         jnp.zeros((1, 32, 32, 3)))
        sd = synth_controlnet_sd(params)
        _trees_equal(convert_controlnet(sd), params)

    def test_hint_encoder_matches_diffusers_layout(self):
        """ControlNetConditioningEmbedding puts the channel change on the
        stride-2 conv: blocks.2i is ch_in->ch_in, blocks.2i+1 is
        ch_in->ch_out. Released depth-ControlNet checkpoints have kernel
        shapes (16,16),(16,32),(32,32),(32,96),(96,96),(96,256) — assert the
        flax hint encoder init produces exactly those, so convert_controlnet
        on real weights cannot hit a ScopeParamShapeError."""
        from motion324_tpu.hy3dgen.img2img import _HintEncoder

        he = _HintEncoder(out_ch=320)
        p = he.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, 64, 64, 3)))["params"]
        expected = [(16, 16), (16, 32), (32, 32), (32, 96), (96, 96),
                    (96, 256)]
        got = []
        for i in range(3):
            for suffix in ("a", "b"):
                k = p[f"block_{i}_{suffix}"]["kernel"]
                got.append((k.shape[2], k.shape[3]))
        assert got == expected, got
        assert p["conv_in"]["kernel"].shape[2:] == (3, 16)
        assert p["conv_out"]["kernel"].shape[2:] == (256, 320)


class TestFromDiffusers:
    def test_delight_editor_from_diffusers(self):
        """End-to-end: an IP2P-layout (8-channel conv_in) diffusers state
        dict + VAE state dict load through DelightDiffusion.from_diffusers
        and the editor runs (delight weights path, dehighlight_utils.py:26-33)."""
        from motion324_tpu.hy3dgen.delight import DelightDiffusion

        unet = UNet2p5D(in_channels=8, block_channels=(8, 8, 8, 8),
                        head_dim=4, context_dim=16, tf_depth=1)
        vae = AutoencoderKL(block_channels=(4, 4, 4, 4), layers_per_block=1)
        uv = unet.init(jax.random.PRNGKey(5), jnp.zeros((1, 8, 8, 8)),
                       jnp.zeros((1,)), jnp.zeros((1, 4, 16)))
        vv = vae.init(jax.random.PRNGKey(6), jnp.zeros((1, 64, 64, 3)))
        ed = DelightDiffusion.from_diffusers(
            synth_unet_sd({"params": uv["params"]}),
            synth_vae_sd({"params": vv["params"]}, layers=1),
            np.zeros((1, 4, 16), np.float32),
            context_dim=16, text_len=4, image_size=64, unet=unet, vae=vae)
        out = ed(np.random.default_rng(0).random((32, 32, 3), np.float32),
                 num_steps=1)
        assert out.shape == (32, 32, 3)
        assert np.isfinite(out).all()


    def test_multiview_diffusion_from_diffusers(self):
        """HunyuanPaint layout (unet.-prefixed 2p5D UNet + VAE + learned text
        embeds) loads through MultiviewDiffusion.from_diffusers and generates
        (texgen weights path, hunyuanpaint/pipeline.py:193-266)."""
        from motion324_tpu.hy3dgen.paint_diffusion import MultiviewDiffusion

        unet = UNet2p5D(in_channels=12, block_channels=(8, 8, 8, 8),
                        head_dim=4, context_dim=16, tf_depth=1)
        vae = AutoencoderKL(block_channels=(4, 4, 4, 4), layers_per_block=1)
        x = jnp.zeros((2, 8, 8, 12))
        ctx = jnp.zeros((2, 3, 16))
        uv = unet.init(jax.random.PRNGKey(7), x, jnp.zeros((2,)), ctx,
                       jnp.zeros((2,), jnp.int32), 2, "wr")
        vv = vae.init(jax.random.PRNGKey(8), jnp.zeros((1, 64, 64, 3)))
        mv = MultiviewDiffusion.from_diffusers(
            synth_unet_sd({"params": uv["params"]}, prefix="unet."),
            synth_vae_sd({"params": vv["params"]}, layers=1),
            np.zeros((1, 3, 16), np.float32), np.zeros((1, 3, 16), np.float32),
            unet=unet, vae=vae, text_len=3, context_dim=16,
            dtype=jnp.float32)
        rng = np.random.default_rng(0)
        control = rng.random((2, 64, 64, 6), np.float32)
        ref = rng.random((64, 64, 3), np.float32)
        out = mv.generate(ref, control, num_steps=1)
        assert out.shape == (2, 64, 64, 3)
        assert np.isfinite(out).all()


class TestConvertSDVAE:
    def test_roundtrip(self):
        vae = AutoencoderKL(block_channels=(4, 4, 4, 4))
        params = vae.init(jax.random.PRNGKey(2), jnp.zeros((1, 16, 16, 3)))
        sd = synth_vae_sd(params)
        _trees_equal(convert_sd_vae(sd), params)

    def test_converted_params_run(self):
        vae = AutoencoderKL(block_channels=(4, 4, 4, 4))
        params = vae.init(jax.random.PRNGKey(3), jnp.zeros((1, 16, 16, 3)))
        conv = convert_sd_vae(synth_vae_sd(params))
        x = jax.random.uniform(jax.random.PRNGKey(4), (1, 16, 16, 3))
        np.testing.assert_allclose(np.asarray(vae.apply(conv, x)),
                                   np.asarray(vae.apply(params, x)))
