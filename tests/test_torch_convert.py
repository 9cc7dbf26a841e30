"""Torch->JAX conversion: structural match with model.init and numerical parity
of a converted transformer block against an independent torch implementation of
the reference math (QK-RMSNorm pre-norm block, model/transformer.py:30-423)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from motion324_tpu.models.motion_model import ModelConfig, MotionLatentModel
from motion324_tpu.models.transformer import TransformerBlock
from motion324_tpu.utils.torch_convert import (convert_motion_checkpoint,
                                               _self_block)

DIM, HEAD = 36, 12
N_PAIRS, PCD_LAYERS = 1, 1

SMALL = ModelConfig(feat_dim=DIM, tokens=4, pcd_layers=PCD_LAYERS,
                    n_alternating_layers=2 * N_PAIRS, head_dim=HEAD, frames=2,
                    image_size=28, patch_size=14, drop_rate=0.0,
                    dino_depth=1, dino_heads=3)


def _rand_sd(rng):
    """Synthesize a reference-named state dict for the small config."""
    sd = {}

    def dense(name, din, dout, bias=False):
        sd[f"{name}.weight"] = rng.randn(dout, din).astype(np.float32) * 0.05
        if bias:
            sd[f"{name}.bias"] = rng.randn(dout).astype(np.float32) * 0.05

    def ln(name, d, bias=False):
        sd[f"{name}.weight"] = rng.rand(d).astype(np.float32) + 0.5
        if bias:
            sd[f"{name}.bias"] = rng.randn(d).astype(np.float32) * 0.05

    def rms(name, d):
        sd[f"{name}.weight"] = rng.rand(d).astype(np.float32) + 0.5

    def self_block(name):
        ln(f"{name}.norm1", DIM)
        dense(f"{name}.attn.to_qkv", DIM, 3 * DIM)
        dense(f"{name}.attn.fc", DIM, DIM)
        rms(f"{name}.attn.q_norm", HEAD)
        rms(f"{name}.attn.k_norm", HEAD)
        ln(f"{name}.norm2", DIM)
        dense(f"{name}.mlp.mlp.0", DIM, 4 * DIM)
        dense(f"{name}.mlp.mlp.2", 4 * DIM, DIM)

    def cross_block(name):
        ln(f"{name}.norm_q", DIM)
        ln(f"{name}.norm_kv", DIM)
        dense(f"{name}.attn.to_q", DIM, DIM)
        dense(f"{name}.attn.to_k", DIM, DIM)
        dense(f"{name}.attn.to_v", DIM, DIM)
        dense(f"{name}.attn.fc", DIM, DIM)
        rms(f"{name}.attn.q_norm", HEAD)
        rms(f"{name}.attn.k_norm", HEAD)
        ln(f"{name}.norm2", DIM)
        dense(f"{name}.mlp.mlp.0", DIM, 4 * DIM)
        dense(f"{name}.mlp.mlp.2", 4 * DIM, DIM)

    sd["learnable_tokens"] = rng.randn(1, 4, DIM).astype(np.float32)
    sd["special_token_0"] = rng.randn(1, 4, DIM).astype(np.float32)
    sd["special_token_rest"] = rng.randn(1, 4, DIM).astype(np.float32)
    dense("point_embed.mlp", 51, DIM, bias=True)
    dense("point_normal_rgb_proj", DIM + 6, DIM, bias=True)
    cross_block("encoder_cross_attn")
    cross_block("decoder_cross_attn")
    ln("transformer_input_layernorm", DIM)
    ln("shared_mlp_output.0", DIM, bias=True)
    dense("shared_mlp_output.1", DIM, DIM, bias=True)
    dense("shared_mlp_output.3", DIM, 3, bias=True)
    for i in range(PCD_LAYERS):
        self_block(f"points_transformer_blocks.{i}")
    for i in range(N_PAIRS):
        self_block(f"global_transformer_blocks.{i}")
        self_block(f"local_transformer_blocks.{i}")
    return sd


def test_convert_structure_matches_init():
    sd = _rand_sd(np.random.RandomState(0))
    converted = convert_motion_checkpoint(sd, n_pairs=N_PAIRS,
                                          pcd_layers=PCD_LAYERS)

    model = MotionLatentModel(SMALL)
    sample = {
        "ref_shape_pcd": np.zeros((1, 8, 3), np.float32),
        "ref_shape_normals": np.zeros((1, 8, 3), np.float32),
        "ref_shape_rgbs": np.zeros((1, 8, 3), np.float32),
        "ref_pcd": np.zeros((1, 8, 3), np.float32),
        "ref_normal": np.zeros((1, 8, 3), np.float32),
        "ref_rgb": np.zeros((1, 8, 3), np.float32),
        "rgb_video": np.zeros((1, 2, 28, 28, 3), np.float32),
    }
    init = model.init(jax.random.PRNGKey(0), sample)["params"]
    conv = converted["params"]

    missing_in_conv = set(init) - set(conv) - {"image_encoder"}
    assert not missing_in_conv, missing_in_conv
    for key in conv:
        init_shapes = jax.tree.map(lambda a: a.shape, init[key])
        conv_shapes = jax.tree.map(lambda a: a.shape, conv[key])
        assert init_shapes == conv_shapes, (key, init_shapes, conv_shapes)


def _torch_block(sd, prefix, x):
    """Reference transformer-block math in torch (model/transformer.py:379-423),
    written from the formulas: pre-LN (no bias), fused qkv, per-head RMSNorm on
    q/k (eps 1e-5), softmax attention, fc, pre-LN MLP with exact GELU."""
    x = torch.from_numpy(x)

    def ln(t, name):
        w = torch.from_numpy(sd[f"{name}.weight"])
        return torch.nn.functional.layer_norm(t, (DIM,), weight=w, eps=1e-5)

    def rmsnorm(t, name):
        w = torch.from_numpy(sd[f"{name}.weight"])
        out = t * torch.rsqrt(t.pow(2).mean(-1, keepdim=True) + 1e-5)
        return out * w

    h = ln(x, f"{prefix}.norm1")
    qkv = h @ torch.from_numpy(sd[f"{prefix}.attn.to_qkv.weight"]).T
    q, k, v = qkv.chunk(3, dim=-1)
    b, l, _ = q.shape
    nh = DIM // HEAD
    q = q.view(b, l, nh, HEAD)
    k = k.view(b, l, nh, HEAD)
    v = v.view(b, l, nh, HEAD)
    q = rmsnorm(q, f"{prefix}.attn.q_norm")
    k = rmsnorm(k, f"{prefix}.attn.k_norm")
    att = torch.einsum("blhd,bmhd->bhlm", q, k) / np.sqrt(HEAD)
    att = att.softmax(dim=-1)
    o = torch.einsum("bhlm,bmhd->blhd", att, v).reshape(b, l, DIM)
    o = o @ torch.from_numpy(sd[f"{prefix}.attn.fc.weight"]).T
    x = x + o
    h = ln(x, f"{prefix}.norm2")
    h = h @ torch.from_numpy(sd[f"{prefix}.mlp.mlp.0.weight"]).T
    h = torch.nn.functional.gelu(h)
    h = h @ torch.from_numpy(sd[f"{prefix}.mlp.mlp.2.weight"]).T
    return (x + h).numpy()


def test_block_numerical_parity_with_torch():
    rng = np.random.RandomState(1)
    sd = _rand_sd(rng)
    prefix = "global_transformer_blocks.0"
    params = {"params": _self_block(sd, prefix)}

    x = rng.randn(2, 10, DIM).astype(np.float32)
    block = TransformerBlock(dim=DIM, head_dim=HEAD, use_qk_norm=True)
    ours = np.asarray(block.apply(params, jnp.asarray(x)))
    theirs = _torch_block(sd, prefix, x)
    np.testing.assert_allclose(ours, theirs, atol=2e-5, rtol=2e-5)


# --------------------------------------------------------------------------- #
# U2Net + LPIPS converters (synthesized public-layout state dicts)
# --------------------------------------------------------------------------- #
def _u2net_torch_sd(rng):
    """State dict with the exact public U-2-Net naming/shapes (full size)."""
    sd = {}

    def rebn(name, cin, cout):
        sd[f"{name}.conv_s1.weight"] = rng.randn(cout, cin, 3, 3).astype("f") * 0.05
        sd[f"{name}.conv_s1.bias"] = rng.randn(cout).astype("f") * 0.05
        sd[f"{name}.bn_s1.weight"] = np.ones(cout, "f")
        sd[f"{name}.bn_s1.bias"] = np.zeros(cout, "f")
        sd[f"{name}.bn_s1.running_mean"] = np.zeros(cout, "f")
        sd[f"{name}.bn_s1.running_var"] = np.ones(cout, "f")

    def rsu(name, height, cin, mid, cout):
        rebn(f"{name}.rebnconvin", cin, cout)
        rebn(f"{name}.rebnconv1", cout, mid)
        for i in range(2, height):
            rebn(f"{name}.rebnconv{i}", mid, mid)
        rebn(f"{name}.rebnconv{height}", mid, mid)
        rebn(f"{name}.rebnconv{height - 1}d", mid * 2, mid)
        for i in range(height - 2, 1, -1):
            rebn(f"{name}.rebnconv{i}d", mid * 2, mid)
        rebn(f"{name}.rebnconv1d", mid * 2, cout)

    def rsu4f(name, cin, mid, cout):
        rebn(f"{name}.rebnconvin", cin, cout)
        rebn(f"{name}.rebnconv1", cout, mid)
        for i in (2, 3, 4):
            rebn(f"{name}.rebnconv{i}", mid, mid)
        rebn(f"{name}.rebnconv3d", mid * 2, mid)
        rebn(f"{name}.rebnconv2d", mid * 2, mid)
        rebn(f"{name}.rebnconv1d", mid * 2, cout)

    rsu("stage1", 7, 3, 32, 64)
    rsu("stage2", 6, 64, 32, 128)
    rsu("stage3", 5, 128, 64, 256)
    rsu("stage4", 4, 256, 128, 512)
    rsu4f("stage5", 512, 256, 512)
    rsu4f("stage6", 512, 256, 512)
    rsu4f("stage5d", 1024, 256, 512)
    rsu("stage4d", 4, 1024, 128, 256)
    rsu("stage3d", 5, 512, 64, 128)
    rsu("stage2d", 6, 256, 32, 64)
    rsu("stage1d", 7, 128, 16, 64)
    for i, c in zip(range(1, 7), (64, 64, 128, 256, 512, 512)):
        sd[f"side{i}.weight"] = rng.randn(1, c, 3, 3).astype("f") * 0.05
        sd[f"side{i}.bias"] = np.zeros(1, "f")
    sd["outconv.weight"] = rng.randn(1, 6, 1, 1).astype("f") * 0.2
    sd["outconv.bias"] = np.zeros(1, "f")
    return sd


def test_convert_u2net_runs_and_matches_structure():
    from motion324_tpu.inference.segmentation import U2Net
    from motion324_tpu.utils.torch_convert import convert_u2net
    rng = np.random.RandomState(0)
    variables = convert_u2net(_u2net_torch_sd(rng))
    model = U2Net()
    # structural check against a fresh init: identical tree + leaf shapes
    x = jnp.zeros((1, 64, 64, 3))
    ref_vars = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    ref_flat = {jax.tree_util.keystr(k): v.shape for k, v in
                jax.tree_util.tree_flatten_with_path(ref_vars)[0]}
    got_flat = {jax.tree_util.keystr(k): np.shape(v) for k, v in
                jax.tree_util.tree_flatten_with_path(variables)[0]}
    assert ref_flat == got_flat
    out = model.apply(variables, jnp.asarray(
        np.random.RandomState(1).rand(1, 64, 64, 3), jnp.float32))
    assert out.shape == (1, 64, 64)
    assert np.isfinite(np.asarray(out)).all()
    assert 0 <= float(out.min()) and float(out.max()) <= 1


def test_convert_lpips_runs():
    from motion324_tpu.evaluation.video_metrics import LPIPSVGG
    from motion324_tpu.utils.torch_convert import convert_lpips
    rng = np.random.RandomState(2)
    cfg = LPIPSVGG.VGG_CFG
    chans = [c for c in cfg if c != "M"]
    vgg_sd = {}
    cin = 3
    for t_i, c in zip([0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28], chans):
        vgg_sd[f"features.{t_i}.weight"] = rng.randn(c, cin, 3, 3).astype("f") * 0.05
        vgg_sd[f"features.{t_i}.bias"] = np.zeros(c, "f")
        cin = c
    taps = [chans[i] for i in LPIPSVGG.STAGES]
    lins_sd = {f"lin{i}.model.1.weight":
               np.abs(rng.randn(1, c, 1, 1)).astype("f") for i, c in
               enumerate(taps)}
    params = convert_lpips(lins_sd, vgg_sd)
    model = LPIPSVGG(params=params)
    a = rng.rand(32, 32, 3).astype("f")
    b = rng.rand(32, 32, 3).astype("f")
    assert model(a, a) == 0.0
    assert model(a, b) > 0
