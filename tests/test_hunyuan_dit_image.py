"""HunyuanDiT image-DiT parity vs the torch diffusers-layout oracle.

Closes the round-2 gap "text2image cannot load the released HunyuanDiT
checkpoint": motion324_tpu/hy3dgen/hunyuan_dit_image.py implements the
diffusers HunyuanDiT2DModel block layout + converter, validated numerically
against tests/hunyuan_dit_oracle.py (reference consumer:
scripts/hy3dgen/text2image.py:30-45)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

import hunyuan_dit_oracle
from motion324_tpu.hy3dgen.hunyuan_dit_image import (HunyuanDiT2D,
                                                     convert_hunyuan_dit_image)

CFG = dict(hidden=32, heads=4, num_layers=6, patch=2, in_channels=4,
           ctx_dim=16, t5_dim=24, text_len=5, text_len_t5=7)


def _build(seed=0, use_style=True):
    torch.manual_seed(seed)
    ref = hunyuan_dit_oracle.HunyuanDiT2DModel(**CFG, use_style=use_style)
    with torch.no_grad():
        for p in ref.parameters():
            p.copy_(torch.randn_like(p) * 0.05)
    return ref.eval()


def _inputs(rng):
    x = rng.randn(2, 8, 8, 4).astype(np.float32)
    t = np.array([3.0, 250.0], np.float32)
    clip = rng.randn(2, CFG["text_len"], CFG["ctx_dim"]).astype(np.float32)
    t5 = rng.randn(2, CFG["text_len_t5"], CFG["t5_dim"]).astype(np.float32)
    clip_mask = np.array([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]], np.int32)
    t5_mask = np.array([[1] * 7, [1, 1, 1, 1, 0, 0, 0]], np.int32)
    meta = np.tile(np.array([[64, 64, 64, 64, 0, 0]], np.float32), (2, 1))
    style = np.zeros((2,), np.int64)
    return x, t, clip, t5, clip_mask, t5_mask, meta, style


@pytest.mark.parametrize("use_style", [True, False])
def test_hunyuan_dit_matches_torch_oracle(use_style):
    ref = _build(0, use_style)
    params = convert_hunyuan_dit_image(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()},
        num_layers=CFG["num_layers"])
    ours = HunyuanDiT2D(**CFG, use_style=use_style)

    rng = np.random.RandomState(0)
    x, t, clip, t5, cm, tm, meta, style = _inputs(rng)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                      torch.from_numpy(t), torch.from_numpy(clip),
                      torch.from_numpy(t5), torch.from_numpy(cm),
                      torch.from_numpy(tm), torch.from_numpy(meta),
                      torch.from_numpy(style)).numpy().transpose(0, 2, 3, 1)
    out = np.asarray(ours.apply(params, jnp.asarray(x), jnp.asarray(t),
                                jnp.asarray(clip), jnp.asarray(t5),
                                jnp.asarray(cm), jnp.asarray(tm),
                                jnp.asarray(meta), jnp.asarray(style)))
    np.testing.assert_allclose(out, ref_out, atol=2e-4, rtol=2e-4)


def test_converter_strict_rejects_junk():
    ref = _build(1)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    sd["blocks.0.unknown.weight"] = np.zeros((2, 2), np.float32)
    with pytest.raises(KeyError):
        convert_hunyuan_dit_image(sd, num_layers=CFG["num_layers"])


def test_released_dims_param_shapes():
    """Full v1.1 dims initialise with the checkpoint's expected shapes
    (1408 hidden, 40 blocks, skip linears in the latter half only)."""
    import jax

    model = HunyuanDiT2D()
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 4)),
                           jnp.zeros((1,)), jnp.zeros((1, 77, 1024)),
                           jnp.zeros((1, 256, 2048))))["params"]
    assert shapes["pos_embed_proj"]["kernel"].shape == (2, 2, 4, 1408)
    assert shapes["text_embedder"]["linear_1"]["kernel"].shape == (2048, 8192)
    assert shapes["text_embedding_padding"].shape == (333, 1024)
    assert shapes["extra_embedder"]["linear_1"]["kernel"].shape == (
        1024 + 1536 + 1408, 4 * 1408)
    assert "skip_linear" not in shapes["block_20"]
    assert shapes["block_21"]["skip_linear"]["kernel"].shape == (2816, 1408)
    assert shapes["proj_out"]["kernel"].shape == (1408, 2 * 2 * 8)


# --------------------------------------------------------------------------- #
# Perturbed-attention guidance (reference text2image.py:30-81: enable_pag,
# pag_scale=1.3, pag_applied_layers blocks 16-19)
# --------------------------------------------------------------------------- #
def _tiny_pipeline(pag_layers=(2, 3)):
    import jax

    from motion324_tpu.hy3dgen.hunyuan_dit_image import HunyuanDiTImagePipeline
    from motion324_tpu.hy3dgen.sd_vae import AutoencoderKL

    model = HunyuanDiT2D(**CFG)
    vae = AutoencoderKL(block_channels=(8, 16), layers_per_block=1)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    mp = jax.jit(lambda k: model.init(
        k, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
        jnp.zeros((1, CFG["text_len"], CFG["ctx_dim"])),
        jnp.zeros((1, CFG["text_len_t5"], CFG["t5_dim"]))))(k1)
    vp = jax.jit(lambda k: vae.init(k, jnp.zeros((1, 16, 16, 3))))(k2)
    return HunyuanDiTImagePipeline(
        {"transformer": mp, "vae": vp}, model=model, vae=vae, image_size=64,
        pag_applied_layers=pag_layers)


def test_pag_identity_attention_semantics():
    """perturb=True == to_out(to_v(x)): identity attention map, q/k/norms/
    rope skipped (diffusers PAGIdentitySelfAttnProcessor semantics)."""
    import jax

    from motion324_tpu.hy3dgen.hunyuan_dit_image import _HunyuanAttention

    attn = _HunyuanAttention(dim=32, heads=4)
    x = np.random.RandomState(0).randn(2, 9, 32).astype(np.float32)
    params = attn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = attn.apply(params, jnp.asarray(x), perturb=True)
    p = params["params"]
    manual = (x @ np.asarray(p["to_v"]["kernel"])
              + np.asarray(p["to_v"]["bias"])) @ np.asarray(
        p["to_out"]["kernel"]) + np.asarray(p["to_out"]["bias"])
    np.testing.assert_allclose(np.asarray(out), manual, atol=1e-5)
    # and differs from the unperturbed attention
    base = attn.apply(params, jnp.asarray(x))
    assert not np.allclose(np.asarray(base), manual, atol=1e-3)


def test_pag_zero_scale_degenerates_to_cfg():
    pipe = _tiny_pipeline()
    rng = np.random.RandomState(1)
    clip = rng.randn(1, CFG["text_len"], CFG["ctx_dim"]).astype(np.float32)
    t5 = rng.randn(1, CFG["text_len_t5"], CFG["t5_dim"]).astype(np.float32)
    plain = pipe(clip, t5, num_steps=3, seed=7)
    pag0 = pipe(clip, t5, num_steps=3, seed=7, enable_pag=True, pag_scale=0.0)
    np.testing.assert_allclose(pag0, plain, atol=1e-6)


def test_pag_changes_output_and_respects_layers():
    pipe = _tiny_pipeline(pag_layers=(2, 3))
    rng = np.random.RandomState(1)
    clip = rng.randn(1, CFG["text_len"], CFG["ctx_dim"]).astype(np.float32)
    t5 = rng.randn(1, CFG["text_len_t5"], CFG["t5_dim"]).astype(np.float32)
    plain = pipe(clip, t5, num_steps=3, seed=7)
    pag = pipe(clip, t5, num_steps=3, seed=7, enable_pag=True, pag_scale=1.3)
    assert not np.allclose(pag, plain, atol=1e-4)
    assert np.isfinite(pag).all() and 0 <= pag.min() and pag.max() <= 1
    # out-of-range layer indices are dropped (40-block default on a 6-block
    # test model leaves no applied layers -> identical to plain CFG)
    pipe_none = _tiny_pipeline(pag_layers=(16, 17, 18, 19))
    assert pipe_none.pag_applied_layers == ()
