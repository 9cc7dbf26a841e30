"""Sequence parallelism (frame-axis sharding) for long-window inference.

The global attention all-gathers K/V over the ``mp`` axis (exact attention);
DINO, local attention, pos-embeds, special tokens and decoding stay
frame-local. SP outputs must match the single-device model bit-for-bit up to
f32 reduction order on the virtual 8-device CPU mesh.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motion324_tpu.inference.pipeline import MotionPipeline
from motion324_tpu.models.motion_model import ModelConfig, MotionLatentModel
from motion324_tpu.parallel.mesh import make_mesh

SMALL = ModelConfig(feat_dim=36, tokens=4, pcd_layers=1,
                    n_alternating_layers=2, head_dim=12, frames=2,
                    image_size=28, patch_size=14, drop_rate=0.0,
                    dino_depth=1, dino_heads=3)


def _inputs(key, b=1, s=16, n=8, t=8, hw=28):
    ks = jax.random.split(key, 7)
    return {
        "ref_shape_pcd": jax.random.normal(ks[0], (b, s, 3)),
        "ref_shape_normals": jax.random.normal(ks[1], (b, s, 3)),
        "ref_shape_rgbs": jax.random.uniform(ks[2], (b, s, 3)),
        "ref_pcd": jax.random.normal(ks[3], (b, n, 3)),
        "ref_normal": jax.random.normal(ks[4], (b, n, 3)),
        "ref_rgb": jax.random.uniform(ks[5], (b, n, 3)),
        "rgb_video": jax.random.uniform(ks[6], (b, t, hw, hw, 3)),
    }


@pytest.mark.skipif(jax.device_count() < 4, reason="needs a multi-device mesh")
def test_sp_matches_single_device():
    sample = _inputs(jax.random.PRNGKey(0), t=8)
    model = MotionLatentModel(SMALL)
    params = model.init(jax.random.PRNGKey(1), sample)

    ref = model.apply(params, sample)  # (B, T, N, 3) single-device

    mesh = make_mesh(dp=1, mp=4, devices=jax.devices()[:4])
    pipe = MotionPipeline(SMALL, params, window=8, mesh=mesh, parallel="sp")
    feat = pipe._encode_shape(pipe.params, sample["ref_shape_pcd"],
                              sample["ref_shape_normals"],
                              sample["ref_shape_rgbs"])
    tokens = pipe._encode_video(pipe.params, sample["rgb_video"], feat)
    out = pipe._decode(pipe.params, tokens, sample["ref_pcd"],
                       sample["ref_normal"], sample["ref_rgb"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.skipif(jax.device_count() < 4, reason="needs a multi-device mesh")
def test_sp_frame0_special_token_and_pos_embed_offsets():
    """Shard-local frame bookkeeping: only the GLOBAL frame 0 gets the
    frame-0 special token, and pos-embeds follow global frame indices —
    verified by permuting which device holds frame 0 (a wrong offset would
    reproduce frame-0 treatment on every shard)."""
    sample = _inputs(jax.random.PRNGKey(2), t=4)
    model = MotionLatentModel(SMALL)
    params = model.init(jax.random.PRNGKey(1), sample)
    ref = model.apply(params, sample)

    mesh = make_mesh(dp=1, mp=4, devices=jax.devices()[:4])  # one frame per device
    pipe = MotionPipeline(SMALL, params, window=4, mesh=mesh, parallel="sp")
    feat = pipe._encode_shape(pipe.params, sample["ref_shape_pcd"],
                              sample["ref_shape_normals"],
                              sample["ref_shape_rgbs"])
    tokens = pipe._encode_video(pipe.params, sample["rgb_video"], feat)
    out = pipe._decode(pipe.params, tokens, sample["ref_pcd"],
                       sample["ref_normal"], sample["ref_rgb"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
    # frames differ from each other (pos-embed actually applied per frame)
    assert not np.allclose(np.asarray(out[:, 0]), np.asarray(out[:, 1]))


def test_sp_window_divisibility_guard():
    if jax.device_count() < 4:
        pytest.skip("needs a multi-device mesh")
    sample = _inputs(jax.random.PRNGKey(0), t=8)
    model = MotionLatentModel(SMALL)
    params = model.init(jax.random.PRNGKey(1), sample)
    mesh = make_mesh(dp=1, mp=4, devices=jax.devices()[:4])
    with pytest.raises(ValueError, match="divisible"):
        MotionPipeline(SMALL, params, window=6, mesh=mesh, parallel="sp")


def test_sp_config_single_shard_is_identity():
    """sp_size=1 must reduce to the plain model (the where-based special
    token build replaced a concat — same semantics)."""
    sample = _inputs(jax.random.PRNGKey(3), t=3)
    model = MotionLatentModel(SMALL)
    params = model.init(jax.random.PRNGKey(1), sample)
    ref = model.apply(params, sample)
    model_sp1 = MotionLatentModel(dataclasses.replace(SMALL, sp_size=1))
    out = model_sp1.apply(params, sample)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0)


def test_sp_short_video_falls_back_to_replicated():
    """Clips shorter than the window (frame count not divisible by the mesh)
    must run replicated instead of crashing in shard_map."""
    if jax.device_count() < 4:
        pytest.skip("needs a multi-device mesh")
    sample = _inputs(jax.random.PRNGKey(4), t=6)  # 6 % 4 != 0
    model = MotionLatentModel(SMALL)
    params = model.init(jax.random.PRNGKey(1), sample)
    ref = model.apply(params, sample)
    mesh = make_mesh(dp=1, mp=4, devices=jax.devices()[:4])
    pipe = MotionPipeline(SMALL, params, window=8, mesh=mesh, parallel="sp")
    feat = pipe._encode_shape(pipe.params, sample["ref_shape_pcd"],
                              sample["ref_shape_normals"],
                              sample["ref_shape_rgbs"])
    tokens = pipe._encode_video(pipe.params, sample["rgb_video"], feat)
    out = pipe._decode(pipe.params, tokens, sample["ref_pcd"],
                       sample["ref_normal"], sample["ref_rgb"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.slow
@pytest.mark.skipif(jax.device_count() < 4, reason="needs a multi-device mesh")
def test_sp_with_in_graph_u2net_segmentation():
    """In-graph U2Net segmentation composes with the sequence-parallel
    shard_map encode: the seg params ride as a (replicated) closure capture
    and each device masks its own frame block (70^2 frames: the smallest
    size the full U-2-Net pool stack accepts)."""
    from motion324_tpu.inference.segmentation import U2Net

    cfg = dataclasses.replace(SMALL, image_size=70)
    model = MotionLatentModel(cfg)
    sample = _inputs(jax.random.PRNGKey(6), t=8, hw=70)
    params = model.init(jax.random.PRNGKey(1), sample)
    net = U2Net()
    seg_params = jax.jit(net.init)(jax.random.PRNGKey(2),
                                   jnp.zeros((1, 70, 70, 3)))
    mesh = make_mesh(dp=1, mp=jax.device_count())
    pipe = MotionPipeline(cfg, params, window=8, mesh=mesh, parallel="sp",
                          seg_params=seg_params)
    inputs = {k: np.asarray(v) for k, v in sample.items()
              if k != "rgb_video"}
    video = np.asarray(sample["rgb_video"][0])
    t_seg = pipe.predict(inputs, video, segment="u2net")
    assert t_seg.shape == (1, 8, 8, 3)
    assert np.isfinite(t_seg).all()
    # masking changes the trajectories vs the unsegmented path
    t_off = pipe.predict(inputs, video, segment=False)
    assert np.abs(t_seg - t_off).max() > 1e-7
