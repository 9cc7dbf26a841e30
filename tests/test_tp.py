"""Tensor-parallel (GSPMD) train step on a dp2 x mp4 virtual mesh.

Goes beyond the reference (data parallel only, SURVEY §2.5): transformer
weights shard over ``mp`` and the GSPMD-partitioned step must match the
shard_map data-parallel step numerically."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motion324_tpu.config import load_config
from motion324_tpu.models.motion_model import ModelConfig, MotionLatentModel
from motion324_tpu.parallel.mesh import batch_sharding, make_mesh
from motion324_tpu.parallel.tp import tp_param_specs
from motion324_tpu.training.optimizer import create_optimizer
from motion324_tpu.training.train_step import TrainState, build_train_step

SMALL = ModelConfig(feat_dim=96, tokens=4, pcd_layers=1,
                    n_alternating_layers=2, head_dim=24, frames=2,
                    image_size=28, patch_size=14, drop_rate=0.0,
                    dino_depth=1, dino_heads=4)


def _batch(key, b=8):
    ks = jax.random.split(key, 8)
    s, n, t = 16, 8, 2
    return {
        "ref_shape_pcd": jax.random.normal(ks[0], (b, s, 3)),
        "ref_shape_normals": jax.random.normal(ks[1], (b, s, 3)),
        "ref_shape_rgbs": jax.random.uniform(ks[2], (b, s, 3)),
        "ref_pcd": jax.random.normal(ks[3], (b, n, 3)),
        "ref_normal": jax.random.normal(ks[4], (b, n, 3)),
        "ref_rgb": jax.random.uniform(ks[5], (b, n, 3)),
        "rgb_video": jax.random.uniform(ks[6], (b, t, 28, 28, 3)),
        "point_clouds": jax.random.normal(ks[7], (b, t, n, 3)) * 0.1,
    }


def test_tp_specs_shard_transformer_kernels():
    model = MotionLatentModel(SMALL)
    batch = _batch(jax.random.PRNGKey(0))
    params = jax.eval_shape(model.init, jax.random.PRNGKey(1), batch)
    specs = tp_param_specs(params)
    flat = {jax.tree_util.keystr(k): v for k, v in
            jax.tree_util.tree_flatten_with_path(specs)[0]}
    qkv = [v for k, v in flat.items() if "to_qkv" in k and "kernel" in k]
    assert qkv and all("mp" in str(s) for s in qkv)
    fc = [v for k, v in flat.items()
          if k.endswith("['attn']['fc']['kernel']")]
    assert fc and all("mp" in str(s) for s in fc)
    norms = [v for k, v in flat.items() if "norm" in k.lower()]
    assert norms and all("mp" not in str(s) for s in norms)


def test_gspmd_tp_step_matches_shard_map_dp():
    cfg = load_config("configs/dyscene.yaml",
                      ["training.warmup=2", "training.train_steps=100",
                       "training.lr=1e-3", "training.grad_accum_steps=1",
                       "training.allowed_gradnorm_factor=1e9"])
    model = MotionLatentModel(SMALL)
    batch = _batch(jax.random.PRNGKey(0))
    params = jax.jit(model.init)(jax.random.PRNGKey(1), batch)
    params_np = jax.tree.map(np.asarray, params)
    tx, _ = create_optimizer(cfg)

    # reference: shard_map dp over all 8 devices
    mesh_dp = make_mesh(dp=8, mp=1)
    step_dp = build_train_step(model, tx, cfg, mesh_dp)
    st = TrainState.create(jax.tree.map(jnp.asarray, params_np), tx)
    b_dp = jax.device_put(batch, batch_sharding(mesh_dp))
    st_dp, m_dp = step_dp(st, b_dp, jax.random.PRNGKey(7))

    # tensor+data parallel: dp2 x mp4 GSPMD
    mesh_tp = make_mesh(dp=2, mp=4)
    step_tp = build_train_step(model, tx, cfg, mesh_tp, mode="gspmd")
    st2 = TrainState.create(jax.tree.map(jnp.asarray, params_np), tx)
    st2 = jax.device_put(st2, step_tp.state_shardings(st2))
    b_tp = jax.device_put(batch, batch_sharding(mesh_tp))
    st_tp, m_tp = step_tp(st2, b_tp, jax.random.PRNGKey(7))

    assert float(m_tp["loss"]) == pytest.approx(float(m_dp["loss"]),
                                                rel=1e-5)
    assert float(m_tp["grad_norm"]) == pytest.approx(
        float(m_dp["grad_norm"]), rel=1e-4)
    # updated parameters agree across the two partitionings
    a = np.asarray(jax.tree.leaves(st_dp.params)[0])
    b_ = np.asarray(jax.tree.leaves(st_tp.params)[0])
    np.testing.assert_allclose(a, b_, atol=2e-5, rtol=2e-5)
    assert int(st_tp.step) == 1


def test_tp_inference_pipeline_matches_single_device():
    """MotionPipeline over a (1, mp=8) mesh produces the same trajectories as
    the unsharded pipeline."""
    from motion324_tpu.inference.pipeline import MotionPipeline
    model = MotionLatentModel(SMALL)
    batch = _batch(jax.random.PRNGKey(3), b=1)
    params = jax.jit(model.init)(jax.random.PRNGKey(4), batch)

    inputs = {k: np.asarray(v) for k, v in batch.items()
              if k != "point_clouds"}
    video = np.asarray(batch["rgb_video"][0])

    # f32 readback on both sides: this test gates PARALLELISM parity,
    # so the u16 wire quantum must not eat the 2e-5 tolerance margin
    pipe_1 = MotionPipeline(SMALL, params, window=2, decode_chunk=8,
                            u16_readback=False)
    ref = pipe_1.predict(inputs, video)

    mesh = make_mesh(dp=1, mp=8)
    pipe_tp = MotionPipeline(SMALL, params, window=2, decode_chunk=8,
                             mesh=mesh, u16_readback=False)
    out = pipe_tp.predict(inputs, video)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)
