"""Pipeline-parallel (GPipe) train step on virtual CPU meshes.

Beyond the reference (data parallel only, SURVEY §2.5): the alternating
stack's layer axis shards over ``mp`` stages and activations rotate
stage-to-stage via ``lax.ppermute`` (motion324_tpu.parallel.pp). The
pipelined step must match the shard_map data-parallel step numerically —
pipelining is a schedule, not a different computation.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motion324_tpu.config import load_config
from motion324_tpu.models.motion_model import ModelConfig, MotionLatentModel
from motion324_tpu.parallel.mesh import batch_sharding, make_mesh
from motion324_tpu.parallel.pp import is_stack_path, pp_spec_for
from motion324_tpu.training.optimizer import create_optimizer
from motion324_tpu.training.train_step import TrainState, build_train_step

# 4 alternating pairs so the stack splits into 2 or 4 stages
SMALL = ModelConfig(feat_dim=96, tokens=4, pcd_layers=1,
                    n_alternating_layers=8, head_dim=24, frames=2,
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


def _cfg():
    return load_config("configs/dyscene.yaml",
                       ["training.warmup=2", "training.train_steps=100",
                        "training.lr=1e-3", "training.grad_accum_steps=1",
                        "training.allowed_gradnorm_factor=1e9"])


def test_pp_specs_shard_only_the_stack():
    model = MotionLatentModel(SMALL)
    batch = _batch(jax.random.PRNGKey(0))
    params = jax.eval_shape(model.init, jax.random.PRNGKey(1), batch)
    specs = jax.tree_util.tree_map_with_path(pp_spec_for, params)
    flat = {jax.tree_util.keystr(k): v for k, v in
            jax.tree_util.tree_flatten_with_path(specs)[0]}
    stack = {k: v for k, v in flat.items() if "alternating_blocks" in k}
    rest = {k: v for k, v in flat.items() if "alternating_blocks" not in k}
    assert stack and all("mp" in str(s) for s in stack.values())
    assert rest and all("mp" not in str(s) for s in rest.values())


@pytest.mark.parametrize("dp,pp,micro", [(2, 4, 2), (4, 2, 2)])
@pytest.mark.slow
def test_pp_step_matches_shard_map_dp(dp, pp, micro):
    cfg = _cfg()
    model = MotionLatentModel(SMALL)
    batch = _batch(jax.random.PRNGKey(0))
    params = jax.jit(model.init)(jax.random.PRNGKey(1), batch)
    params_np = jax.tree.map(np.asarray, params)
    tx, _ = create_optimizer(cfg)

    # reference: shard_map dp over all 8 devices
    mesh_dp = make_mesh(dp=8, mp=1)
    step_dp = build_train_step(model, tx, cfg, mesh_dp)
    st = TrainState.create(jax.tree.map(jnp.asarray, params_np), tx)
    st_dp, m_dp = step_dp(st, jax.device_put(batch, batch_sharding(mesh_dp)),
                          jax.random.PRNGKey(7))

    # pipeline(+data) parallel over (dp, mp=pp stages)
    mesh_pp = make_mesh(dp=dp, mp=pp)
    model_pp = MotionLatentModel(dataclasses.replace(
        SMALL, pp_axis="mp", pp_size=pp, pp_microbatches=micro))
    step_pp = build_train_step(model_pp, tx, cfg, mesh_pp, mode="pp")
    st2 = TrainState.create(jax.tree.map(jnp.asarray, params_np), tx)
    st2 = jax.device_put(st2, step_pp.state_shardings(st2))
    st_pp, m_pp = step_pp(st2, jax.device_put(batch, batch_sharding(mesh_pp)),
                          jax.random.PRNGKey(7))

    assert float(m_pp["loss"]) == pytest.approx(float(m_dp["loss"]), rel=1e-5)
    assert float(m_pp["grad_norm"]) == pytest.approx(
        float(m_dp["grad_norm"]), rel=1e-4)
    assert float(m_pp["skipped"]) == 0.0
    # updated parameters agree across the two partitionings: check one stack
    # leaf (stage-sharded) and one replicated leaf
    flat_dp = {jax.tree_util.keystr(k): v for k, v in
               jax.tree_util.tree_flatten_with_path(st_dp.params)[0]}
    flat_pp = {jax.tree_util.keystr(k): v for k, v in
               jax.tree_util.tree_flatten_with_path(st_pp.params)[0]}
    n_checked = 0
    for k, v in flat_dp.items():
        if "alternating_blocks" in k or "point_decoder" in k \
                or "special_token" in k:
            np.testing.assert_allclose(np.asarray(flat_pp[k]), np.asarray(v),
                                       atol=3e-5, rtol=3e-5, err_msg=k)
            n_checked += 1
    assert n_checked > 4
    assert int(st_pp.step) == 1


def test_pp_inference_pipeline_matches_single_device():
    """MotionPipeline(parallel='pp') over a (1, mp=4) mesh produces the same
    trajectories as the unsharded pipeline."""
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

    mesh = make_mesh(dp=1, mp=4, devices=jax.devices()[:4])
    pipe_pp = MotionPipeline(SMALL, params, window=2, decode_chunk=8,
                             mesh=mesh, parallel="pp")
    out = pipe_pp.predict(inputs, video)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_pp_forward_matches_unsharded():
    """encode_video under the pipeline schedule is bit-compatible with the
    plain stacked forward (same params, same tokens)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    model = MotionLatentModel(SMALL)
    batch = _batch(jax.random.PRNGKey(3), b=4)
    params = jax.jit(model.init)(jax.random.PRNGKey(4), batch)

    ref = model.apply(params, batch)  # (B, T, N, 3)

    pp = 4
    mesh = make_mesh(dp=1, mp=pp, devices=jax.devices()[:pp])
    model_pp = MotionLatentModel(dataclasses.replace(
        SMALL, pp_axis="mp", pp_size=pp, pp_microbatches=2))
    pspecs = jax.tree_util.tree_map_with_path(pp_spec_for, params)
    params_s = jax.device_put(params, jax.tree.map(
        lambda s: NamedSharding(mesh, s), pspecs))

    def fwd(p, b):
        return model_pp.apply(p, b)

    out = jax.jit(jax.shard_map(
        fwd, mesh=mesh, in_specs=(pspecs, P()), out_specs=P(),
        check_vma=False))(params_s, batch)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_pp_custom_loss_fn_masked():
    """A caller-supplied loss_fn must get the last-stage mask applied by the
    pp step itself — otherwise the stage psum scales loss (and the
    replicated-path grads) by n_stages."""
    if jax.device_count() < 4:
        pytest.skip("needs a multi-device mesh")
    from motion324_tpu.training.loss import coord_mse_loss

    cfg = _cfg()
    pp = 4
    mesh = make_mesh(dp=2, mp=pp)
    model_pp = MotionLatentModel(dataclasses.replace(
        SMALL, pp_axis="mp", pp_size=pp, pp_microbatches=2))
    batch = _batch(jax.random.PRNGKey(0))
    params_np = jax.tree.map(np.asarray, jax.jit(
        MotionLatentModel(SMALL).init)(jax.random.PRNGKey(1), batch))

    def my_loss(params, batch, rng):
        pred = model_pp.apply(params, batch, train=True,
                              rngs={"dropout": rng})
        return coord_mse_loss(pred, batch["point_clouds"], 1.0)

    tx, _ = create_optimizer(cfg)
    step_default = build_train_step(model_pp, tx, cfg, mesh, mode="pp")
    step_custom = build_train_step(model_pp, tx, cfg, mesh, mode="pp",
                                   loss_fn=my_loss)

    st1 = TrainState.create(jax.tree.map(jnp.asarray, params_np), tx)
    st1 = jax.device_put(st1, step_default.state_shardings(st1))
    b = jax.device_put(batch, batch_sharding(mesh))
    _, m1 = step_default(st1, b, jax.random.PRNGKey(3))

    st2 = TrainState.create(jax.tree.map(jnp.asarray, params_np), tx)
    st2 = jax.device_put(st2, step_custom.state_shardings(st2))
    _, m2 = step_custom(st2, b, jax.random.PRNGKey(3))

    # identical loss definitions -> identical masked loss and grad norm
    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]),
                               rtol=1e-6)
    np.testing.assert_allclose(float(m2["grad_norm"]),
                               float(m1["grad_norm"]), rtol=1e-5)
