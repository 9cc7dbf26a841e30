"""Sharded train step on the virtual 8-device mesh: loss decreases, NaN and
gradient-spike batches are skipped coherently, accumulation matches big-batch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motion324_tpu.config import load_config
from motion324_tpu.models.motion_model import ModelConfig, MotionLatentModel
from motion324_tpu.parallel.mesh import batch_sharding, make_mesh
from motion324_tpu.training.optimizer import create_optimizer
from motion324_tpu.training.train_step import TrainState, build_train_step

SMALL = ModelConfig(feat_dim=36, tokens=4, pcd_layers=1, n_alternating_layers=2,
                    head_dim=12, frames=2, image_size=28, patch_size=14,
                    drop_rate=0.0, dino_depth=1, dino_heads=3)


def _batch(key, b=8, s=16, n=8, t=2, h=28, w=28):
    ks = jax.random.split(key, 8)
    return {
        "ref_shape_pcd": jax.random.normal(ks[0], (b, s, 3)),
        "ref_shape_normals": jax.random.normal(ks[1], (b, s, 3)),
        "ref_shape_rgbs": jax.random.uniform(ks[2], (b, s, 3)),
        "ref_pcd": jax.random.normal(ks[3], (b, n, 3)),
        "ref_normal": jax.random.normal(ks[4], (b, n, 3)),
        "ref_rgb": jax.random.uniform(ks[5], (b, n, 3)),
        "rgb_video": jax.random.uniform(ks[6], (b, t, h, w, 3)),
        "point_clouds": jax.random.normal(ks[7], (b, t, n, 3)) * 0.1,
    }


@pytest.fixture(scope="module")
def _shared():
    cfg = load_config("configs/dyscene.yaml",
                      ["training.warmup=2", "training.train_steps=100",
                       "training.lr=1e-3", "training.grad_accum_steps=1",
                       "training.allowed_gradnorm_factor=1e9"])
    mesh = make_mesh()
    model = MotionLatentModel(SMALL)
    batch = _batch(jax.random.PRNGKey(0))
    params = model.init(jax.random.PRNGKey(1), batch)
    # pristine host copy: step_fn donates its input state buffers
    params_np = jax.tree.map(np.asarray, params)
    tx, _ = create_optimizer(cfg)
    step_fn = build_train_step(model, tx, cfg, mesh)
    return cfg, mesh, model, batch, params_np, tx, step_fn


@pytest.fixture()
def setup(_shared):
    cfg, mesh, model, batch, params_np, tx, step_fn = _shared
    params = jax.tree.map(jnp.asarray, params_np)
    state = TrainState.create(params, tx)
    return cfg, mesh, model, batch, state, step_fn


def test_loss_decreases(setup):
    cfg, mesh, model, batch, state, step_fn = setup
    sharding = batch_sharding(mesh)
    batch = jax.device_put(batch, sharding)
    rng = jax.random.PRNGKey(0)
    losses = []
    for _ in range(8):
        state, metrics = step_fn(state, batch, rng)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert all(np.isfinite(losses))
    assert int(state.step) == 8


def test_nan_batch_skipped(setup):
    cfg, mesh, model, batch, state, step_fn = setup
    sharding = batch_sharding(mesh)
    bad = dict(batch)
    # poison ONE sample on one shard: the pmean'd loss must go NaN everywhere
    bad["rgb_video"] = batch["rgb_video"].at[0].set(jnp.nan)
    bad = jax.device_put(bad, sharding)
    step_before = int(state.step)
    update_before = int(state.update_step)
    params_before = np.asarray(jax.tree.leaves(state.params)[0]).copy()
    state2, metrics = step_fn(state, bad, jax.random.PRNGKey(0))
    assert float(metrics["skipped"]) == 1.0
    np.testing.assert_array_equal(np.asarray(jax.tree.leaves(state2.params)[0]),
                                  params_before)
    assert int(state2.step) == step_before + 1  # fwdbwd counter still advances
    # but the applied-update counter freezes (reference fwdbwd_pass_step vs
    # param_update_step, train.py:254-269)
    assert int(state2.update_step) == update_before


def test_grad_clipping_and_norm_reported(setup):
    cfg, mesh, model, batch, state, step_fn = setup
    batch = jax.device_put(batch, batch_sharding(mesh))
    _, metrics = step_fn(state, batch, jax.random.PRNGKey(0))
    assert float(metrics["grad_norm"]) > 0
    assert float(metrics["skipped"]) == 0.0


def test_grad_accumulation_matches_big_batch():
    cfg = load_config("configs/dyscene.yaml", ["training.warmup=0",
                                               "training.train_steps=100",
                                               "training.lr=1e-2",
                                               "training.grad_accum_steps=2"])
    mesh = make_mesh()
    model = MotionLatentModel(SMALL)
    big = _batch(jax.random.PRNGKey(5), b=16)
    params_np = jax.tree.map(np.asarray, model.init(jax.random.PRNGKey(1), big))
    tx, _ = create_optimizer(cfg)

    # accumulated: (accum=2, 8, ...)
    state_a = TrainState.create(jax.tree.map(jnp.asarray, params_np), tx)
    step_accum = build_train_step(model, tx, cfg, mesh)
    split = jax.tree.map(lambda x: x.reshape(2, 8, *x.shape[1:]), big)
    split = jax.device_put(split, jax.NamedSharding(
        mesh, jax.sharding.PartitionSpec(None, "dp")))
    state_a, m_a = step_accum(state_a, split, jax.random.PRNGKey(0))

    # one big batch, accum=1
    cfg1 = load_config("configs/dyscene.yaml", ["training.warmup=0",
                                                "training.train_steps=100",
                                                "training.grad_accum_steps=1",
                                                "training.lr=1e-2"])
    state_b = TrainState.create(jax.tree.map(jnp.asarray, params_np), tx)
    step_big = build_train_step(model, tx, cfg1, mesh)
    big_s = jax.device_put(big, batch_sharding(mesh))
    state_b, m_b = step_big(state_b, big_s, jax.random.PRNGKey(0))

    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]),
                               rtol=1e-5)
    la = jax.tree.leaves(state_a.params)
    lb = jax.tree.leaves(state_b.params)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-3)


def test_frozen_encoder_not_updated(setup):
    cfg, mesh, model, batch, state, step_fn = setup
    batch = jax.device_put(batch, batch_sharding(mesh))
    before = jax.tree.map(lambda x: np.asarray(x).copy(),
                          state.params["params"]["image_encoder"])
    state2, _ = step_fn(state, batch, jax.random.PRNGKey(0))
    after = state2.params["params"]["image_encoder"]
    for b, a in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))


def test_bf16_grad_allreduce_close_to_f32(_shared):
    """training.bf16_grad_allreduce halves ICI gradient traffic; one step's
    resulting params must stay within bf16 rounding of the f32-reduce step."""
    cfg, mesh, model, batch, params_np, tx, step_f32 = _shared
    cfg16 = load_config("configs/dyscene.yaml",
                        ["training.warmup=2", "training.train_steps=100",
                         "training.lr=1e-3", "training.grad_accum_steps=1",
                         "training.allowed_gradnorm_factor=1e9",
                         "training.bf16_grad_allreduce=true"])
    step_bf16 = build_train_step(model, tx, cfg16, mesh)
    sharding = batch_sharding(mesh)
    batch = jax.device_put(batch, sharding)
    rng = jax.random.PRNGKey(0)

    out = {}
    for name, fn in [("f32", step_f32), ("bf16", step_bf16)]:
        state = TrainState.create(jax.tree.map(jnp.asarray, params_np), tx)
        state, metrics = fn(state, batch, rng)
        assert np.isfinite(float(metrics["loss"]))
        assert float(metrics["skipped"]) == 0.0
        out[name] = jax.tree.map(np.asarray, state.params)

    leaves_a = jax.tree_util.tree_leaves(out["f32"])
    leaves_b = jax.tree_util.tree_leaves(out["bf16"])
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(a, b, rtol=0, atol=2e-2)


def test_bf16_grad_accum_close_to_f32():
    """training.grad_accum_dtype=bfloat16 halves the accumulator's HBM
    traffic; the resulting one-step params must stay within bf16 rounding of
    the f32-accumulation step."""
    over = ["training.warmup=0", "training.train_steps=100",
            "training.lr=1e-2", "training.grad_accum_steps=4",
            "training.allowed_gradnorm_factor=1e9"]
    mesh = make_mesh()
    model = MotionLatentModel(SMALL)
    big = _batch(jax.random.PRNGKey(5), b=32)
    params_np = jax.tree.map(np.asarray, model.init(jax.random.PRNGKey(1), big))
    split = jax.tree.map(lambda x: x.reshape(4, 8, *x.shape[1:]), big)
    out = {}
    for name, extra in [("f32", []),
                        ("bf16", ["training.grad_accum_dtype=bfloat16"])]:
        cfg = load_config("configs/dyscene.yaml", over + extra)
        tx, _ = create_optimizer(cfg)
        state = TrainState.create(jax.tree.map(jnp.asarray, params_np), tx)
        step = build_train_step(model, tx, cfg, mesh)
        batch = jax.device_put(split, jax.NamedSharding(
            mesh, jax.sharding.PartitionSpec(None, "dp")))
        state, metrics = step(state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))
        assert float(metrics["skipped"]) == 0.0
        out[name] = jax.tree.map(np.asarray, state.params)

    for a, b in zip(jax.tree_util.tree_leaves(out["f32"]),
                    jax.tree_util.tree_leaves(out["bf16"])):
        np.testing.assert_allclose(a, b, rtol=0, atol=2e-2)


def test_trainer_loop_end_to_end(tmp_path):
    """Trainer.train: 3 optimizer steps on a tiny model over an 8-device dp
    mesh, with grad accumulation, prefetched H2D batches, checkpointing and
    resume — the full train.py wiring minus the real dataset."""
    from motion324_tpu.training.trainer import Trainer

    cfg = load_config("configs/dyscene.yaml", [
        "training.grad_accum_steps=2",
        "training.train_steps=3",
        "training.warmup=1",
        f"training.checkpoint_dir={tmp_path}/ckpt",
        "training.checkpoint_every=3",
        "training.log_every=1",
        "training.print_every=100",
    ])
    mcfg = ModelConfig(feat_dim=48, tokens=4, pcd_layers=1,
                       n_alternating_layers=2, head_dim=12, frames=2,
                       image_size=28, patch_size=14, drop_rate=0.0,
                       dino_depth=1, dino_heads=3)
    model = MotionLatentModel(mcfg)
    mesh = make_mesh(dp=8, mp=1)

    def batches():
        r = np.random.RandomState(0)
        while True:
            b = 2 * 8  # accum 2 x dp 8 x 1/device
            yield {
                "ref_shape_pcd": r.randn(b, 32, 3).astype(np.float32) * 0.3,
                "ref_shape_normals": r.randn(b, 32, 3).astype(np.float32),
                "ref_shape_rgbs": r.rand(b, 32, 3).astype(np.float32),
                "ref_pcd": r.randn(b, 16, 3).astype(np.float32) * 0.3,
                "ref_normal": r.randn(b, 16, 3).astype(np.float32),
                "ref_rgb": r.rand(b, 16, 3).astype(np.float32),
                "rgb_video": r.rand(b, 2, 28, 28, 3).astype(np.float32),
                "point_clouds": r.randn(b, 2, 16, 3).astype(np.float32) * 0.3,
                "obj_name": ["synthetic"] * b,  # metadata leaf must be dropped
            }

    trainer = Trainer(cfg, batches(), model=model, mesh=mesh)
    state = trainer.train(max_steps=3)
    assert int(state.step) == 3
    assert int(state.update_step) >= 1

    # checkpoint written at step 3; a fresh trainer resumes from it
    trainer2 = Trainer(cfg, batches(), model=model, mesh=mesh)
    state2 = trainer2.train(max_steps=3)  # auto_resume -> already at 3
    assert int(state2.step) == 3


@pytest.mark.parametrize("mode", ["gspmd", "pp"])
def test_trainer_parallel_mode_from_config(tmp_path, mode):
    """training.parallel_mode plumbs through the Trainer: the trainer builds
    the model itself (pp stage fields derived from the mesh), places the
    state per step_fn.state_shardings, and steps on a dp4 x mp2 mesh."""
    from motion324_tpu.training.trainer import Trainer

    cfg = load_config("configs/dyscene.yaml", [
        f"training.parallel_mode={mode}",
        "training.grad_accum_steps=1",
        "training.pp_microbatches=2",
        "training.train_steps=2",
        "training.warmup=1",
        f"training.checkpoint_dir={tmp_path}/ckpt",
        "training.checkpoint_every=100",
        "training.log_every=1",
        "training.print_every=100",
        # tiny model dims via config (the trainer must build the model for
        # pp so it can derive the stage fields)
        # 4 alternating layers = 2 (global, local) pairs -> one pair per
        # pp stage on the mp=2 mesh
        "model.feat_dim=48", "model.tokens=4", "model.pcd_layers=1",
        "model.n_alternating_layers=4", "model.head_dim=12",
        "model.dino_depth=1", "model.dino_heads=3",
        "model.image_size=28", "model.patch_size=14", "model.drop_rate=0.0",
        "training.frames=2", "training.remat=false",
    ])
    mesh = make_mesh(dp=4, mp=2)

    def batches():
        r = np.random.RandomState(0)
        while True:
            b = 8  # dp 4 x 2/device (pp needs per-device batch divisible
                   # by pp_microbatches)
            yield {
                "ref_shape_pcd": r.randn(b, 32, 3).astype(np.float32) * 0.3,
                "ref_shape_normals": r.randn(b, 32, 3).astype(np.float32),
                "ref_shape_rgbs": r.rand(b, 32, 3).astype(np.float32),
                "ref_pcd": r.randn(b, 16, 3).astype(np.float32) * 0.3,
                "ref_normal": r.randn(b, 16, 3).astype(np.float32),
                "ref_rgb": r.rand(b, 16, 3).astype(np.float32),
                "rgb_video": r.rand(b, 2, 28, 28, 3).astype(np.float32),
                "point_clouds": r.randn(b, 2, 16, 3).astype(np.float32) * 0.3,
            }

    trainer = Trainer(cfg, batches(), mesh=mesh)
    if mode == "pp":
        assert trainer.model.cfg.pp_axis == "mp"
        assert trainer.model.cfg.pp_size == 2
    state = trainer.train(max_steps=2)
    assert int(state.step) == 2


def test_trainer_parallel_mode_rejects_accumulation(tmp_path):
    from motion324_tpu.training.trainer import Trainer

    cfg = load_config("configs/dyscene.yaml", [
        "training.parallel_mode=gspmd", "training.grad_accum_steps=2",
        f"training.checkpoint_dir={tmp_path}/ckpt",
    ])
    with pytest.raises(ValueError, match="accumulation"):
        Trainer(cfg, iter([]), mesh=make_mesh(dp=4, mp=2))


def test_invalid_grad_accum_dtype_rejected(_shared):
    cfg, mesh, model, _, _, tx, _ = _shared
    import copy
    bad = copy.deepcopy(cfg)
    bad.training.grad_accum_dtype = "bf16"  # must be the full dtype name
    with pytest.raises(ValueError, match="grad_accum_dtype"):
        build_train_step(model, tx, bad, mesh)
    # alternative modes don't accumulate: a non-default dtype is an error
    bad.training.grad_accum_dtype = "bfloat16"
    with pytest.raises(ValueError, match="no effect"):
        build_train_step(model, tx, bad, mesh, mode="gspmd")
