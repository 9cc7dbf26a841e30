"""Checkpoint save / auto-resume roundtrip and naming convention."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from motion324_tpu.config import load_config
from motion324_tpu.training.checkpoints import (
    auto_resume, find_checkpoints, latest_checkpoint, restore_params,
    save_checkpoint)
from motion324_tpu.training.optimizer import create_optimizer
from motion324_tpu.training.train_step import TrainState


def _tiny_state(step=0):
    cfg = load_config("configs/dyscene.yaml")
    params = {"params": {"dense": {"kernel": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
                                   "bias": jnp.ones((3,))},
                         "image_encoder": {"w": jnp.zeros((2, 2))}}}
    tx, _ = create_optimizer(cfg)
    state = TrainState.create(params, tx)
    return state.replace(step=jnp.asarray(step, jnp.int32),
                         update_step=jnp.asarray(step, jnp.int32)), tx


def test_save_and_resume_roundtrip(tmp_path):
    d = str(tmp_path)
    state, tx = _tiny_state(step=7)
    path = save_checkpoint(d, state)
    assert os.path.basename(path) == f"ckpt_{7:016d}"
    assert latest_checkpoint(d) == path

    fresh, _ = _tiny_state(step=0)
    restored, rpath = auto_resume(d, fresh)
    assert rpath == path
    assert int(restored.step) == 7
    np.testing.assert_array_equal(
        np.asarray(restored.params["params"]["dense"]["kernel"]),
        np.asarray(state.params["params"]["dense"]["kernel"]))


def test_auto_resume_picks_latest(tmp_path):
    d = str(tmp_path)
    s1, _ = _tiny_state(step=1)
    s2, _ = _tiny_state(step=12)
    save_checkpoint(d, s1)
    save_checkpoint(d, s2)
    assert len(find_checkpoints(d)) == 2
    fresh, _ = _tiny_state(0)
    restored, _ = auto_resume(d, fresh)
    assert int(restored.step) == 12


def test_reset_training_state(tmp_path):
    d = str(tmp_path)
    state, _ = _tiny_state(step=9)
    save_checkpoint(d, state)
    fresh, _ = _tiny_state(step=0)
    restored, _ = auto_resume(d, fresh, reset_training_state=True)
    assert int(restored.step) == 0  # optimizer/step fresh
    np.testing.assert_array_equal(
        np.asarray(restored.params["params"]["dense"]["kernel"]),
        np.asarray(state.params["params"]["dense"]["kernel"]))


def test_restore_params_only(tmp_path):
    d = str(tmp_path)
    state, _ = _tiny_state(step=3)
    path = save_checkpoint(d, state)
    params = restore_params(path, state.params)
    np.testing.assert_array_equal(
        np.asarray(params["params"]["dense"]["bias"]),
        np.asarray(state.params["params"]["dense"]["bias"]))


def test_no_checkpoint_returns_none(tmp_path):
    fresh, _ = _tiny_state(0)
    state, path = auto_resume(str(tmp_path / "empty"), fresh)
    assert path is None
    assert int(state.step) == 0
