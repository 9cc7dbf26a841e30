"""Training orchestration loop.

The TPU-native counterpart of the reference's ``train.py`` script (reference:
train.py:29-273): config -> mesh -> model -> optimizer -> auto-resume -> loop
{batch -> sharded step -> log -> periodic checkpoint}. All failure-handling
(NaN skip, spike skip) lives inside the compiled step
(:mod:`motion324_tpu.training.train_step`); the host loop only moves data and
records metrics.
"""

from __future__ import annotations

import os
import shutil
import time

import jax
import numpy as np

from motion324_tpu.models.motion_model import ModelConfig, MotionLatentModel
from motion324_tpu.parallel.mesh import batch_sharding, make_mesh
from motion324_tpu.training.checkpoints import auto_resume, save_checkpoint
from motion324_tpu.training.optimizer import create_optimizer
from motion324_tpu.training.train_step import TrainState, build_train_step
from motion324_tpu.utils.logging import MetricsLogger, log

__all__ = ["Trainer", "backup_source"]


def backup_source(checkpoint_dir: str, repo_root: str = ".",
                  max_bytes: int = 20 * 1024 * 1024) -> None:
    """Copy .py/.yaml source into ``checkpoint_dir/src`` for provenance
    (reference: setup.py:164-259, capped at 20 MB)."""
    dst_root = os.path.join(checkpoint_dir, "src")
    total = 0
    for dirpath, dirnames, filenames in os.walk(repo_root):
        dirnames[:] = [d for d in dirnames
                       if d not in {".git", "__pycache__", "experiments",
                                    ".pytest_cache"}]
        for fn in filenames:
            if not fn.endswith((".py", ".yaml", ".sh")):
                continue
            src = os.path.join(dirpath, fn)
            size = os.path.getsize(src)
            if total + size > max_bytes:
                return
            rel = os.path.relpath(src, repo_root)
            dst = os.path.join(dst_root, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            shutil.copy2(src, dst)
            total += size


class Trainer:
    """Drives training from a config and a batch iterator.

    ``data_iter`` yields host-side dict batches with leading axis
    ``grad_accum_steps * dp * batch_size_per_device`` (flat; the trainer
    reshapes for accumulation).
    """

    def __init__(self, cfg, data_iter, model: MotionLatentModel | None = None,
                 mesh=None):
        self.cfg = cfg
        self.data_iter = data_iter
        self.mesh = mesh if mesh is not None else make_mesh(
            cfg.get_path("mesh.dp", -1), cfg.get_path("mesh.mp", 1))
        # training.parallel_mode selects the step builder: 'shard_map'
        # (default, DDP analogue), 'gspmd' (tensor parallel over mp), or
        # 'pp' (GPipe over mp) — see build_train_step. For 'pp' the model
        # must carry the stage fields, so it is derived here when the
        # trainer builds the model itself.
        self.mode = str(cfg.training.get("parallel_mode", "shard_map"))
        if self.mode not in ("shard_map", "gspmd", "pp"):
            raise ValueError(
                f"training.parallel_mode={self.mode!r} is not one of "
                "'shard_map', 'gspmd', 'pp'")
        self.accum = int(cfg.training.get("grad_accum_steps", 1))
        if self.mode != "shard_map" and self.accum > 1:
            raise ValueError(
                f"training.parallel_mode={self.mode!r} does not implement "
                "micro-batch accumulation; set training.grad_accum_steps=1")
        if model is not None:
            self.model = model
        else:
            mcfg = ModelConfig.from_config(cfg)
            if self.mode == "pp":
                import dataclasses
                mcfg = dataclasses.replace(
                    mcfg, pp_axis="mp", pp_size=int(self.mesh.shape["mp"]),
                    pp_microbatches=int(
                        cfg.training.get("pp_microbatches", 1)))
            self.model = MotionLatentModel(mcfg)
        self.ckpt_dir = cfg.training.checkpoint_dir
        self.rng = jax.random.PRNGKey(cfg.training.get("seed", 0))

        tx, self.schedule = create_optimizer(cfg)
        self.tx = tx
        self.step_fn = build_train_step(self.model, tx, cfg, self.mesh,
                                        mode=self.mode)
        self._sharding = batch_sharding(self.mesh)

    def init_state(self, example_batch) -> TrainState:
        # a pp-staged model calls lax.axis_index in __call__, which only
        # exists under shard_map — initialise with a plain twin (identical
        # param tree: pp shards the already-stacked layer axis at runtime)
        model = self.model
        if getattr(model.cfg, "pp_axis", None):
            import dataclasses
            model = MotionLatentModel(dataclasses.replace(
                model.cfg, pp_axis=None, pp_size=1, pp_microbatches=1))
        params = jax.jit(model.init)(jax.random.PRNGKey(
            self.cfg.training.get("seed", 0) + 1), example_batch)
        n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
        log(f"model initialised: {n_params/1e6:.2f}M params")
        return TrainState.create(params, self.tx)

    @staticmethod
    def _arrays_only(batch):
        """Drop metadata leaves (e.g. the dataset's ``obj_name`` strings)
        before anything jitted sees the batch."""
        return {k: v for k, v in batch.items()
                if isinstance(v, (np.ndarray, jax.Array))}

    def _put(self, batch):
        """Host batch -> globally sharded device arrays (multi-host aware:
        each process contributes its local shard of the global batch)."""
        from motion324_tpu.parallel.distributed import global_batch_from_local
        batch = self._arrays_only(batch)
        if self.accum > 1:
            batch = jax.tree.map(
                lambda x: x.reshape(self.accum, x.shape[0] // self.accum,
                                    *x.shape[1:]), batch)
            spec = jax.sharding.PartitionSpec(None, "dp")
            sharding = jax.sharding.NamedSharding(self.mesh, spec)
        else:
            sharding = self._sharding
        return global_batch_from_local(batch, sharding)

    def train(self, state: TrainState | None = None, max_steps: int | None = None):
        t = self.cfg.training
        stop = int(max_steps if max_steps is not None
                   else t.get("stop_steps", t.train_steps))
        it = iter(self.data_iter)
        first = next(it)
        if state is None:
            state = self.init_state(self._example(first))
            state, resumed = auto_resume(self.ckpt_dir, state)
            if resumed:
                log(f"resumed from {resumed} at step {int(state.step)}")
        # gspmd/pp steps publish their parameter shardings; place the state
        # accordingly (layer-axis over stages for pp, TP shards for gspmd)
        shard_of = getattr(self.step_fn, "state_shardings", None)
        if shard_of is not None:
            state = jax.device_put(state, shard_of(state))

        os.makedirs(self.ckpt_dir, exist_ok=True)
        if jax.process_index() == 0:
            backup_source(self.ckpt_dir)
        logger = MetricsLogger(self.ckpt_dir, config=self.cfg.to_dict())

        step = int(state.step)
        batch = self._put(first)
        last_t = time.perf_counter()
        while step < stop:
            state, metrics = self.step_fn(state, batch, self.rng)
            step += 1
            try:
                nxt = next(it)  # overlap host fetch with device compute
            except StopIteration:
                it = iter(self.data_iter)
                nxt = next(it)
            # issue the H2D transfer BEFORE the metrics sync below blocks on
            # the running step: batch k+1 DMAs while step k computes
            batch = self._put(nxt)
            if step % t.get("log_every", 1) == 0:
                now = time.perf_counter()
                metrics = {k: float(v) for k, v in metrics.items()}
                metrics["iter_time"] = now - last_t
                metrics["lr"] = float(self.schedule(step))
                last_t = now
                logger.log(metrics, step)
                if step % t.get("print_every", 20) == 0:
                    log(f"step {step}: loss={metrics['loss']:.6f} "
                        f"grad_norm={metrics['grad_norm']:.4f} "
                        f"lr={metrics['lr']:.2e} "
                        f"iter={metrics['iter_time']*1000:.0f}ms")
            if step % t.get("checkpoint_every", 10000) == 0 or step == stop:
                path = save_checkpoint(self.ckpt_dir, state)
                log(f"saved checkpoint {path}")
        logger.close()
        return state

    def _example(self, batch):
        batch = self._arrays_only(batch)
        if self.accum > 1:
            return jax.tree.map(
                lambda x: x[: x.shape[0] // self.accum], batch)
        return batch
