"""Sharded training step: shard_map over the data-parallel mesh axis.

The GSPMD analogue of the reference's DDP loop (reference: train.py:135-269):

- batch sharded over ``dp``; each device computes grads on its local shard and
  participates in a ``lax.pmean`` over ICI (= DDP all-reduce);
- coordinated NaN skip: the pmean'd loss is global, so a NaN anywhere makes
  every device skip the same step — the collective equivalent of the
  all_reduce(MAX) NaN vote (reference: utils/training_utils.py:158-219);
- gradient hygiene: per-leaf ``nan_to_num(0, ±1e-6)`` (reference train.py:183);
- clip to ``grad_clip_norm`` and skip the update entirely when the pre-clip
  global norm exceeds ``allowed_gradnorm_factor`` x clip (reference
  train.py:195-201);
- gradient accumulation via ``lax.scan`` over a leading microbatch axis
  (reference train.py:157-166 no_sync accumulation).

Everything is one compiled program per step; no host round-trips.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import PartitionSpec as P

from motion324_tpu.training.loss import coord_mse_loss

__all__ = ["TrainState", "build_train_step"]


class TrainState(struct.PyTreeNode):
    """``step`` counts forward/backward passes (advances every iteration);
    ``update_step`` counts applied parameter updates only (frozen on NaN/spike
    skips) — the reference tracks both separately as ``fwdbwd_pass_step`` /
    ``param_update_step`` (reference: train.py:254-269)."""

    step: jax.Array
    update_step: jax.Array
    params: Any
    opt_state: Any

    @classmethod
    def create(cls, params, tx):
        """``params`` is the full flax variable dict (``{'params': ...}``);
        optimizer state mirrors that tree so grads line up 1:1."""
        return cls(step=jnp.zeros((), jnp.int32),
                   update_step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params))


def _tree_select(pred, a, b):
    return jax.tree.map(lambda x, y: jnp.where(pred, x, y), a, b)


def build_train_step(model, tx, cfg, mesh,
                     loss_fn: Callable | None = None,
                     mode: str = "shard_map"):
    """Returns ``step_fn(state, batch, rng) -> (state, metrics)`` (jitted).

    ``batch`` is a global array pytree with leading axis
    ``grad_accum_steps * global_batch`` (sharded over dp by the caller via
    ``parallel.batch_sharding``).

    ``mode``:
      - ``'shard_map'`` (default): explicit per-device step with ``lax.pmean``
        over ``dp`` — the direct DDP analogue; ``mp`` must be 1.
      - ``'gspmd'``: one global program under ``jax.jit`` with tensor-parallel
        parameter shardings over ``mp`` (:mod:`motion324_tpu.parallel.tp`) and
        the batch over ``dp``; the GSPMD partitioner inserts all collectives.
        Identical semantics (global NaN/spike skip falls out of the single
        global loss).
      - ``'pp'``: GPipe pipeline parallelism over ``mp``
        (:mod:`motion324_tpu.parallel.pp`) — the model must be built with
        ``pp_axis='mp'``/``pp_size=mesh.shape['mp']``; batch over ``dp``.
    """
    if mode in ("gspmd", "pp"):
        # neither alternative mode implements micro-batch accumulation, so a
        # configured grad_accum_dtype would be silently ignored — refuse it
        gad = str(cfg.training.get("grad_accum_dtype", "float32"))
        if gad != "float32":
            raise ValueError(
                f"training.grad_accum_dtype={gad!r} has no effect in "
                f"mode={mode!r} (only the default shard_map mode "
                "accumulates micro-batch gradients)")
    if mode == "gspmd":
        return _build_gspmd_step(model, tx, cfg, mesh, loss_fn)
    if mode == "pp":
        return _build_pp_step(model, tx, cfg, mesh, loss_fn)
    t = cfg.training
    clip = float(t.grad_clip_norm)
    spike = float(t.get("allowed_gradnorm_factor", 5)) * clip
    accum = int(t.get("grad_accum_steps", 1))
    weight = float(t.get("coord_mse_loss_weight", 1.0))
    # halve ICI gradient traffic by all-reducing in bf16 (the analogue of the
    # reference's AMP bf16 DDP buckets); off by default — numerics-identical
    # paths stay comparable in tests and single-chip runs see no traffic
    bf16_reduce = bool(t.get("bf16_grad_allreduce", False))
    # accumulate micro-batch grads in bf16: the f32 accumulator read-write is
    # ~1.2 GB of HBM traffic per micro at the dyscene shapes (the trace's
    # convert_reduce fusions); bf16 halves it. The convert the backward
    # already emits (params are f32, compute bf16) cancels against the
    # accumulator cast, so XLA adds bf16-to-bf16 directly. Summing `accum`
    # micros in bf16 costs <= log2(accum) of its 8 mantissa bits in relative
    # error (~1e-2 at accum 16) — well under gradient noise; the final
    # divide + optimizer update stay f32. Off by default (exact-parity runs).
    _gad = str(t.get("grad_accum_dtype", "float32"))
    if _gad not in ("float32", "bfloat16"):
        raise ValueError(
            "training.grad_accum_dtype must be 'float32' or 'bfloat16', "
            f"got {_gad!r}")
    accum_dtype = {"bfloat16": jnp.bfloat16, "float32": None}[_gad]

    if loss_fn is None:
        def loss_fn(params, batch, rng):
            pred = model.apply(params, batch, train=True,
                               rngs={"dropout": rng})
            return coord_mse_loss(pred, batch["point_clouds"], weight)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def device_step(state, batch, rng):
        rng = jax.random.fold_in(rng, jax.lax.axis_index("dp"))
        rng = jax.random.fold_in(rng, state.step)

        if accum > 1:
            # batch leaves: (accum, micro_b, ...)
            def body(carry, mb_rng):
                mb, r = mb_rng
                (loss, metrics), grads = grad_fn(state.params, mb, r)
                if accum_dtype is not None:
                    grads = jax.tree.map(
                        lambda g: g.astype(accum_dtype), grads)
                acc_loss, acc_metrics, acc_grads = carry
                return (acc_loss + loss,
                        jax.tree.map(jnp.add, acc_metrics, metrics),
                        jax.tree.map(jnp.add, acc_grads, grads)), None

            rngs = jax.random.split(rng, accum)
            zero = jnp.zeros((), jnp.float32)
            zero_g = jax.tree.map(
                lambda p: jnp.zeros(p.shape, accum_dtype or p.dtype),
                state.params)
            zero_m = {"loss": zero, "xyz_loss": zero}
            (loss, metrics, grads), _ = jax.lax.scan(
                body, (zero, zero_m, zero_g), (batch, rngs))
            loss = loss / accum
            metrics = jax.tree.map(lambda x: x / accum, metrics)
            grads = jax.tree.map(
                lambda g, p: g.astype(p.dtype) / accum, grads, state.params)
        else:
            (loss, metrics), grads = grad_fn(state.params, batch, rng)

        if bf16_reduce:
            dtypes = jax.tree.map(lambda g: g.dtype, grads)
            grads = jax.lax.pmean(
                jax.tree.map(lambda g: g.astype(jnp.bfloat16), grads), "dp")
            grads = jax.tree.map(lambda g, d: g.astype(d), grads, dtypes)
        else:
            grads = jax.lax.pmean(grads, "dp")
        loss = jax.lax.pmean(loss, "dp")
        metrics = jax.lax.pmean(metrics, "dp")

        grads = jax.tree.map(
            lambda g: jnp.nan_to_num(g, nan=0.0, posinf=1e-6, neginf=-1e-6),
            grads)
        gnorm = optax.global_norm(grads)
        ok = jnp.isfinite(loss) & (gnorm <= spike)

        scale = jnp.minimum(1.0, clip / (gnorm + 1e-6))
        clipped = jax.tree.map(lambda g: g * scale, grads)
        updates, new_opt = tx.update(clipped, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        new_state = state.replace(
            step=state.step + 1,
            update_step=state.update_step + ok.astype(jnp.int32),
            params=_tree_select(ok, new_params, state.params),
            opt_state=_tree_select(ok, new_opt, state.opt_state),
        )
        metrics = dict(metrics)
        metrics["grad_norm"] = gnorm
        metrics["skipped"] = 1.0 - ok.astype(jnp.float32)
        return new_state, metrics

    # batch layout: (global_b, ...) for accum=1, (accum, global_b, ...) otherwise
    batch_spec = P(None, "dp") if accum > 1 else P("dp")
    sharded = jax.shard_map(
        device_step, mesh=mesh,
        in_specs=(P(), batch_spec, P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=0)


def _build_pp_step(model, tx, cfg, mesh, loss_fn: Callable | None = None,
                   axis: str = "mp"):
    """Pipeline(+data)-parallel step (see :mod:`motion324_tpu.parallel.pp`).

    The alternating stack's layer axis is sharded over ``axis`` (stages);
    the batch over ``dp``. Loss is counted on the LAST stage only and grads
    recombined with one ``psum`` over the stages — stack-parameter grads stay
    stage-local. Grad accumulation is expressed by the pipeline's own
    microbatching (``pp_microbatches``), so ``grad_accum_steps`` must be 1.
    """
    from motion324_tpu.parallel.pp import is_stack_path, pp_spec_for

    t = cfg.training
    if int(t.get("grad_accum_steps", 1)) != 1:
        raise ValueError("pp mode expresses accumulation via pp_microbatches;"
                         " set grad_accum_steps=1")
    clip = float(t.grad_clip_norm)
    spike = float(t.get("allowed_gradnorm_factor", 5)) * clip
    weight = float(t.get("coord_mse_loss_weight", 1.0))
    n_stages = mesh.shape[axis]

    if loss_fn is None:
        def loss_fn(params, batch, rng):
            pred = model.apply(params, batch, train=True,
                               rngs={"dropout": rng})
            return coord_mse_loss(pred, batch["point_clouds"], weight)

    def masked_loss(params, batch, rng):
        # count the loss only on the last stage: every replicated compute
        # path then contributes its gradient exactly once (see pp.py).
        # Applied OUTSIDE the user loss_fn so caller-supplied losses get
        # the same guarantee — without it the psum over stages would scale
        # loss and replicated-path grads by n_stages.
        loss, metrics = loss_fn(params, batch, rng)
        mask = (jax.lax.axis_index(axis) == n_stages - 1).astype(jnp.float32)
        return loss * mask, jax.tree.map(lambda v: v * mask, metrics)

    grad_fn = jax.value_and_grad(masked_loss, has_aux=True)

    def device_step(state, batch, rng):
        rng = jax.random.fold_in(rng, jax.lax.axis_index("dp"))
        rng = jax.random.fold_in(rng, state.step)
        (loss, metrics), grads = grad_fn(state.params, batch, rng)
        loss = jax.lax.psum(loss, axis)
        metrics = jax.lax.psum(metrics, axis)
        # recombine: stage-local stack grads stay local, the rest psum over
        # stages (each path contributed on exactly one stage)
        grads = jax.tree_util.tree_map_with_path(
            lambda p, g: g if is_stack_path(p) else jax.lax.psum(g, axis),
            grads)
        grads = jax.lax.pmean(grads, "dp")
        loss = jax.lax.pmean(loss, "dp")
        metrics = jax.lax.pmean(metrics, "dp")

        grads = jax.tree.map(
            lambda g: jnp.nan_to_num(g, nan=0.0, posinf=1e-6, neginf=-1e-6),
            grads)
        # global norm: stack leaves differ per stage (psum their sumsq),
        # non-stack leaves are identical on every stage (count once)
        sq = jax.tree_util.tree_map_with_path(
            lambda p, g: (jnp.sum(g.astype(jnp.float32) ** 2), is_stack_path(p)),
            grads)
        leaves = jax.tree.leaves(sq, is_leaf=lambda x: isinstance(x, tuple))
        sum_stack = sum((s for s, st in leaves if st), jnp.zeros((), jnp.float32))
        sum_shared = sum((s for s, st in leaves if not st),
                         jnp.zeros((), jnp.float32))
        gnorm = jnp.sqrt(sum_shared + jax.lax.psum(sum_stack, axis))
        ok = jnp.isfinite(loss) & (gnorm <= spike)

        scale = jnp.minimum(1.0, clip / (gnorm + 1e-6))
        clipped = jax.tree.map(lambda g: g * scale, grads)
        updates, new_opt = tx.update(clipped, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            update_step=state.update_step + ok.astype(jnp.int32),
            params=_tree_select(ok, new_params, state.params),
            opt_state=_tree_select(ok, new_opt, state.opt_state),
        )
        metrics = dict(metrics)
        metrics["grad_norm"] = gnorm
        metrics["skipped"] = 1.0 - ok.astype(jnp.float32)
        return new_state, metrics

    def state_specs(state):
        return jax.tree_util.tree_map_with_path(
            lambda p, leaf: pp_spec_for(p, leaf, axis), state)

    cache: dict = {}

    def step_fn(state, batch, rng):
        key = jax.tree_util.tree_structure(state)
        if key not in cache:
            ss = state_specs(state)
            sharded = jax.shard_map(
                device_step, mesh=mesh,
                in_specs=(ss, P("dp"), P()),
                out_specs=(ss, P()),
                check_vma=False)
            cache[key] = jax.jit(sharded, donate_argnums=0)
        return cache[key](state, batch, rng)

    from jax.sharding import NamedSharding

    def state_shardings(state):
        return jax.tree.map(lambda s: NamedSharding(mesh, s),
                            state_specs(state))

    step_fn.state_shardings = state_shardings  # for device_put at init
    return step_fn


def _build_gspmd_step(model, tx, cfg, mesh, loss_fn: Callable | None = None):
    """Tensor+data-parallel step: params sharded over ``mp``, batch over
    ``dp``, collectives inserted by the GSPMD partitioner."""
    from jax.sharding import NamedSharding
    from motion324_tpu.parallel.tp import _spec_for

    t = cfg.training
    clip = float(t.grad_clip_norm)
    spike = float(t.get("allowed_gradnorm_factor", 5)) * clip
    weight = float(t.get("coord_mse_loss_weight", 1.0))

    if loss_fn is None:
        def loss_fn(params, batch, rng):
            pred = model.apply(params, batch, train=True,
                               rngs={"dropout": rng})
            return coord_mse_loss(pred, batch["point_clouds"], weight)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def step(state, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        (loss, metrics), grads = grad_fn(state.params, batch, rng)
        grads = jax.tree.map(
            lambda g: jnp.nan_to_num(g, nan=0.0, posinf=1e-6, neginf=-1e-6),
            grads)
        gnorm = optax.global_norm(grads)
        ok = jnp.isfinite(loss) & (gnorm <= spike)
        scale = jnp.minimum(1.0, clip / (gnorm + 1e-6))
        clipped = jax.tree.map(lambda g: g * scale, grads)
        updates, new_opt = tx.update(clipped, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            update_step=state.update_step + ok.astype(jnp.int32),
            params=_tree_select(ok, new_params, state.params),
            opt_state=_tree_select(ok, new_opt, state.opt_state),
        )
        metrics = dict(metrics)
        metrics["grad_norm"] = gnorm
        metrics["skipped"] = 1.0 - ok.astype(jnp.float32)
        return new_state, metrics

    def state_shardings(state):
        specs = jax.tree_util.tree_map_with_path(_spec_for, state)
        return jax.tree.map(lambda s: NamedSharding(mesh, s), specs)

    def make(state):
        """Bind shardings to a concrete state structure and jit."""
        ss = state_shardings(state)
        bs = NamedSharding(mesh, P("dp"))
        return jax.jit(step,
                       in_shardings=(ss, bs, NamedSharding(mesh, P())),
                       out_shardings=(ss, NamedSharding(mesh, P())),
                       donate_argnums=0)

    cache: dict = {}

    def step_fn(state, batch, rng):
        key = jax.tree_util.tree_structure(state)
        if key not in cache:
            cache[key] = make(state)
        return cache[key](state, batch, rng)

    step_fn.state_shardings = state_shardings  # for device_put at init
    return step_fn
