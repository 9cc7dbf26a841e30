"""Optimizer and LR schedule factory.

Reproduces the reference recipe (reference: utils/training_utils.py:38-82):
- AdamW with decay/no-decay split — parameters with fewer than 2 dims (norm
  scales, biases) are exempt from weight decay;
- frozen parameter groups (the DINOv2 image encoder) receive no updates and
  hold no optimizer state;
- cosine schedule with linear warmup (HF ``get_cosine_schedule_with_warmup``
  semantics: linear 0->peak over ``warmup`` steps, cosine peak->0 over the
  remaining ``train_steps - warmup``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

__all__ = ["create_optimizer", "create_lr_schedule", "decay_mask", "frozen_mask"]

FROZEN_PREFIXES = ("image_encoder",)


def _path_has_prefix(path) -> bool:
    return any(getattr(k, "key", getattr(k, "name", None)) in FROZEN_PREFIXES
               for k in path)


def frozen_mask(params):
    """True for trainable leaves, False for frozen (image encoder) leaves."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: not _path_has_prefix(path), params)


_NO_DECAY_LEAVES = {"scale", "bias", "weight"}  # LayerNorm/RMSNorm/biases


def decay_mask(params):
    """True for leaves that receive weight decay.

    The reference exempts 1-D params — exactly the norm scales and biases
    (utils/training_utils.py:38-71). With scan-stacked layers those leaves
    gain a leading layer axis, so the exemption keys on the leaf NAME
    (kernel/embeddings decay; scale/bias/weight do not).
    """
    def leaf_name(path):
        k = path[-1]
        return getattr(k, "key", getattr(k, "name", str(k)))

    return jax.tree_util.tree_map_with_path(
        lambda path, p: leaf_name(path) not in _NO_DECAY_LEAVES
        and not _path_has_prefix(path), params)


def create_lr_schedule(lr: float, warmup: int, train_steps: int):
    warmup = max(int(warmup), 0)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(warmup, 1)
        progress = (step - warmup) / jnp.maximum(train_steps - warmup, 1)
        progress = jnp.clip(progress, 0.0, 1.0)
        cos = 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
        return lr * jnp.where(step < warmup, warm, cos)

    return schedule


def create_optimizer(cfg, params=None):
    """Build the optax transform and schedule from ``cfg.training``.

    Gradient clipping happens in the train step (the spike-skip logic needs the
    pre-clip global norm — reference train.py:195-201), so it is not part of
    this chain.
    """
    t = cfg.training
    schedule = create_lr_schedule(t.lr, t.warmup, t.train_steps)
    adamw = optax.adamw(
        learning_rate=schedule,
        b1=t.get("beta1", 0.9),
        b2=t.get("beta2", 0.95),
        weight_decay=t.get("weight_decay", 0.05),
        mask=decay_mask,
    )
    tx = optax.multi_transform(
        {"train": adamw, "frozen": optax.set_to_zero()},
        lambda params: jax.tree_util.tree_map_with_path(
            lambda path, _: "frozen" if _path_has_prefix(path) else "train", params),
    )
    return tx, schedule
