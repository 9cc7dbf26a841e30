"""Training losses (reference: model/loss.py:6-66 — weighted coordinate MSE)."""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["coord_mse_loss"]


def coord_mse_loss(pred, target, weight: float = 1.0):
    """Weighted mean-squared error over (B, T, N, 3) trajectories.

    Returns ``(loss, metrics)`` where ``metrics['xyz_loss']`` is the unweighted
    MSE (reference logs both; they coincide at the default weight 1.0).
    """
    if pred.shape != target.shape or pred.ndim != 4:
        raise ValueError(f"expected matching (B,T,N,C) shapes, got {pred.shape} "
                         f"vs {target.shape}")
    mse = jnp.mean((pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)
    loss = weight * mse
    return loss, {"loss": loss, "xyz_loss": mse}
