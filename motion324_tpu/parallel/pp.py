"""Pipeline parallelism (GPipe) over the alternating-stack layer axis.

Beyond the reference (which scales with single-axis DDP, reference:
setup.py:94-162): the motion model's alternating stack — where most trainable
FLOPs and parameters live — is split into ``pp`` contiguous stages, one per
device along the mesh's model axis. Activations rotate stage-to-stage over
ICI via ``lax.ppermute`` in a GPipe microbatch schedule
(:class:`motion324_tpu.models.motion_model._PipelineStageTick`); autodiff
transposes the rotation, so the backward pipeline falls out of ``jax.grad``.

TPU-native design notes:

- The stack's stacked-layer parameter axis (built by ``stack_blocks``) is
  simply SHARDED over the pipeline axis — ``shard_map`` hands each device its
  stage's slice, and the pipelined model (built with
  ``pp_size = axis size``) applies a stage-local scan with the identical
  ``alternating_blocks/layers/block`` scope. No weight repacking.
- Compute outside the stack is replicated across stages. Correct gradients
  without bookkeeping: the LOSS is counted only on the last stage (masked to
  zero elsewhere), so each parameter's gradient appears exactly on the
  stage(s) whose compute carries a nonzero gradient path — upstream encoders
  on stage 0 (the only stage whose pipeline input has a gradient), decoder/
  head on the last stage, and shared leaves (e.g. point embedders feeding
  both the shape encoder and the decoder) as two partial contributions —
  and one ``lax.psum`` over the axis recombines all of them.
- Stack-parameter gradients stay stage-local (each device holds different
  layers); the global gradient norm sums a psum'd stage-local sum-of-squares
  with the replicated remainder.
"""

from __future__ import annotations

from jax.sharding import PartitionSpec as P

__all__ = ["STACK_SCOPE", "is_stack_path", "pp_spec_for"]

# flax scope name of the pipelined stack inside MotionLatentModel
STACK_SCOPE = "alternating_blocks"


def is_stack_path(path) -> bool:
    """True if a tree_map_with_path key path addresses a stacked-layer leaf."""
    return any(STACK_SCOPE in str(k) for k in path)


def pp_spec_for(path, leaf, axis: str = "mp") -> P:
    """PartitionSpec for a TrainState leaf: stacked-layer leaves shard their
    leading (layer) axis over the pipeline axis, everything else replicates.
    Optimizer-state leaves mirror the param tree, so the same rule applies."""
    if is_stack_path(path) and getattr(leaf, "ndim", 0) >= 1:
        return P(axis)
    return P()
