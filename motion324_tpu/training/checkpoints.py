"""Checkpoint save / auto-resume via Orbax.

Parity with the reference's checkpointing (reference: train.py:254-269,
utils/training_utils.py:86-155):

- rank-0-style periodic save of ``{params, opt_state, step}`` into
  ``ckpt_{step:016d}`` directories (same naming convention);
- auto-resume: scan the directory, restore the lexicographically-last
  checkpoint;
- ``reset_training_state``: restore params only, keep fresh optimizer/step
  (reference utils/training_utils.py:138-147);
- inference restore of params only (the reference deletes ``pos_embed`` from
  the state dict to allow frame-count changes — our pos-embed is a computed
  constant, so nothing needs deleting).
"""

from __future__ import annotations

import os
import re

import jax
import orbax.checkpoint as ocp

__all__ = ["save_checkpoint", "find_checkpoints", "latest_checkpoint",
           "auto_resume", "restore_params"]

_CKPT_RE = re.compile(r"^ckpt_(\d{16})$")


def save_checkpoint(ckpt_dir: str, state, *, async_save: bool = False) -> str:
    """Write ``state`` (TrainState or any pytree) to ``ckpt_dir/ckpt_{step}``.

    Named by ``update_step`` (applied parameter updates) when present, matching
    the reference's ``ckpt_{param_update_step:016d}.pt`` (train.py:254-269)."""
    step = int(getattr(state, "update_step", state.step))
    path = os.path.abspath(os.path.join(ckpt_dir, f"ckpt_{step:016d}"))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    return path


def find_checkpoints(ckpt_dir: str) -> list[str]:
    if not os.path.isdir(ckpt_dir):
        return []
    out = []
    for name in sorted(os.listdir(ckpt_dir)):
        if _CKPT_RE.match(name):
            out.append(os.path.join(ckpt_dir, name))
    return out

def latest_checkpoint(ckpt_dir: str) -> str | None:
    ckpts = find_checkpoints(ckpt_dir)
    return ckpts[-1] if ckpts else None


def _restore(path: str, template):
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), abstract)


def auto_resume(ckpt_dir: str, state, *, reset_training_state: bool = False):
    """Restore the latest checkpoint into ``state``'s structure, if any.

    Returns ``(state, resumed_path | None)``.
    """
    path = latest_checkpoint(ckpt_dir)
    if path is None:
        return state, None
    restored = _restore(path, state)
    if reset_training_state:
        state = state.replace(params=restored.params)
    else:
        state = restored
    return state, path


def restore_params(path: str, params_template):
    """Params-only restore for inference (loads the ``params`` sub-tree of a
    saved TrainState directory, or a bare params checkpoint)."""
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, params_template)
    ckptr = ocp.PyTreeCheckpointer()
    full = ckptr.restore(os.path.abspath(path))
    tree = full.get("params", full) if isinstance(full, dict) else full
    # re-dtype onto the template
    return jax.tree.map(lambda t, x: jax.numpy.asarray(x, t.dtype), abstract, tree)
