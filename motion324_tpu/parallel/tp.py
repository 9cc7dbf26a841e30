"""Tensor-parallel parameter shardings over the ``mp`` mesh axis (GSPMD).

The reference scales with data parallelism only (SURVEY §2.5); this module
takes the framework beyond it: transformer weight matrices are sharded over
``mp`` with `jax.sharding.NamedSharding` annotations and the GSPMD partitioner
inserts the all-reduces — no model-code changes, the TPU-native equivalent of
Megatron-style TP:

- fused QKV / q / k / v kernels: OUTPUT dim sharded (head parallel);
- attention output projection: INPUT dim sharded (partial sums -> all-reduce);
- MLP fc1: OUTPUT sharded; fc2: INPUT sharded;
- everything else (norms, embeddings, heads) replicated.

Used by ``build_train_step(..., mode='gspmd')`` and validated on the virtual
CPU mesh against the shard_map data-parallel step (tests/test_tp.py).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["tp_param_specs", "tp_shardings"]

# leaf-name rules: (param name, parent module hint) -> PartitionSpec factory.
# Specs are padded on the LEFT for stacked-layer leading axes.
_COL = {"to_qkv", "to_q", "to_k", "to_v", "fc1", "c_qkv", "c_q", "c_kv",
        "c_fc", "qkv", "linear1", "mlp_w12"}     # output-dim sharded
_ROW = {"fc", "fc2", "c_proj", "c_proj_mlp", "proj", "linear2", "mlp_w3"}
# 'fc' is the attention out-projection in this codebase; 'proj' DINO/DiT ones


def _spec_for(path, leaf) -> P:
    names = [getattr(k, "key", getattr(k, "name", str(k))) for k in path]
    if not names or names[-1] != "kernel" or leaf.ndim < 2:
        return P()
    parent = names[-2] if len(names) >= 2 else ""
    if parent in _COL:
        spec = [None] * leaf.ndim
        spec[-1] = "mp"
        return P(*spec)
    if parent in _ROW:
        spec = [None] * leaf.ndim
        spec[-2] = "mp"
        return P(*spec)
    return P()


def tp_param_specs(params) -> object:
    """Param pytree -> pytree of PartitionSpec with mp-sharded transformer
    weights (replicated elsewhere)."""
    return jax.tree_util.tree_map_with_path(_spec_for, params)


def tp_shardings(params, mesh: Mesh):
    """Param pytree -> pytree of NamedSharding over ``mesh``."""
    return jax.tree.map(lambda spec: NamedSharding(mesh, spec),
                        tp_param_specs(params))
