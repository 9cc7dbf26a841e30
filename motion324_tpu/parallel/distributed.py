"""Multi-host initialisation + cross-host batch assembly.

The reference initialises a NCCL process group per rank from torchrun/SLURM
env vars (reference: setup.py:94-162). The TPU-native equivalent:

- ``init_distributed()`` calls ``jax.distributed.initialize()`` — on TPU pods
  the coordinator is auto-discovered; elsewhere it reads the standard env vars
  (``JAX_COORDINATOR_ADDRESS``/``JAX_NUM_PROCESSES``/``JAX_PROCESS_ID``, or
  their ``MOTION324_*`` aliases) and is a no-op for single-process runs;
- per-process seeds are offset by the process index (reference setup.py:125);
- ``global_batch_from_local()`` assembles a global sharded array from each
  host's local shard (``jax.make_array_from_process_local_data``) — the
  multi-host analogue of ``DistributedSampler`` + per-rank ``device_put``.
"""

from __future__ import annotations

import os

import jax

__all__ = ["init_distributed", "global_batch_from_local", "process_seed"]


def _env(*names, default=None):
    for n in names:
        v = os.environ.get(n)
        if v is not None:
            return v
    return default


def init_distributed() -> tuple[int, int]:
    """Initialise multi-host JAX when configured; returns
    ``(process_index, process_count)``.

    Single-process runs (no coordinator configured, not a TPU pod) return
    ``(0, 1)`` without touching ``jax.distributed``.
    """
    if jax.process_count() > 1:  # already initialised (e.g. by the launcher)
        return jax.process_index(), jax.process_count()
    coord = _env("JAX_COORDINATOR_ADDRESS", "MOTION324_COORDINATOR")
    nproc = _env("JAX_NUM_PROCESSES", "MOTION324_NUM_PROCESSES")
    pid = _env("JAX_PROCESS_ID", "MOTION324_PROCESS_ID")
    if coord and nproc is not None and pid is not None:
        jax.distributed.initialize(coordinator_address=coord,
                                   num_processes=int(nproc),
                                   process_id=int(pid))
    elif _env("TPU_WORKER_HOSTNAMES") and _env("TPU_WORKER_ID") is not None:
        jax.distributed.initialize()  # TPU pod: auto-discovery
    return jax.process_index(), jax.process_count()


def process_seed(base_seed: int) -> int:
    """Per-process seed = base + process index (reference setup.py:125)."""
    return int(base_seed) + jax.process_index()


def global_batch_from_local(local_batch, sharding):
    """Host-local batch pytree -> globally sharded arrays.

    Each process provides its share of the global batch (leading axis =
    ``global_batch / process_count``); the result behaves like one global
    array sharded over the mesh, exactly what the sharded train step expects.
    """
    if jax.process_count() == 1:
        return jax.device_put(local_batch, sharding)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, x),
        local_batch)
