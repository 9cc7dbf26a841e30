"""Device mesh construction and sharding helpers.

The reference scales with single-axis NCCL data parallelism (reference:
setup.py:94-162, train.py:88-89). Here the equivalent is a
``jax.sharding.Mesh`` with axes ``('dp', 'mp')``:

- ``dp``: data parallel — batch sharded, gradients reduced over ICI by
  ``lax.pmean`` inside ``shard_map`` (the GSPMD analogue of DDP all-reduce);
- ``mp``: model/tensor parallel axis, reserved for sharding long-context
  attention and large generative models; size 1 reproduces the reference's
  topology.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "batch_sharding", "replicate", "local_batch_size"]


def make_mesh(dp: int = -1, mp: int = 1, devices=None) -> Mesh:
    """Build a ``(dp, mp)`` mesh over the given (default: all) devices.

    ``dp=-1`` consumes all devices not used by ``mp``.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if dp == -1:
        if n % mp:
            raise ValueError(f"{n} devices not divisible by mp={mp}")
        dp = n // mp
    if dp * mp != n:
        raise ValueError(f"dp*mp = {dp}*{mp} != {n} devices")
    arr = np.asarray(devices).reshape(dp, mp)
    return Mesh(arr, ("dp", "mp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis data-parallel sharding for host->device batch transfer."""
    return NamedSharding(mesh, P("dp"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    dp = mesh.shape["dp"]
    if global_batch % dp:
        raise ValueError(f"global batch {global_batch} not divisible by dp={dp}")
    return global_batch // dp
