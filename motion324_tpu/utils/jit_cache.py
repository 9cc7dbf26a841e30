"""Persistent XLA compilation cache.

First-run jit compiles of the full-size models take minutes (especially over
a tunneled TPU); the persistent cache brings repeat CLI invocations down to
seconds. Enabled by every product entry point; set ``MOTION324_JIT_CACHE`` to
relocate it or ``MOTION324_JIT_CACHE=0`` to disable.
"""

from __future__ import annotations

import os

__all__ = ["enable_compilation_cache"]

_DEFAULT = os.path.expanduser("~/.cache/motion324_tpu/jit")


def enable_compilation_cache(path: str | None = None) -> str | None:
    env = os.environ.get("MOTION324_JIT_CACHE")
    if env == "0":
        return None
    # the axon (tunneled-TPU) AOT compile service deadlocks with the
    # persistent cache on large programs; only enable on direct backends
    if "axon" in os.environ.get("JAX_PLATFORMS", "").lower() \
            or os.environ.get("PALLAS_AXON_TPU_GEN"):
        return None
    path = path or env or _DEFAULT
    os.makedirs(path, exist_ok=True)
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        return None
    return path
