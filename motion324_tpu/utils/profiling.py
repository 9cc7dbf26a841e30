"""Profiling & tracing: env-gated phase timers + jax.profiler traces.

Capability parity with the reference's instrumentation (reference:
scripts/hy3dgen/shapegen/utils.py:38-86 ``synchronize_timer``, gated by
``HY3DGEN_DEBUG=1``; train.py:136 per-step iter timing). The TPU analogue of
CUDA-event timing is ``block_until_ready`` around the timed region; deep
profiling uses ``jax.profiler.trace`` writing TensorBoard-compatible traces.

Enable with ``MOTION324_DEBUG=1``; set ``MOTION324_TRACE_DIR`` to also capture
an XLA trace around each timed region.
"""

from __future__ import annotations

import contextlib
import functools
import os
import time

__all__ = ["phase_timer", "timed", "profile_trace"]

_ENABLED = os.environ.get("MOTION324_DEBUG", "0") == "1"
_TRACE_DIR = os.environ.get("MOTION324_TRACE_DIR")


@contextlib.contextmanager
def phase_timer(name: str, sync=None):
    """Context manager: wall-time a phase (device-synchronised when ``sync``
    arrays are given), print when MOTION324_DEBUG=1. Usable as a decorator
    via :func:`timed`."""
    if not _ENABLED:
        yield
        return
    import jax
    t0 = time.perf_counter()
    if _TRACE_DIR:
        ctx = jax.profiler.trace(_TRACE_DIR)
        ctx.__enter__()
    try:
        yield
    finally:
        if sync is not None:
            jax.block_until_ready(sync)
        if _TRACE_DIR:
            ctx.__exit__(None, None, None)
        print(f"[motion324 timer] {name}: "
              f"{(time.perf_counter() - t0) * 1000:.1f} ms", flush=True)


def timed(name: str):
    """Decorator form of :func:`phase_timer` (blocks on the return value)."""

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            if not _ENABLED:
                return fn(*args, **kwargs)
            import jax
            t0 = time.perf_counter()
            out = fn(*args, **kwargs)
            jax.block_until_ready(out)
            print(f"[motion324 timer] {name}: "
                  f"{(time.perf_counter() - t0) * 1000:.1f} ms", flush=True)
            return out

        return wrapper

    return deco


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Explicit jax.profiler trace capture (TensorBoard format)."""
    import jax
    with jax.profiler.trace(log_dir):
        yield
