"""Experiment logging: timestamped console prints + JSONL metrics.

Capability parity with the reference's observability stack (reference:
setup.py:35-49 rank-0 print muting with timestamps; train.py:222-252 per-step
scalar logging to wandb). wandb is not assumed installed: metrics stream to a
JSONL file any dashboard can tail, and to wandb when available.
"""

from __future__ import annotations

import datetime
import json
import os
import time
from typing import Any, Mapping

__all__ = ["MetricsLogger", "RunningStats", "log", "is_main_process"]


def is_main_process() -> bool:
    import jax
    return jax.process_index() == 0


def log(*args, force: bool = False) -> None:
    """Timestamped print on process 0 only (reference setup.py:35-49)."""
    if force or is_main_process():
        now = datetime.datetime.now().strftime("[%Y-%m-%d %H:%M:%S]")
        print(now, *args, flush=True)


class RunningStats:
    """Streaming count/sum/mean/min/max accumulator (reference
    scripts/hy3dgen/texgen/utils/counter_utils.py:16-48)."""

    def __init__(self) -> None:
        self.count = 0
        self.sum = 0.0
        self.mean = 0.0
        self.min: float | None = None
        self.max: float | None = None

    def add_value(self, value) -> None:
        value = float(value)
        self.count += 1
        self.sum += value
        self.mean = self.sum / self.count
        self.min = value if self.min is None else min(self.min, value)
        self.max = value if self.max is None else max(self.max, value)

    def get_count(self):
        return self.count

    def get_sum(self):
        return self.sum

    def get_mean(self):
        return self.mean

    def get_min(self):
        return self.min

    def get_max(self):
        return self.max


class MetricsLogger:
    """Appends one JSON object per step to ``<dir>/metrics.jsonl``; mirrors to
    wandb when importable and configured."""

    def __init__(self, out_dir: str, config: Mapping[str, Any] | None = None,
                 use_wandb: bool = False, project: str | None = None,
                 run_name: str | None = None):
        os.makedirs(out_dir, exist_ok=True)
        self.path = os.path.join(out_dir, "metrics.jsonl")
        self._file = open(self.path, "a")
        self._wandb = None
        if use_wandb:
            try:
                import wandb
                self._wandb = wandb.init(project=project, name=run_name,
                                         config=dict(config or {}))
            except Exception as e:  # wandb genuinely optional
                log(f"wandb unavailable ({e!r}); JSONL logging only")

    def log(self, metrics: Mapping[str, Any], step: int) -> None:
        rec = {"step": int(step), "time": time.time()}
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = v
        self._file.write(json.dumps(rec) + "\n")
        self._file.flush()
        if self._wandb is not None:
            self._wandb.log(dict(metrics), step=step)

    def close(self) -> None:
        self._file.close()
        if self._wandb is not None:
            self._wandb.finish()
