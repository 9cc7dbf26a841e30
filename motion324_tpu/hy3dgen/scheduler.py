"""Flow-matching Euler scheduler (functional).

Reproduces the reference's reversed-timestep flow matching (reference:
scripts/hy3dgen/shapegen/schedulers.py:81-321 and pipelines.py:718-758):
the pipeline passes ``sigmas = linspace(0, 1, steps)``, a shift transform
``s' = shift * s / (1 + (shift - 1) * s)`` is applied, a terminal 1.0 is
appended, and each Euler step is ``x <- x + (sigma_next - sigma) * v``.
State-free: just arrays + a step function (jit/scan friendly).
"""

from __future__ import annotations

import numpy as np

__all__ = ["flow_match_sigmas", "euler_step", "scale_noise"]


def flow_match_sigmas(num_steps: int, shift: float = 1.0) -> np.ndarray:
    """Sigma ladder of length ``num_steps + 1`` (terminal 1.0 appended)."""
    sigmas = np.linspace(0.0, 1.0, num_steps, dtype=np.float32)
    if shift != 1.0:
        sigmas = shift * sigmas / (1 + (shift - 1) * sigmas)
    return np.concatenate([sigmas, np.ones(1, np.float32)])


def euler_step(sample, velocity, sigma, sigma_next):
    """One Euler step of the probability-flow ODE (schedulers.py:305-307)."""
    return sample + (sigma_next - sigma) * velocity


def scale_noise(sample, noise, sigma):
    """Forward interpolation ``sigma * noise + (1 - sigma) * sample``
    (schedulers.py:127-173)."""
    return sigma * noise + (1.0 - sigma) * sample
