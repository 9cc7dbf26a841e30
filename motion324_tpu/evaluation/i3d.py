"""I3D (Inflated 3D Inception-V1) video feature extractor for FVD, in flax.

The reference computes FVD with the StyleGAN-V torchscript I3D
(reference: evaluation/fvd/styleganv/fvd.py:9-18, calculate_fvd.py:15-80):
224^2 center-cropped clips -> 400-d logits -> Frechet distance. This module
implements the same architecture (Carreira & Zisserman 2017: InceptionV1
inflated to 3D, BN eps 1e-3, same-padded convs, Mixed_3b..Mixed_5c inception
blocks, global avg-pool + 1x1x1 logits conv) natively so the whole metric
stack runs on TPU; ``I3D_CHANNELS`` documents the canonical channel plan the
weight converter maps onto.

Without converted weights the extractor is still a deterministic video
embedding, enough for relative FVD regressions in CI.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = ["I3D", "i3d_feature_fn", "I3D_CHANNELS"]

# inception branch channel plan (out1x1, red3x3, out3x3, red5x5_as3x3,
# out5x5_as3x3, pool_proj) per mixed block — InceptionV1 table
I3D_CHANNELS = {
    "Mixed_3b": (64, 96, 128, 16, 32, 32),
    "Mixed_3c": (128, 128, 192, 32, 96, 64),
    "Mixed_4b": (192, 96, 208, 16, 48, 64),
    "Mixed_4c": (160, 112, 224, 24, 64, 64),
    "Mixed_4d": (128, 128, 256, 24, 64, 64),
    "Mixed_4e": (112, 144, 288, 32, 64, 64),
    "Mixed_4f": (256, 160, 320, 32, 128, 128),
    "Mixed_5b": (256, 160, 320, 32, 128, 128),
    "Mixed_5c": (384, 192, 384, 48, 128, 128),
}


class _Unit3D(nn.Module):
    """Conv3D + BatchNorm(eval) + ReLU, SAME padding (I3D's basic unit)."""

    features: int
    kernel: Sequence[int] = (1, 1, 1)
    stride: Sequence[int] = (1, 1, 1)
    use_bn: bool = True
    activation: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, tuple(self.kernel),
                    strides=tuple(self.stride), padding="SAME",
                    use_bias=not self.use_bn, dtype=self.dtype,
                    name="conv3d")(x)
        if self.use_bn:
            x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                             dtype=self.dtype, name="bn")(x)
        return nn.relu(x) if self.activation else x


class _Inception(nn.Module):
    channels: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.channels
        b0 = _Unit3D(c[0], name="b0")(x)
        b1 = _Unit3D(c[1], name="b1a")(x)
        b1 = _Unit3D(c[2], (3, 3, 3), name="b1b")(b1)
        b2 = _Unit3D(c[3], name="b2a")(x)
        b2 = _Unit3D(c[4], (3, 3, 3), name="b2b")(b2)
        b3 = nn.max_pool(x, (3, 3, 3), strides=(1, 1, 1), padding="SAME")
        b3 = _Unit3D(c[5], name="b3b")(b3)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class I3D(nn.Module):
    """(B, T, H, W, 3) in [-1, 1] -> (B, 400) logits (FVD features)."""

    num_classes: int = 400
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, video):
        x = video.astype(self.dtype)
        x = _Unit3D(64, (7, 7, 7), (2, 2, 2), name="Conv3d_1a_7x7")(x)
        x = nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2), padding="SAME")
        x = _Unit3D(64, name="Conv3d_2b_1x1")(x)
        x = _Unit3D(192, (3, 3, 3), name="Conv3d_2c_3x3")(x)
        x = nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2), padding="SAME")
        x = _Inception(I3D_CHANNELS["Mixed_3b"], name="Mixed_3b")(x)
        x = _Inception(I3D_CHANNELS["Mixed_3c"], name="Mixed_3c")(x)
        x = nn.max_pool(x, (3, 3, 3), strides=(2, 2, 2), padding="SAME")
        for k in ("Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e", "Mixed_4f"):
            x = _Inception(I3D_CHANNELS[k], name=k)(x)
        x = nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2), padding="SAME")
        x = _Inception(I3D_CHANNELS["Mixed_5b"], name="Mixed_5b")(x)
        x = _Inception(I3D_CHANNELS["Mixed_5c"], name="Mixed_5c")(x)
        x = jnp.mean(x, axis=(1, 2, 3))  # global spatio-temporal avg pool
        x = x[:, None, None, None, :]
        x = _Unit3D(self.num_classes, use_bn=False, activation=False,
                    name="logits")(x)
        return x[:, 0, 0, 0, :]


def i3d_feature_fn(params=None, model: I3D | None = None, size: int = 224,
                   seed: int = 0):
    """Build a ``feature_fn`` for :func:`compute_fvd` (reference protocol:
    224^2 center crop, [-1, 1] scaling — calculate_fvd.py:30-52)."""
    model = model or I3D()
    if params is None:
        x = jnp.zeros((1, 8, size, size, 3))
        params = jax.jit(model.init)(jax.random.PRNGKey(seed), x)

    apply = jax.jit(lambda p, v: model.apply(p, v))

    def feature_fn(video: np.ndarray) -> np.ndarray:
        """(T, H, W, 3) in [0, 1] -> (400,) feature vector."""
        import cv2
        v = np.stack([cv2.resize(f, (size, size),
                                 interpolation=cv2.INTER_AREA)
                      for f in np.asarray(video, np.float32)])
        v = v * 2.0 - 1.0
        return np.asarray(apply(params, jnp.asarray(v)[None]))[0]

    return feature_fn
