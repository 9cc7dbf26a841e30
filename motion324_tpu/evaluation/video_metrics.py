"""Video metrics: evaluation protocol, PSNR/SSIM, LPIPS (VGG), Fréchet/FVD.

Mirrors the reference's video evaluation stack (reference:
evaluation/evaluation.py:27-274, calculate_fvd.py:15-99,
calculate_lpips.py:139-202, lpips/ vendored package):

- protocol: resize to 512^2, reflect-pad to a minimum of 32 frames, split
  into 32-frame subvideos (evaluation.py:97-114);
- LPIPS: VGG16 feature stack with unit-normalised per-layer activations,
  input scaling layer, and 1x1 linear heads (lpips/lpips.py:22-180) — the
  architecture runs in flax; trained heads load through the torch converter;
- FVD: Fréchet distance between I3D feature distributions
  (calculate_fvd.py:75-90, scipy sqrtm); the feature extractor is pluggable;
- PSNR/SSIM as weight-free per-frame metrics.
"""

from __future__ import annotations

from typing import Any, Callable

import numpy as np

__all__ = ["prepare_video", "split_subvideos", "psnr", "ssim",
           "frechet_distance", "compute_fvd", "LPIPSVGG", "lpips_distance"]


# --------------------------------------------------------------------------- #
# protocol
# --------------------------------------------------------------------------- #
def prepare_video(frames: np.ndarray, size: int = 512,
                  min_frames: int = 32) -> np.ndarray:
    """(T, H, W, 3) [0,1] -> resized to ``size``^2, reflect-padded to
    >= ``min_frames`` (reference evaluation.py:97-106)."""
    import cv2
    out = np.stack([cv2.resize(f, (size, size), interpolation=cv2.INTER_AREA)
                    for f in frames])
    t = len(out)
    if t < min_frames:
        if t == 1:
            idx = np.zeros(min_frames, np.int64)
        else:
            period = 2 * t - 2
            idx = np.arange(min_frames) % period
            idx = np.where(idx < t, idx, period - idx)
        out = out[idx]
    return out.astype(np.float32)


def split_subvideos(frames: np.ndarray, length: int = 32,
                    verbose: bool = False) -> list[np.ndarray]:
    """Non-overlapping ``length``-frame subvideos.

    Protocol (reference evaluation.py:103-111): videos shorter than ``length``
    are padded by reflecting trailing frames until they reach ``length``;
    longer videos are cut into full ``length``-frame chunks and the tail
    remainder (< ``length`` frames) is dropped, exactly as the reference does.
    No resizing happens here — callers resize via :func:`prepare_video` first.
    """
    frames = np.asarray(frames)
    t = len(frames)
    while t < length:  # reflect-pad (repeat for very short clips)
        pad = frames[-min(length - t, max(t - 1, 1)):][::-1]
        frames = np.concatenate([frames, pad], axis=0)
        t = len(frames)
    n_full = t // length
    dropped = t - n_full * length
    if dropped and verbose:
        print(f"split_subvideos: dropping {dropped} tail frame(s) "
              f"(protocol keeps full {length}-frame chunks only)")
    return [frames[i * length:(i + 1) * length] for i in range(n_full)]


# --------------------------------------------------------------------------- #
# pixel metrics
# --------------------------------------------------------------------------- #
def psnr(a: np.ndarray, b: np.ndarray, data_range: float = 1.0) -> float:
    mse = float(np.mean((np.asarray(a, np.float64) - b) ** 2))
    if mse == 0:
        return float("inf")
    return float(10 * np.log10(data_range ** 2 / mse))


def ssim(a: np.ndarray, b: np.ndarray, data_range: float = 1.0,
         sigma: float = 1.5) -> float:
    """Mean SSIM with gaussian windows (channels averaged)."""
    from scipy.ndimage import gaussian_filter
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if a.ndim == 2:
        a, b = a[..., None], b[..., None]
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    vals = []
    for ch in range(a.shape[-1]):
        x, y = a[..., ch], b[..., ch]
        mx = gaussian_filter(x, sigma)
        my = gaussian_filter(y, sigma)
        mxx = gaussian_filter(x * x, sigma)
        myy = gaussian_filter(y * y, sigma)
        mxy = gaussian_filter(x * y, sigma)
        vx = mxx - mx * mx
        vy = myy - my * my
        cov = mxy - mx * my
        s = ((2 * mx * my + c1) * (2 * cov + c2)) / \
            ((mx ** 2 + my ** 2 + c1) * (vx + vy + c2))
        vals.append(s.mean())
    return float(np.mean(vals))


# --------------------------------------------------------------------------- #
# Fréchet distance / FVD
# --------------------------------------------------------------------------- #
def frechet_distance(feats1: np.ndarray, feats2: np.ndarray) -> float:
    """Fréchet distance between two gaussian fits (reference
    calculate_fvd.py:75-90: scipy sqrtm on the covariance product)."""
    from scipy import linalg
    mu1, mu2 = feats1.mean(0), feats2.mean(0)
    s1 = np.cov(feats1, rowvar=False)
    s2 = np.cov(feats2, rowvar=False)
    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(s1 @ s2, disp=False)
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(s1) + np.trace(s2)
                 - 2 * np.trace(covmean))


def compute_fvd(videos1: list[np.ndarray], videos2: list[np.ndarray],
                feature_fn: Callable[[np.ndarray], np.ndarray]) -> float:
    """FVD with a pluggable video-feature extractor (I3D-class).

    ``feature_fn``: (T, H, W, 3) -> (D,) feature vector per video.
    """
    f1 = np.stack([feature_fn(v) for v in videos1])
    f2 = np.stack([feature_fn(v) for v in videos2])
    return frechet_distance(f1, f2)


# --------------------------------------------------------------------------- #
# LPIPS (VGG16 backbone + linear heads)
# --------------------------------------------------------------------------- #
class LPIPSVGG:
    """LPIPS(vgg) in flax; perceptual distance over 5 VGG16 feature stages.

    Weights (VGG16 convs + the five 1x1 ``lin`` heads + the input scaling
    shift/scale) convert from the torch ``lpips`` package. With ``params=None``
    a randomly initialised backbone still yields a valid (relative) metric
    for regression testing.
    """

    VGG_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
               512, 512, 512, "M", 512, 512, 512)
    STAGES = (1, 3, 6, 9, 12)  # conv indices whose ReLU output is tapped

    def __init__(self, params=None, seed: int = 0):
        import jax
        import jax.numpy as jnp
        from flax import linen as nn

        class _VGGFeats(nn.Module):
            @nn.compact
            def __call__(self, x):
                taps = []
                conv_i = 0
                for spec in LPIPSVGG.VGG_CFG:
                    if spec == "M":
                        x = nn.max_pool(x, (2, 2), strides=(2, 2))
                    else:
                        x = nn.relu(nn.Conv(spec, (3, 3), padding=1,
                                            name=f"conv_{conv_i}")(x))
                        if conv_i in LPIPSVGG.STAGES:
                            taps.append(x)
                        conv_i += 1
                return taps

        self._net = _VGGFeats()
        self._shift = np.array([-0.030, -0.088, -0.188], np.float32)
        self._scale = np.array([0.458, 0.448, 0.450], np.float32)
        if params is None:
            x = jnp.zeros((1, 64, 64, 3))
            # jitted init: eager flax init dispatches thousands of tiny ops,
            # which is pathological over a tunneled-TPU backend
            init = jax.jit(self._net.init)
            params = {"vgg": init(jax.random.PRNGKey(seed), x), "lins": None}
        self.params = params
        net = self._net
        has_lins = params.get("lins") is not None

        @jax.jit
        def _dist(vgg_params, lins, x1, x2):
            # full distance on device: shipping the raw feature maps to host
            # (~256 MB/frame at 512^2) is pathological over a TPU tunnel
            d = jnp.float32(0.0)
            for i, (a, b) in enumerate(zip(net.apply(vgg_params, x1),
                                           net.apply(vgg_params, x2))):
                a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-10)
                b = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-10)
                diff = (a - b) ** 2
                if has_lins:
                    w = jnp.maximum(lins[i], 0.0)  # lpips lin weights >= 0
                    d += (diff * w[None, None, None, :]).sum(-1).mean()
                else:
                    d += diff.mean(-1).mean()
            return d

        self._dist = _dist
        self._jnp = jnp

    def __call__(self, img1: np.ndarray, img2: np.ndarray) -> float:
        """images (H, W, 3) in [0, 1] -> scalar LPIPS distance."""
        jnp = self._jnp
        x1 = (np.asarray(img1, np.float32) * 2 - 1 - self._shift) / self._scale
        x2 = (np.asarray(img2, np.float32) * 2 - 1 - self._shift) / self._scale
        return float(self._dist(self.params["vgg"], self.params.get("lins"),
                                jnp.asarray(x1)[None], jnp.asarray(x2)[None]))


def lpips_distance(video1: np.ndarray, video2: np.ndarray,
                   model: LPIPSVGG | None = None) -> float:
    """Mean per-frame LPIPS over two aligned videos (reference
    calculate_lpips.py:139-202)."""
    model = model or LPIPSVGG()
    t = min(len(video1), len(video2))
    return float(np.mean([model(video1[i], video2[i]) for i in range(t)]))
