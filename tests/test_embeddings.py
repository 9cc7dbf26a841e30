"""Embedding ops vs independent torch/numpy re-implementations of the reference math."""

import numpy as np
import torch

from motion324_tpu.ops.embeddings import (
    apply_point_basis,
    frequency_embed,
    point_embed_basis,
    resize_pos_embed,
    sinusoidal_time_embed,
    video_pos_embed,
)


def test_frequency_embed_matches_torch_math():
    # reference math: model/Pcd_motion.py:87-107
    x = np.random.RandomState(0).randn(2, 5, 3).astype(np.float32)
    num_freqs = 6
    freqs = (2.0 ** torch.arange(num_freqs).float()) * torch.pi
    xt = torch.from_numpy(x)
    embed = (xt[..., None] * freqs).reshape(*x.shape[:-1], -1)
    expected = torch.cat((xt, embed.sin(), embed.cos()), dim=-1).numpy()
    got = np.asarray(frequency_embed(x, num_freqs=num_freqs))
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_point_basis_matches_torch_math():
    # reference math: model/Pcd_motion.py:157-187 (PointEmbed.embed)
    hidden = 48
    e = torch.pow(2, torch.arange(hidden // 6)).float() * np.pi
    z = torch.zeros(hidden // 6)
    basis_t = torch.stack([
        torch.cat([e, z, z]), torch.cat([z, e, z]), torch.cat([z, z, e]),
    ]).numpy()
    basis = point_embed_basis(hidden)
    np.testing.assert_allclose(basis, basis_t, atol=1e-6)

    pts = np.random.RandomState(1).randn(2, 7, 3).astype(np.float32)
    proj = torch.einsum("bnd,de->bne", torch.from_numpy(pts), torch.from_numpy(basis_t))
    expected = torch.cat([proj.sin(), proj.cos(), torch.from_numpy(pts)], dim=2).numpy()
    got = np.asarray(apply_point_basis(pts, basis))
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_video_pos_embed_matches_torch_math():
    # reference math: model/Pcd_motion.py:230-266 (generate_pos_embed)
    T, H, W, C = 3, 4, 4, 768
    lt = 2 * (torch.arange(T).float() / (T - 1)) - 1
    lh = 2 * (torch.arange(H).float() / (H - 1)) - 1
    lw = 2 * (torch.arange(W).float() / (W - 1)) - 1
    t, h, w = torch.meshgrid(lt, lh, lw, indexing="ij")
    pos = torch.stack([t, h, w], dim=-1)
    freq = 2.0 ** torch.linspace(0.0, 7.0, C // 6)
    ang = pos.unsqueeze(-1) * freq.view(1, 1, 1, 1, -1)
    expected = torch.cat([torch.sin(ang), torch.cos(ang)], dim=-1).reshape(1, -1, C).numpy()
    got = video_pos_embed(T, H, W, C)
    np.testing.assert_allclose(got, expected, atol=1e-4)
    assert got.shape == (1, T * H * W, C)


def test_video_pos_embed_singleton_time():
    got = video_pos_embed(1, 2, 2, 12)
    assert got.shape == (1, 4, 12)
    assert np.isfinite(got).all()


def test_resize_pos_embed_matches_torch_trilinear():
    # reference math: model/Pcd_motion.py:221-228 (F.interpolate trilinear,
    # align_corners=False)
    C = 12
    src = (2, 4, 4)
    dst = (5, 3, 3)
    pos = np.random.RandomState(2).randn(1, src[0] * src[1] * src[2], C).astype(np.float32)

    pt = torch.from_numpy(pos).reshape(1, *src, C).permute(0, 4, 1, 2, 3)
    pt = torch.nn.functional.interpolate(pt, size=dst, mode="trilinear", align_corners=False)
    expected = pt.permute(0, 2, 3, 4, 1).reshape(1, -1, C).numpy()

    got = np.asarray(resize_pos_embed(pos, src, dst))
    np.testing.assert_allclose(got, expected, atol=1e-4, rtol=1e-4)


def test_sinusoidal_time_embed_matches_torch_math():
    # reference math: model/Pcd_motion.py:109-118
    import math
    T, C = 7, 16
    position = torch.arange(T).float().unsqueeze(1)
    div = torch.exp(torch.arange(0, C, 2).float() * (-math.log(10000.0) / C))
    pe = torch.zeros(T, C)
    pe[:, 0::2] = torch.sin(position * div)
    pe[:, 1::2] = torch.cos(position * div)
    np.testing.assert_allclose(sinusoidal_time_embed(T, C), pe.numpy(), atol=1e-6)
