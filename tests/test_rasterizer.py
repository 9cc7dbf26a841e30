"""Rasterizer: Pallas kernel vs the numpy oracle (reference CPU semantics),
depth ordering, barycentric interpolation."""

import jax.numpy as jnp
import numpy as np
import pytest

from motion324_tpu.ops.rasterizer import (interpolate, rasterize,
                                          rasterize_reference)


def _clip(v):
    """xyz in [-1,1] -> clip space with w=1 (orthographic)."""
    out = np.concatenate([v, np.ones((len(v), 1), np.float32)], axis=1)
    return out.astype(np.float32)


def test_single_triangle_matches_oracle():
    pos = _clip(np.array([[-0.5, -0.5, 0.0], [0.5, -0.5, 0.0], [0.0, 0.5, 0.0]],
                         np.float32))
    faces = np.array([[0, 1, 2]], np.int32)
    find, bary = rasterize(pos, faces, 64, 64, block_px=512, block_f=256,
                           interpret=True)
    oracle = rasterize_reference(pos, faces, 64, 64)
    np.testing.assert_array_equal(np.asarray(find), oracle)
    covered = np.asarray(find) > 0
    assert covered.sum() > 100
    s = np.asarray(bary).sum(-1)
    np.testing.assert_allclose(s[covered], 1.0, atol=1e-5)
    assert (s[~covered] == 0).all()


def test_depth_ordering_nearer_face_wins():
    # two overlapping triangles; the z=-0.5 one is nearer (smaller screen z)
    pos = _clip(np.array([
        [-0.8, -0.8, 0.5], [0.8, -0.8, 0.5], [0.0, 0.8, 0.5],     # far
        [-0.8, -0.8, -0.5], [0.8, -0.8, -0.5], [0.0, 0.8, -0.5],  # near
    ], np.float32))
    faces = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    find, _ = rasterize(pos, faces, 32, 32, interpret=True)
    covered = np.asarray(find)
    assert (covered[covered > 0] == 2).all()  # face id 2 (= index 1 + 1)


def test_random_mesh_matches_oracle():
    rng = np.random.RandomState(0)
    v = rng.uniform(-0.9, 0.9, size=(30, 3)).astype(np.float32)
    faces = rng.randint(0, 30, size=(25, 3)).astype(np.int32)
    pos = _clip(v)
    find, bary = rasterize(pos, faces, 48, 48, interpret=True)
    oracle = rasterize_reference(pos, faces, 48, 48)
    mismatch = (np.asarray(find) != oracle).mean()
    assert mismatch < 0.01, f"{mismatch:.3%} pixels differ from oracle"


def test_face_id_tiebreak():
    # identical duplicated triangle: lower face id must win everywhere
    pos = _clip(np.array([[-0.5, -0.5, 0.0], [0.5, -0.5, 0.0], [0.0, 0.5, 0.0]],
                         np.float32))
    faces = np.array([[0, 1, 2], [0, 1, 2]], np.int32)
    find, _ = rasterize(pos, faces, 32, 32, interpret=True)
    f = np.asarray(find)
    assert (f[f > 0] == 1).all()


def test_interpolate_attributes():
    pos = _clip(np.array([[-1, -1, 0], [1, -1, 0], [0, 1, 0]], np.float32))
    faces = np.array([[0, 1, 2]], np.int32)
    find, bary = rasterize(pos, faces, 32, 32, interpret=True)
    attrs = jnp.asarray(np.eye(3, dtype=np.float32))  # one-hot per vertex
    img = np.asarray(interpolate(attrs, find, bary, jnp.asarray(faces)))
    covered = np.asarray(find) > 0
    np.testing.assert_allclose(img[covered].sum(-1), 1.0, atol=1e-5)
    assert (img[~covered] == 0).all()


def test_perspective_corrected_barycentrics():
    # unequal w: perspective correction must renormalise with 1/w weights
    pos = np.array([[-0.5, -0.5, 0.0, 1.0], [0.5, -0.5, 0.0, 2.0],
                    [0.0, 0.5, 0.0, 1.0]], np.float32)
    pos[1, :3] *= 2.0  # keep screen position identical after w-divide
    faces = np.array([[0, 1, 2]], np.int32)
    find, bary = rasterize(pos, faces, 32, 32, interpret=True)
    covered = np.asarray(find) > 0
    assert covered.sum() > 0
    np.testing.assert_allclose(np.asarray(bary).sum(-1)[covered], 1.0, atol=1e-5)
