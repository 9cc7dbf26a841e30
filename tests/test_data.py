"""Dataset: tracking math vs the reference's trimesh-based implementation
semantics, frame sampling distribution, defensive resampling, loader batching."""

import os

import numpy as np
import pytest

from motion324_tpu.config import ConfigDict
from motion324_tpu.data.dyscene import DysceneDataset, PrefetchLoader, collate
from motion324_tpu.data.tracking import (sample_texture_colors,
                                         sequence_vertex_normals, track_points)

CUBE_V = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                   [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]], np.float32)
CUBE_F = np.array([[0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7],
                   [0, 1, 5], [0, 5, 4], [2, 3, 7], [2, 7, 6],
                   [1, 2, 6], [1, 6, 5], [3, 0, 4], [3, 4, 7]], np.int64)


def test_track_points_rigid_translation():
    """Tracked points must follow the mesh exactly under rigid translation."""
    t_frames = 4
    offsets = np.arange(t_frames, dtype=np.float32)[:, None, None]
    vertex_frames = CUBE_V[None] + offsets  # translate by t in every axis
    pts, normals, rgbs, fidx = track_points(vertex_frames, CUBE_F, 50)
    assert pts.shape == (t_frames, 50, 3)
    for t in range(1, t_frames):
        np.testing.assert_allclose(pts[t] - pts[0], np.full((50, 3), float(t)),
                                   atol=1e-5)
    # normals invariant under translation
    np.testing.assert_allclose(normals[0], normals[-1], atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(normals, axis=-1), 1.0, atol=1e-4)


def test_track_points_texture_rgb_fixed_over_time():
    tex = np.zeros((8, 8, 3), np.float32)
    tex[:, :4] = [1, 0, 0]
    tex[:, 4:] = [0, 0, 1]
    face_uvs = np.full((12, 3, 2), 0.25, np.float32)  # left half -> red
    vf = np.stack([CUBE_V, CUBE_V * 2.0])
    pts, _, rgbs, _ = track_points(vf, CUBE_F, 30, face_uvs, tex)
    np.testing.assert_allclose(rgbs[0], [[1, 0, 0]] * 30, atol=1e-6)
    np.testing.assert_array_equal(rgbs[0], rgbs[1])


def test_sample_texture_colors_indexing():
    # reference formula: x = u*(W-1), y = (1-v)*(H-1) (dataset_utils.py:19-41)
    tex = np.arange(16 * 3, dtype=np.float32).reshape(4, 4, 3)
    uvs = np.array([[0.0, 1.0], [1.0, 0.0]], np.float32)
    out = sample_texture_colors(uvs, tex)
    np.testing.assert_array_equal(out[0], tex[0, 0])
    np.testing.assert_array_equal(out[1], tex[3, 3])


def test_sequence_vertex_normals_matches_static():
    from motion324_tpu.io.mesh import vertex_normals
    vn_seq = sequence_vertex_normals(CUBE_V[None].astype(np.float64), CUBE_F)
    vn_static = vertex_normals(CUBE_V, CUBE_F)
    np.testing.assert_allclose(vn_seq[0], vn_static, atol=1e-5)


# --------------------------------------------------------------------------- #
def _write_dataset(root, objs=("obj_a", "obj_b"), t_frames=8, cameras=2):
    from PIL import Image
    for obj in objs:
        pdir = os.path.join(root, "pcds", f"{obj}_pointclouds")
        os.makedirs(pdir, exist_ok=True)
        np.save(os.path.join(pdir, "faces.npy"), CUBE_F)
        np.savez(os.path.join(pdir, "uv_face_texture.npz"),
                 face_uvs=np.random.RandomState(0).rand(12, 3, 2).astype(np.float32),
                 texture_array=(np.random.RandomState(1).rand(8, 8, 3) * 255)
                 .astype(np.float32))
        for t in range(t_frames):
            np.save(os.path.join(pdir, f"frame_{t:04d}.npy"),
                    CUBE_V + 0.01 * t)
        for c in range(15):
            idir = os.path.join(root, "all_images", f"{obj}_images", f"camera_{c}")
            os.makedirs(idir, exist_ok=True)
            for t in range(t_frames):
                img = Image.fromarray(
                    np.full((16, 16, 3), (t * 10) % 255, np.uint8))
                img.save(os.path.join(idir, f"frame_{t:04d}.jpg"))


def _cfg(root, frames=4):
    return ConfigDict({"training": {
        "dataset_path": root, "frames": frames, "replica": 1,
        "num_shape_samples": 32, "num_pcd_samples": 16,
        "dataset_begin": 0, "dataset_end": -1,
    }})


def test_dataset_sample_shapes(tmp_path):
    _write_dataset(str(tmp_path))
    ds = DysceneDataset(_cfg(str(tmp_path)))
    assert len(ds) == 2
    s = ds[0]
    assert s["rgb_video"].shape == (4, 16, 16, 3)
    assert s["point_clouds"].shape == (4, 16, 3)
    assert s["ref_shape_pcd"].shape == (32, 3)
    assert s["ref_pcd"].shape == (16, 3)
    assert 0.0 <= s["ref_shape_rgbs"].min() and s["ref_shape_rgbs"].max() <= 1.0


def test_dataset_skip_windows(tmp_path):
    """With T=8 frames and window 4, skip-1 and skip-2 are feasible, skip-4 not."""
    _write_dataset(str(tmp_path), t_frames=8)
    ds = DysceneDataset(_cfg(str(tmp_path), frames=4), seed=3)
    spans = set()
    for _ in range(20):
        idxs = ds._choose_frame_indices(8)
        step = idxs[1] - idxs[0]
        spans.add(step)
        assert len(idxs) == 4
        assert idxs[-1] < 8
    assert spans <= {1, 2}
    assert len(spans) == 2  # both strategies drawn across 20 tries


def test_dataset_resamples_broken_object(tmp_path):
    _write_dataset(str(tmp_path), objs=("good",))
    # a broken object with no uv file
    bdir = os.path.join(str(tmp_path), "pcds", "bad_pointclouds")
    os.makedirs(bdir)
    np.save(os.path.join(bdir, "faces.npy"), CUBE_F)
    ds = DysceneDataset(_cfg(str(tmp_path)))
    assert set(ds.obj_names) == {"bad", "good"}
    for i in range(len(ds)):
        s = ds[i]  # never raises: bad -> resample to good
        assert s["obj_name"] == "good"


def test_collate_and_loader(tmp_path):
    _write_dataset(str(tmp_path))
    ds = DysceneDataset(_cfg(str(tmp_path)))
    loader = PrefetchLoader(ds, batch_size=2, num_workers=2, prefetch=1)
    it = iter(loader)
    batch = next(it)
    assert batch["rgb_video"].shape == (2, 4, 16, 16, 3)
    assert batch["point_clouds"].shape == (2, 4, 16, 3)
    assert isinstance(batch["obj_name"], list)
    batch2 = next(it)  # second batch wraps into next epoch fine
    assert batch2["rgb_video"].shape == (2, 4, 16, 16, 3)


def test_collate_shape_mismatch_diagnostic():
    a = {"x": np.zeros((2, 3))}
    b = {"x": np.zeros((2, 4))}
    with pytest.raises(ValueError, match="mismatched shapes"):
        collate([a, b])


def test_collate_edge_indices_disjoint_graph():
    """Optional (2, E) per-sample edge lists batch as one disjoint graph:
    node ids offset by point_clouds' N per sample, edges concatenated to
    (2, B*E) (reference dataset/dyscene.py:368-381)."""
    def sample(seed):
        r = np.random.RandomState(seed)
        return {"point_clouds": r.randn(4, 16, 3).astype(np.float32),
                "edge_indices": np.array([[0, 1, 15], [1, 2, 0]], np.int64)}

    out = collate([sample(0), sample(1), sample(2)])
    assert out["edge_indices"].shape == (2, 9)
    np.testing.assert_array_equal(out["edge_indices"][:, 3:6],
                                  [[16, 17, 31], [17, 18, 16]])
    np.testing.assert_array_equal(out["edge_indices"][:, 6:],
                                  [[32, 33, 47], [33, 34, 32]])
    assert out["point_clouds"].shape == (3, 4, 16, 3)
