"""Camera math and multi-view rendering over the Pallas rasterizer."""

import numpy as np
import pytest

from motion324_tpu.hy3dgen.camera import (orthographic, perspective,
                                          transform_points, view_matrix)
from motion324_tpu.hy3dgen.mesh_render import MeshRenderer
from motion324_tpu.io.mesh import TriMesh

CUBE_V = (np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                    [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]], np.float32)
          - 0.5) * 0.8
CUBE_F = np.array([[0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7],
                   [0, 1, 5], [0, 5, 4], [2, 3, 7], [2, 7, 6],
                   [1, 2, 6], [1, 6, 5], [3, 0, 4], [3, 4, 7]], np.int64)


def test_view_matrix_camera_on_orbit():
    w2c = view_matrix(0, 0, camera_distance=2.0)
    # camera at azim 0 (+90 offset => +y axis), looking at origin
    cam_pos = -np.linalg.inv(w2c[:3, :3]) @ w2c[:3, 3]
    np.testing.assert_allclose(cam_pos, [0, 2, 0], atol=1e-6)
    # origin maps to (0, 0, -distance) in camera space
    p = transform_points(w2c, np.zeros((1, 3), np.float32))
    np.testing.assert_allclose(p[0, :3], [0, 0, -2.0], atol=1e-6)


def test_orthographic_maps_bounds():
    m = orthographic(-1, 1, -1, 1, 0, 2)
    p = transform_points(m, np.array([[1.0, 1.0, -2.0]], np.float32))
    np.testing.assert_allclose(p[0], [1, 1, 1, 1], atol=1e-6)


def test_perspective_w_is_minus_z():
    m = perspective(60.0, 1.0, 0.1, 10.0)
    p = transform_points(m, np.array([[0.0, 0.0, -5.0]], np.float32))
    assert abs(p[0, 3] - 5.0) < 1e-5


@pytest.fixture(scope="module")
def renderer():
    mesh = TriMesh(vertices=CUBE_V, faces=CUBE_F)
    return MeshRenderer(mesh, resolution=64, texture_size=64, interpret=True)


def test_render_view_mask_and_normals(renderer):
    out = renderer.render_view(elev=0, azim=0)
    assert out["mask"].sum() > 200  # the cube fills a chunk of the frame
    n = out["normal"][out["mask"]]
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-4)
    # front view at azim 0 looks down -y: visible faces have +y normals
    assert n[:, 1].mean() > 0.5


def test_render_view_positions_on_surface(renderer):
    out = renderer.render_view(elev=0, azim=0)
    pos = out["position"][out["mask"]]
    assert np.abs(pos).max() <= 0.41  # inside the 0.8-side cube + eps


def test_uv_rasterize_and_bake():
    uv = np.random.RandomState(0).rand(8, 2).astype(np.float32) * 0.8 + 0.1
    mesh = TriMesh(vertices=CUBE_V, faces=CUBE_F, uv=uv)
    r = MeshRenderer(mesh, resolution=32, texture_size=32, interpret=True)
    find, bary = r.rasterize_uv()
    assert (np.asarray(find) > 0).sum() > 10

    # bake-coverage assertion on a REAL unwrap (random UVs scatter texels
    # onto arbitrary faces, so their bake coverage is meaningless; a former
    # `if mask.any()` here silently passed 0%-coverage bakes — r5 dry-run
    # bug). Six ortho views over a properly unwrapped cube must land color
    # on a solid fraction of the atlas-covered texels.
    from motion324_tpu.hy3dgen.uv_unwrap import unwrap_uv
    unwrapped, _ = unwrap_uv(TriMesh(vertices=CUBE_V, faces=CUBE_F), 64)
    r2 = MeshRenderer(unwrapped, resolution=64, texture_size=64,
                      interpret=True)
    find2, _ = r2.rasterize_uv()
    views = [(a, 0, 1.0) for a in (0, 90, 180, 270)] + [(0, 90, 1.0),
                                                        (0, -90, 1.0)]
    imgs = [np.full((64, 64, 3), 0.7, np.float32) for _ in views]
    tex, mask = r2.bake(imgs, views)
    covered = np.asarray(find2) > 0
    assert mask.sum() > 0.3 * covered.sum(), (mask.sum(), covered.sum())
    np.testing.assert_allclose(tex[mask], 0.7, atol=1e-3)


def test_bake_reuses_view_rasterizations():
    """One rasterization per view per renderer lifetime: rendering the views
    for the diffusion stage and then baking must NOT rasterize them again
    (plus exactly one UV-atlas pass), and repeated bake() calls reuse the
    cached UV raster."""
    uv = np.random.RandomState(0).rand(8, 2).astype(np.float32) * 0.8 + 0.1
    mesh = TriMesh(vertices=CUBE_V, faces=CUBE_F, uv=uv)
    r = MeshRenderer(mesh, resolution=32, texture_size=32, interpret=True)
    views = [(0, 0, 1.0), (90, 0, 0.1), (180, 0, 0.5)]
    for azim, elev, _ in views:
        r.render_view(elev, azim)   # diffusion-stage renders
    assert r.raster_calls == 3
    imgs = [np.full((32, 32, 3), 0.7, np.float32) for _ in views]
    r.bake(imgs, views)
    assert r.raster_calls == 4      # + UV atlas only; views came from cache
    r.bake(imgs, views)
    assert r.raster_calls == 4      # fully cached


def test_paint_pipeline_bakes_unnormalized_mesh():
    """PaintPipeline must normalize ANY input mesh into the renderer's
    ortho frustum before rendering: a mesh spanning [-1, 1] (the shape-gen
    decode box) previously overflowed every view and baked 0% of the atlas
    (r5 dry-run bug). The weight-free reprojection synthesizer suffices."""
    from motion324_tpu.hy3dgen.paint_pipeline import PaintPipeline

    n_side = 12
    u, v = np.meshgrid(np.linspace(0, 2 * np.pi, n_side),
                       np.linspace(0.2, np.pi - 0.2, n_side))
    verts = np.stack([np.sin(v) * np.cos(u), np.sin(v) * np.sin(u),
                      np.cos(v)], -1).reshape(-1, 3).astype(np.float32)
    faces = []
    for r in range(n_side - 1):
        for c in range(n_side - 1):
            a = r * n_side + c
            faces.append([a, a + n_side, a + 1])  # outward winding
            faces.append([a + 1, a + n_side, a + n_side + 1])
    mesh = TriMesh(vertices=verts, faces=np.asarray(faces, np.int64))

    painter = PaintPipeline(resolution=32, texture_size=64, delight=False,
                            interpret=True)
    out = painter(mesh, np.full((32, 32, 3), 0.5, np.float32))
    tex = np.asarray(out.texture)
    assert (tex.sum(-1) > 0).mean() > 0.2, "bake landed (almost) no texels"
    # output keeps the ORIGINAL coordinates (normalization is render-only)
    np.testing.assert_allclose(out.vertices.max(), verts.max(), atol=1e-5)
