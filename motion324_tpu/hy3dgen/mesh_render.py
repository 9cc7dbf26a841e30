"""Multi-view mesh renderer over the Pallas rasterizer.

The front-end the texture pipeline drives (equivalent of the reference's
``MeshRender``, reference:
scripts/hy3dgen/texgen/differentiable_renderer/mesh_render.py:120-823):
orthographic orbit cameras, normal / position / depth / mask rendering via
barycentric interpolation, UV-space rasterization for baking, and image ->
texture back-projection with cosine-power view weighting.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from motion324_tpu.hy3dgen.camera import (orthographic, transform_points,
                                          view_matrix)
from motion324_tpu.io.mesh import TriMesh, face_normals, vertex_normals
from motion324_tpu.ops.rasterizer import interpolate, rasterize

__all__ = ["MeshRenderer"]


class MeshRenderer:
    """Renders one normalised mesh from orbit cameras (ortho by default)."""

    def __init__(self, mesh: TriMesh, resolution: int = 512,
                 texture_size: int = 1024, camera_distance: float = 1.45,
                 ortho_scale: float = 1.2, interpret: bool = False):
        self.mesh = mesh
        self.resolution = resolution
        self.texture_size = texture_size
        self.camera_distance = camera_distance
        s = ortho_scale / 2
        self.proj = orthographic(-s, s, -s, s, 0.1, 100.0)
        self.interpret = interpret
        self._vn = vertex_normals(mesh.vertices, mesh.faces)
        # the mesh is fixed for the renderer's lifetime, so every view (and
        # the UV atlas pass) is rasterized at most ONCE: the paint pipeline
        # renders each view to feed the diffusion net and then bakes, which
        # back-projects the SAME views for depth/reliability — without the
        # cache that re-rasterized every view a second time (12 raster
        # passes per 6-view bake instead of 6 + 1 UV).
        self._view_cache: dict = {}
        self._uv_raster = None
        self.raster_calls = 0  # observability: actual rasterizer invocations

    # ------------------------------------------------------------------ #
    def _clip_positions(self, elev: float, azim: float) -> np.ndarray:
        mv = view_matrix(elev, azim, self.camera_distance)
        return transform_points(self.proj @ mv, self.mesh.vertices)

    def render_view(self, elev: float, azim: float) -> dict:
        """Render one view: returns dict with ``mask``, ``depth``, ``normal``
        (world-space, [-1,1]), ``position`` (world-space xyz) images.

        Memoized per (elev, azim): callers across the paint pipeline share
        one rasterization per view."""
        key = (float(elev), float(azim))
        cached = self._view_cache.get(key)
        if cached is not None:
            return cached
        pos_clip = self._clip_positions(elev, azim)
        find, bary, normal, position, z = _view_products(
            jnp.asarray(pos_clip), jnp.asarray(self.mesh.faces, jnp.int32),
            jnp.asarray(self._vn), jnp.asarray(self.mesh.vertices),
            self.resolution, self.interpret)
        self.raster_calls += 1
        view = {"mask": np.asarray(find) > 0, "normal": np.asarray(normal),
                "position": np.asarray(position), "depth": np.asarray(z),
                "findices": np.asarray(find), "bary": np.asarray(bary)}
        self._view_cache[key] = view
        return view

    # ------------------------------------------------------------------ #
    def rasterize_uv(self):
        """Rasterize the mesh's UV atlas: which face covers each texel.

        Equivalent of the reference's UV-space pass used for baking
        (mesh_render.py:566-622): UV coordinates become clip-space xy.
        """
        if self._uv_raster is not None:
            return self._uv_raster
        uv = self.mesh.uv
        if uv is None:
            raise ValueError("mesh has no UV coordinates")
        # uv in [0,1] -> clip [-1,1]; V axis flipped (texture row 0 = v=1)
        pos = np.zeros((len(uv), 4), np.float32)
        pos[:, 0] = uv[:, 0] * 2 - 1
        pos[:, 1] = 1 - 2 * uv[:, 1]
        pos[:, 3] = 1.0
        self.raster_calls += 1
        self._uv_raster = rasterize(pos, self.mesh.faces, self.texture_size,
                                    self.texture_size,
                                    interpret=self.interpret)
        return self._uv_raster

    def reliability_mask(self, view: dict, angle_thres_deg: float = 75.0
                         ) -> np.ndarray:
        """Image-space mask of pixels reliable for texture back-projection.

        Reproduces the reference's bake reliability treatment
        (mesh_render.py:707-737): the visible mask is SHRUNK (eroded) by
        ``bake_unreliable_kernel_size`` to drop silhouette pixels, pixels near
        DEPTH EDGES (Canny on the normalised depth, dilated by the same
        kernel) are rejected, and grazing-angle pixels (normal vs view beyond
        ``angle_thres_deg``, reference default 75 at :138) are zeroed.
        """
        import cv2
        mask = view["mask"].astype(np.uint8)
        depth = view["depth"]
        # kernel scaled to resolution as in the reference (:139-140)
        k = max(int((2 / 512) * self.resolution), 1) * 2 + 1
        kernel = np.ones((k, k), np.uint8)

        shrunk = cv2.erode(mask, kernel) > 0

        vis = mask > 0
        if vis.any():
            dmin, dmax = depth[vis].min(), depth[vis].max()
            dn = (depth - dmin) / max(dmax - dmin, 1e-8) * vis
            edges = cv2.Canny((dn * 255).astype(np.uint8), 30, 80)
            edges = cv2.dilate(edges, kernel) > 0
        else:
            edges = np.zeros_like(vis)

        # grazing angle: normal is world-space; compare against the view dir
        cosang = view.get("view_cos")
        if cosang is None:
            cosang = np.abs(view["normal"][..., 2])
        ok_angle = cosang >= np.cos(np.deg2rad(angle_thres_deg))
        return shrunk & ~edges & ok_angle

    def back_project(self, view_image: np.ndarray, elev: float, azim: float,
                     uv_find=None, uv_bary=None, cos_power: float = 4.0,
                     angle_thres_deg: float = 75.0):
        """Project a rendered/generated view image into UV texture space.

        For every texel covered by the atlas, its 3D surface point is
        projected into the view; the image color there is sampled bilinearly
        and weighted by ``cos^power`` of the angle between the surface normal
        and the view direction, gated by a per-pixel reliability mask
        (visibility shrink + depth-edge rejection + grazing-angle threshold —
        reference mesh_render.py:653-757). Returns
        ``(texture (S,S,3), weight (S,S,1))``.
        """
        if uv_find is None or uv_bary is None:
            uv_find, uv_bary = self.rasterize_uv()
        faces = jnp.asarray(self.mesh.faces)
        texel_pos = interpolate(jnp.asarray(self.mesh.vertices), uv_find,
                                uv_bary, faces)  # (S,S,3)
        texel_nrm = interpolate(jnp.asarray(self._vn), uv_find, uv_bary, faces)
        covered = (np.asarray(uv_find) > 0)

        mv = view_matrix(elev, azim, self.camera_distance)
        clip = transform_points(self.proj @ mv,
                                np.asarray(texel_pos).reshape(-1, 3))
        ndc = clip[:, :2] / clip[:, 3:4]
        h, w = view_image.shape[:2]
        px = (ndc[:, 0] * 0.5 + 0.5) * (w - 1)
        py = (0.5 + 0.5 * ndc[:, 1]) * (h - 1)
        # internal buffers (depth/reliability) stay at self.resolution even
        # when the view image is larger (e.g. 4x super-resolved views)
        pxb = (ndc[:, 0] * 0.5 + 0.5) * (self.resolution - 1)
        pyb = (0.5 + 0.5 * ndc[:, 1]) * (self.resolution - 1)

        color = _bilinear(view_image, px, py).reshape(
            self.texture_size, self.texture_size, -1)

        # visibility: z-test against the view depth buffer
        view = self.render_view(elev, azim)
        cam_dir = -(np.linalg.inv(mv[:3, :3]) @ np.array([0, 0, -1.0]))
        view["view_cos"] = np.clip(
            view["normal"] @ cam_dir.astype(np.float32), 0, 1)
        depth_img = view["depth"]
        z_tex = (clip[:, 2] / clip[:, 3]).reshape(self.texture_size,
                                                  self.texture_size)
        z_ref = _bilinear(depth_img[..., None], pxb, pyb)[:, 0].reshape(
            self.texture_size, self.texture_size)
        vis = view["mask"]
        z_tol = 2e-3 * (float(depth_img[vis].max() - depth_img[vis].min())
                        if vis.any() else 1.0) + 1e-4
        visible = np.abs(z_tex - z_ref) < max(z_tol, 1e-3)

        # reliability gate, sampled conservatively (all 4 bilinear neighbours
        # must be reliable — the gather-side equivalent of the reference's
        # image-space mask shrink before scatter)
        rel = self.reliability_mask(view, angle_thres_deg).astype(np.float32)
        rel_tex = _bilinear(rel[..., None], pxb, pyb)[:, 0].reshape(
            self.texture_size, self.texture_size)
        reliable = rel_tex > 0.999

        cosang = np.asarray(texel_nrm) @ cam_dir.astype(np.float32)
        weight = np.clip(cosang, 0, 1) ** cos_power
        weight = weight * covered * visible * reliable
        return np.asarray(color) * weight[..., None], weight[..., None]

    def bake(self, view_images, views, cos_power: float = 4.0,
             view_weights=None):
        """Merge several views into one texture by normalised weighted sum
        (reference mesh_render.py:782-798 ``fast_bake_texture``).

        ``views``: list of (azim, elev, weight) tuples.
        Returns ``(texture (S,S,3), weight_mask (S,S))``.
        """
        uv_find, uv_bary = self.rasterize_uv()
        acc = np.zeros((self.texture_size, self.texture_size, 3), np.float32)
        wacc = np.zeros((self.texture_size, self.texture_size, 1), np.float32)
        for img, (azim, elev, vw) in zip(view_images, views):
            c, w = self.back_project(img, elev, azim, uv_find, uv_bary,
                                     cos_power)
            acc += c * vw
            wacc += w * vw
        tex = acc / np.maximum(wacc, 1e-8)
        return tex, wacc[..., 0] > 1e-8


@functools.partial(jax.jit, static_argnums=(4, 5))
def _view_products(pos_clip, faces, vn, verts, resolution, interpret):
    """One fused program per view: rasterize + interpolate normals/positions/
    depth (eager per-op dispatch is pathological over a TPU tunnel)."""
    from motion324_tpu.ops.rasterizer import _rasterize_impl
    find, bary = _rasterize_impl(pos_clip, faces, resolution, resolution,
                                 interpret=interpret)
    normal = interpolate(vn, find, bary, faces)
    norm = jnp.linalg.norm(normal, axis=-1, keepdims=True)
    normal = normal / jnp.where(norm == 0, 1.0, norm)
    position = interpolate(verts, find, bary, faces)
    z = interpolate(pos_clip[:, 2:3] / pos_clip[:, 3:4], find, bary,
                    faces)[..., 0]
    return find, bary, normal, position, z


def _bilinear(img: np.ndarray, px: np.ndarray, py: np.ndarray) -> np.ndarray:
    h, w = img.shape[:2]
    x0 = np.clip(np.floor(px).astype(np.int64), 0, w - 1)
    y0 = np.clip(np.floor(py).astype(np.int64), 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    fx = np.clip(px - x0, 0, 1)[:, None]
    fy = np.clip(py - y0, 0, 1)[:, None]
    c = (img[y0, x0] * (1 - fx) * (1 - fy) + img[y0, x1] * fx * (1 - fy)
         + img[y1, x0] * (1 - fx) * fy + img[y1, x1] * fx * fy)
    return c.astype(np.float32)
