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
        c, w = self._back_project_dev(view_image, elev, azim, cos_power,
                                      angle_thres_deg)
        return np.asarray(c), np.asarray(w)

    def _texel_geometry(self):
        """View-independent per-texel surface geometry, computed ONCE and
        kept ON DEVICE: position, normal, covered mask from the UV atlas
        raster. (Recomputing these per view shipped ~50 MB of texel
        positions over the host link for every back-projection — the bake's
        dominant cost at 2048^2 x 6 views.)"""
        if getattr(self, "_texel_geom", None) is None:
            uv_find, uv_bary = self.rasterize_uv()
            faces = jnp.asarray(self.mesh.faces)
            texel_pos = interpolate(jnp.asarray(self.mesh.vertices), uv_find,
                                    uv_bary, faces)  # (S,S,3)
            texel_nrm = interpolate(jnp.asarray(self._vn), uv_find, uv_bary,
                                    faces)
            covered = (jnp.asarray(uv_find) > 0).astype(jnp.float32)
            self._texel_geom = (texel_pos, texel_nrm, covered)
        return self._texel_geom

    def _back_project_dev(self, view_image, elev: float, azim: float,
                          cos_power: float, angle_thres_deg: float):
        """Device back-projection; returns jax arrays (see back_project)."""
        texel_pos, texel_nrm, covered = self._texel_geometry()
        view = self.render_view(elev, azim)
        mv = view_matrix(elev, azim, self.camera_distance)
        cam_dir = -(np.linalg.inv(mv[:3, :3]) @ np.array([0, 0, -1.0]))
        view["view_cos"] = np.clip(
            view["normal"] @ cam_dir.astype(np.float32), 0, 1)
        depth_img = view["depth"]
        vis = view["mask"]
        z_tol = 2e-3 * (float(depth_img[vis].max() - depth_img[vis].min())
                        if vis.any() else 1.0) + 1e-4
        rel = self.reliability_mask(view, angle_thres_deg).astype(np.float32)
        return _back_project_math(
            texel_pos, texel_nrm, covered,
            jnp.asarray(view_image, jnp.float32),
            jnp.asarray(depth_img, jnp.float32), jnp.asarray(rel),
            jnp.asarray((self.proj @ mv).astype(np.float32)),
            jnp.asarray(cam_dir.astype(np.float32)),
            float(max(z_tol, 1e-3)), float(cos_power), self.resolution)

    def bake(self, view_images, views, cos_power: float = 4.0,
             view_weights=None):
        """Merge several views into one texture by normalised weighted sum
        (reference mesh_render.py:782-798 ``fast_bake_texture``).

        ``views``: list of (azim, elev, weight) tuples.
        Returns ``(texture (S,S,3), weight_mask (S,S))``.

        Accumulation stays on device; the texture downloads once at the end
        (per-view numpy accumulation cost ~80 s at 2048^2 x 6 views).
        """
        acc = jnp.zeros((self.texture_size, self.texture_size, 3),
                        jnp.float32)
        wacc = jnp.zeros((self.texture_size, self.texture_size, 1),
                         jnp.float32)
        for img, (azim, elev, vw) in zip(view_images, views):
            c, w = self._back_project_dev(img, elev, azim, cos_power, 75.0)
            acc = acc + c * vw
            wacc = wacc + w * vw
        tex = np.asarray(acc / jnp.maximum(wacc, 1e-8))
        return tex, np.asarray(wacc[..., 0]) > 1e-8


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


def _bilinear_jnp(img, px, py):
    """jnp mirror of :func:`_bilinear` (same clamp-to-edge sampling)."""
    h, w = img.shape[:2]
    x0 = jnp.clip(jnp.floor(px).astype(jnp.int32), 0, w - 1)
    y0 = jnp.clip(jnp.floor(py).astype(jnp.int32), 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    fx = jnp.clip(px - x0, 0, 1)[:, None]
    fy = jnp.clip(py - y0, 0, 1)[:, None]
    return (img[y0, x0] * (1 - fx) * (1 - fy) + img[y0, x1] * fx * (1 - fy)
            + img[y1, x0] * (1 - fx) * fy + img[y1, x1] * fx * fy)


@functools.partial(jax.jit, static_argnums=(10,))
def _back_project_math(texel_pos, texel_nrm, covered, view_image, depth_img,
                       rel_img, M, cam_dir, z_tol, cos_power, resolution):
    """The per-view back-projection math on device (see back_project).

    Identical semantics to the former host-numpy version: project texels
    into the view, bilinear-sample color, gate by z-visibility against the
    view depth buffer, by the reliability mask (conservatively: all 4
    bilinear neighbours reliable), and by cos^power view angle.
    """
    s = texel_pos.shape[0]
    p = texel_pos.reshape(-1, 3)
    clip = p @ M[:3, :3].T + M[:3, 3]
    wcol = p @ M[3, :3].T + M[3, 3]
    ndc = clip[:, :2] / wcol[:, None]
    h, w = view_image.shape[:2]
    px = (ndc[:, 0] * 0.5 + 0.5) * (w - 1)
    py = (0.5 + 0.5 * ndc[:, 1]) * (h - 1)
    # internal buffers (depth/reliability) stay at the render resolution
    # even when the view image is larger (e.g. 4x super-resolved views)
    pxb = (ndc[:, 0] * 0.5 + 0.5) * (resolution - 1)
    pyb = (0.5 + 0.5 * ndc[:, 1]) * (resolution - 1)

    color = _bilinear_jnp(view_image, px, py).reshape(s, s, -1)
    z_tex = (clip[:, 2] / wcol).reshape(s, s)
    z_ref = _bilinear_jnp(depth_img[..., None], pxb, pyb)[:, 0].reshape(s, s)
    visible = jnp.abs(z_tex - z_ref) < z_tol
    rel_tex = _bilinear_jnp(rel_img[..., None], pxb, pyb)[:, 0].reshape(s, s)
    reliable = rel_tex > 0.999
    cosang = texel_nrm @ cam_dir
    weight = jnp.clip(cosang, 0, 1) ** cos_power
    weight = weight * covered * visible * reliable
    return color * weight[..., None], weight[..., None]


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
