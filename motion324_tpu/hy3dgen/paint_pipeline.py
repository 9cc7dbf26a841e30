"""Texture painting pipeline: mesh + reference image -> textured mesh.

TPU-native counterpart of the reference's ``Hunyuan3DPaintPipeline``
(reference: scripts/hy3dgen/texgen/pipelines.py:188-237):

1. UV-unwrap the mesh (:mod:`motion324_tpu.hy3dgen.uv_unwrap`, xatlas
   equivalent returning a vmapping);
2. render normal + position maps for the six baking cameras
   (azims 0/90/180/270 + top/bottom at weights 1/0.1/0.5/0.1/0.05/0.05,
   reference pipelines.py:40-42) with the Pallas rasterizer;
3. generate per-view RGB with a pluggable multiview model (the HunyuanPaint
   SD UNet port slots in here; the default synthesizer reprojects the
   conditioning image and lambertian-shades the rest so the pipeline is
   runnable end-to-end without diffusion weights);
4. back-project each view into UV space with cos^4 weighting and merge
   (fast-bake, reference mesh_render.py:653-798);
5. inpaint seams: native C++ vertex diffusion + image-space hole fill
   (reference mesh_render.py:800-823).
"""

from __future__ import annotations

from typing import Callable

import numpy as np

from motion324_tpu.hy3dgen.camera import DEFAULT_VIEWS
from motion324_tpu.hy3dgen.mesh_render import MeshRenderer
from motion324_tpu.hy3dgen.uv_unwrap import unwrap_uv
from motion324_tpu.io.mesh import TriMesh
from motion324_tpu.native import vertex_inpaint
from motion324_tpu.utils.logging import log

__all__ = ["PaintPipeline", "reprojection_texturizer"]


def reprojection_texturizer(cond_image: np.ndarray, views,
                            renders: list[dict]) -> list[np.ndarray]:
    """Weight-free view synthesizer: the front view reuses the conditioning
    image; other views get a lambertian shading of the mesh normals modulated
    by the conditioning image's mean color. Placeholder for the multiview
    diffusion UNet (same call signature)."""
    mean_color = cond_image.reshape(-1, 3).mean(axis=0)
    out = []
    for i, ((azim, elev, _), rnd) in enumerate(zip(views, renders)):
        h, w = rnd["mask"].shape
        if i == 0:
            import cv2
            img = cv2.resize(cond_image, (w, h), interpolation=cv2.INTER_AREA)
        else:
            shade = np.clip(rnd["normal"] @ np.array([0.3, 0.5, 0.8]), 0, 1)
            img = (0.4 + 0.6 * shade[..., None]) * mean_color[None, None]
        out.append((img * rnd["mask"][..., None]).astype(np.float32))
    return out


class PaintPipeline:
    """mesh + image -> textured mesh.

    The DEFAULT view synthesizer is the multiview diffusion pipeline
    (:class:`motion324_tpu.hy3dgen.paint_diffusion.MultiviewDiffusion`, the
    HunyuanPaint equivalent — reference texgen/pipelines.py:188-237) whenever
    ``multiview_params`` (converted weights) are supplied; without weights the
    pipeline falls back to the weight-free reprojection synthesizer so it
    stays runnable end-to-end, with a logged warning.

    ``delight=True`` runs shadow/highlight removal on the conditioning image
    before synthesis, as the reference does (dehighlight_utils.py:22-110).
    """

    def __init__(self, multiview_model: Callable | None = None,
                 multiview_params: dict | None = None,
                 resolution: int = 512, texture_size: int = 2048,
                 delight: bool = True, super_resolution: bool = False,
                 upscaler=None, interpret: bool = False):
        # texture_size 2048 matches the reference's shipped config
        # (texgen/pipelines.py:45-47); views render/diffuse at 512^2.
        if multiview_model is None and multiview_params is not None:
            from motion324_tpu.hy3dgen.paint_diffusion import MultiviewDiffusion
            multiview_model = MultiviewDiffusion(multiview_params)
        if multiview_model is None:
            log("PaintPipeline: no multiview diffusion weights — using the "
                "weight-free reprojection synthesizer")
            multiview_model = reprojection_texturizer
        self.multiview_model = multiview_model
        self.resolution = resolution
        self.texture_size = texture_size
        self.delight = delight
        # per-view 4x upscale before baking; OFF by default, matching the
        # reference, which ships Image_Super_Net commented out
        # (texgen/pipelines.py:103,222)
        self.super_resolution = super_resolution
        self.upscaler = upscaler
        self.interpret = interpret

    def __call__(self, mesh: TriMesh, image: np.ndarray,
                 views=None) -> TriMesh:
        views = views if views is not None else DEFAULT_VIEWS
        if self.delight:
            from motion324_tpu.hy3dgen.delight import delight_image
            image = delight_image(np.asarray(image, np.float32))
        unwrapped, vmapping = unwrap_uv(mesh, self.texture_size)
        # normalize INTO the renderer's canonical box (the reference's
        # set_mesh does the same before rendering, mesh_render.py:233-261):
        # the orbit cameras' ortho frustum is 1.2 wide, so a mesh spanning
        # e.g. [-1, 1] (the shape-gen decode box) otherwise overflows every
        # view and the bake covers ~0% of the atlas. Texture baking happens
        # in UV space, so the OUTPUT keeps the original coordinates.
        v = unwrapped.vertices
        center = (v.max(0) + v.min(0)) / 2
        half = float(np.abs(v - center).max()) or 1.0
        render_mesh = unwrapped.with_vertices(
            ((v - center) * (0.45 / half)).astype(np.float32))
        renderer = MeshRenderer(render_mesh, resolution=self.resolution,
                                texture_size=self.texture_size,
                                interpret=self.interpret)

        renders = [renderer.render_view(elev, azim)
                   for azim, elev, _ in views]
        view_images = self.multiview_model(image, views, renders)

        if self.super_resolution:
            # per-view 4x SR before baking (back_project samples each view
            # image by its own resolution, so no other stage changes)
            if self.upscaler is None:
                from motion324_tpu.hy3dgen.super_resolution import Upscaler
                self.upscaler = Upscaler(params=None)
            view_images = [self.upscaler(v) for v in view_images]

        texture, covered = renderer.bake(view_images, views)

        # seam inpaint: diffuse colors over the mesh graph (native C++), then
        # Navier-Stokes image inpaint for the remaining holes — the same
        # two-stage treatment as the reference's uv_inpaint
        # (mesh_render.py:800-823: meshVerticeInpaint + cv2.INPAINT_NS)
        mask = (covered * 255).astype(np.uint8)
        texture, mask = vertex_inpaint(
            texture.astype(np.float32), mask,
            unwrapped.vertices.astype(np.float32),
            unwrapped.uv.astype(np.float32),
            unwrapped.faces.astype(np.int32),
            unwrapped.faces.astype(np.int32))
        hole = mask == 0
        if hole.any() and (~hole).any():
            import cv2
            tex_u8 = (np.clip(texture, 0, 1) * 255).astype(np.uint8)
            tex_u8 = cv2.inpaint(tex_u8, (255 - mask).astype(np.uint8), 3,
                                 cv2.INPAINT_NS)
            texture = tex_u8.astype(np.float32) / 255.0

        log(f"texture baked: {self.texture_size}^2, "
            f"{(~hole).mean() * 100:.0f}% covered")
        out = TriMesh(vertices=unwrapped.vertices, faces=unwrapped.faces,
                      uv=unwrapped.uv, texture=np.clip(texture, 0, 1))
        out.vmapping = vmapping  # type: ignore[attr-defined]
        return out
