"""Mesh and video I/O: OBJ/GLB load, animated-GLB morph-target export, sampling."""

from motion324_tpu.io.mesh import (  # noqa: F401
    TriMesh,
    load_mesh,
    normalize_unit_cube,
    sample_surface,
    sample_with_albedo,
)
from motion324_tpu.io.glb import load_glb, export_animated_glb, export_glb  # noqa: F401
