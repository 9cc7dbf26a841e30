"""Mesh and video I/O: OBJ/GLB load, animated-GLB morph-target export, sampling."""

from motion324_tpu.io.mesh import (  # noqa: F401
    TriMesh,
    load_mesh,
    normalize_unit_cube,
    sample_surface,
    sample_with_albedo,
)
from motion324_tpu.io.glb import (  # noqa: F401
    load_glb,
    load_animated_glb,
    export_animated_glb,
    export_glb,
)
from motion324_tpu.io.video import read_video, write_video  # noqa: F401
