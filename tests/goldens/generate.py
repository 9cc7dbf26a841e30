"""Regenerate the conformance corpus — tiny deterministic export goldens.

Run from the repo root::

    python tests/goldens/generate.py

The corpus exists so that first contact with a real external reader
(Blender, AbcEcho/abcls, Autodesk FBX SDK, any glTF viewer) is a
five-minute check instead of an archaeology session — see
FIRST_CONTACT.md. tests/test_goldens.py asserts the committed bytes stay
reproducible from the current writers (any intentional format change must
regenerate the corpus in the same commit).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from motion324_tpu.io.abc import export_animated_abc  # noqa: E402
from motion324_tpu.io.fbx import export_animated_fbx  # noqa: E402
from motion324_tpu.io.glb import (export_animated_glb,  # noqa: E402
                                  export_glb)

HERE = os.path.dirname(os.path.abspath(__file__))

# one tetrahedron, 3 frames of rigid drift — small enough to eyeball in a
# hex dump, animated enough to exercise the time-sampled paths
V = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
F = np.array([[0, 2, 1], [0, 1, 3], [0, 3, 2], [1, 2, 3]], np.int64)
TRAJ = np.stack([V + np.float32([0.1 * t, 0, 0]) for t in range(3)])
UV = np.array([[0, 0], [1, 0], [0, 1], [1, 1]], np.float32)
TEX = np.zeros((4, 4, 3), np.uint8)
TEX[:2, :2] = (255, 0, 0)
TEX[2:, 2:] = (0, 0, 255)


def main():
    export_animated_abc(os.path.join(HERE, "tet_anim.abc"), V, F, TRAJ,
                        fps=12.0, name="tet")
    export_animated_abc(os.path.join(HERE, "tet_static.abc"), V, F,
                        name="tet")
    export_animated_fbx(os.path.join(HERE, "tet_anim.fbx"), V, F, TRAJ,
                        fps=12.0)
    export_animated_glb(os.path.join(HERE, "tet_anim.glb"), V, F, TRAJ,
                        fps=12.0)
    export_glb(os.path.join(HERE, "tet_textured.glb"), V, F, uv=UV,
               texture=TEX)
    print("wrote goldens into", HERE)


if __name__ == "__main__":
    main()
