"""Convert OBJ / GLB (static or morph-target-animated) to binary FBX.

The TPU-repo counterpart of the reference's Blender-based converter
(reference: utils/convert_fbx.py — bpy mesh + shape keys; utils/render.py:
117-200 shape-key-per-frame scheme). Here the native binary FBX codec
(:mod:`motion324_tpu.io.fbx`) writes the file directly: no Blender process,
independent OBJ v/vt indices are re-welded per corner by the OBJ loader, and
animated GLB inputs carry their morph targets over as per-frame blend shapes.

Usage:
  python scripts/convert_fbx.py input.obj [-o out.fbx]
  python scripts/convert_fbx.py output_animation.glb -o anim.fbx --fps 12
  python scripts/convert_fbx.py output_animation.glb -o anim.abc   # Alembic
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def convert(in_path: str, out_path: str,
            fps: float | None = None) -> str:
    from motion324_tpu.io.fbx import export_animated_fbx
    from motion324_tpu.io.glb import load_animated_glb
    from motion324_tpu.io.mesh import load_mesh

    frames = None
    uv = None
    if in_path.lower().endswith((".glb", ".gltf")):
        try:
            verts, faces, frames, times = load_animated_glb(in_path)
            if fps is None:
                import numpy as np
                dt = np.diff(np.asarray(times))
                fps = float(1.0 / np.median(dt)) if len(dt) else 12.0
            # the animated loader carries positions only; pull UVs from the
            # same primitive so textured assets keep their UV layer
            uv = load_mesh(in_path).uv
        except (KeyError, ValueError, StopIteration):
            mesh = load_mesh(in_path)  # static / non-animated GLB
            verts, faces, uv = mesh.vertices, mesh.faces, mesh.uv
    else:
        mesh = load_mesh(in_path)
        verts, faces, uv = mesh.vertices, mesh.faces, mesh.uv
    fps = 12.0 if fps is None else fps

    name = os.path.splitext(os.path.basename(in_path))[0]
    if out_path.lower().endswith(".abc"):
        # Alembic output (reference render.py's export_format='abc' slot)
        from motion324_tpu.io.abc import export_animated_abc
        export_animated_abc(out_path, verts, faces, trajectories=frames,
                            fps=fps, name=name)
        return out_path
    export_animated_fbx(out_path, verts, faces, frames=frames, fps=fps,
                        uv=uv, name=name)
    kind = f"{len(frames)} blend-shape frames" if frames is not None \
        else "static"
    print(f"{in_path} -> {out_path} ({len(verts)} verts, {kind})")
    return out_path


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("input", help=".obj / .glb / .gltf input")
    ap.add_argument("-o", "--output", default=None,
                    help="output .fbx path (default: input with .fbx)")
    ap.add_argument("--fps", type=float, default=None,
                    help="animation frame rate for blend-shape curves "
                         "(default: derived from the GLB keyframe times, "
                         "else 12)")
    args = ap.parse_args(argv)
    out = args.output or os.path.splitext(args.input)[0] + ".fbx"
    convert(args.input, out, fps=args.fps)


if __name__ == "__main__":
    sys.exit(main())
