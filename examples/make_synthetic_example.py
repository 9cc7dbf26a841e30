"""Generate a synthetic example asset pair (textured mesh GLB + video).

Stands in for the reference's ``examples/`` clips (chili.glb+mp4 etc., which
are binary assets not reproducible here): writes an icosphere-ish mesh with a
procedural texture and a short video of a deforming render silhouette, enough
to drive both inference CLIs end to end.

Usage: ``python examples/make_synthetic_example.py [--out examples/synthetic]``
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def icosphere(subdiv: int = 2):
    t = (1 + 5 ** 0.5) / 2
    v = np.array([
        [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
        [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
        [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
    ], np.float64)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    f = np.array([
        [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
        [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
        [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
        [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
    ], np.int64)
    for _ in range(subdiv):
        cache = {}
        verts = list(v)

        def mid(a, b):
            key = (min(a, b), max(a, b))
            if key not in cache:
                m = (verts[a] + verts[b]) / 2
                m /= np.linalg.norm(m)
                cache[key] = len(verts)
                verts.append(m)
            return cache[key]

        nf = []
        for a, b, c in f:
            ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
            nf += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        v = np.asarray(verts)
        f = np.asarray(nf, np.int64)
    return v.astype(np.float32) * 0.4, f


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default=os.path.join(os.path.dirname(__file__),
                                                 "synthetic"))
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--size", type=int, default=224)
    args = p.parse_args(argv)
    os.makedirs(args.out, exist_ok=True)

    from motion324_tpu.io.glb import export_glb
    from motion324_tpu.hy3dgen.mesh_render import MeshRenderer
    from motion324_tpu.io.mesh import TriMesh

    verts, faces = icosphere(2)
    # procedural vertex colors
    colors = (verts / 0.8 + 0.5).clip(0, 1)
    mesh_path = os.path.join(args.out, "blob.glb")
    export_glb(mesh_path, verts, faces, vertex_colors=colors)

    # video: render the mesh bouncing (squash-and-stretch along z)
    frames = []
    for t in range(args.frames):
        phase = np.sin(2 * np.pi * t / args.frames)
        squash = np.array([1 + 0.15 * phase, 1 + 0.15 * phase,
                           1 - 0.25 * phase], np.float32)
        deformed = TriMesh(vertices=verts * squash, faces=faces,
                           vertex_colors=colors)
        r = MeshRenderer(deformed, resolution=args.size)
        view = r.render_view(elev=10, azim=0)
        img = (view["normal"] * 0.5 + 0.5) * view["mask"][..., None]
        frames.append((img * 255).astype(np.uint8))

    from motion324_tpu.io.video import write_video
    video_path = write_video(os.path.join(args.out, "blob.mp4"),
                             np.stack(frames), fps=8)
    print(f"wrote {mesh_path} and {video_path}")
    print("try: python scripts/inference_with_video_mesh.py "
          f"--mesh {mesh_path} --video {video_path} --output outputs/blob "
          "training.frames=12 training.num_shape_samples=4096")


if __name__ == "__main__":
    main()
