"""CLI: batch image -> mesh (+texture) generation with workload sharding.

Equivalent of the reference's ``scripts/hunyuan_Gen.py`` orchestrator
(reference: hunyuan_Gen.py:105-222): scan ``*_processed/masked_rgb``
directories, split the workload across ``--N`` shards by greedy size
balancing (:126-137), and for each first-frame image run shape generation,
mesh cleanup (floaters/degenerate/decimation, :197-200) and optionally the
texture pipeline, exporting GLBs.

Usage::

    python scripts/generate_assets.py --input-root data/ --N 4 --n 0
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def greedy_shards(items_with_cost: list[tuple], n_shards: int):
    """Greedy balanced assignment: heaviest first onto the lightest shard
    (reference hunyuan_Gen.py:126-137). Items are opaque; cost is the
    second tuple element."""
    shards: list[list] = [[] for _ in range(n_shards)]
    loads = [0] * n_shards
    for item, cost in sorted(items_with_cost, key=lambda x: -x[1]):
        i = loads.index(min(loads))
        shards[i].append(item)
        loads[i] += cost
    return shards


def _natural_key(name: str):
    """Digit runs compare numerically (reference natsorted alg=ns.PATH,
    hunyuan_Gen.py:178): 'frame_2.jpg' < 'frame_10.jpg' even unpadded."""
    import re
    return [int(tok) if tok.isdigit() else tok
            for tok in re.split(r"(\d+)", name)]


def scan_jobs(input_root: str, skip: int):
    """``(frame paths, clip length)`` per ``*_processed/masked_rgb`` clip —
    every ``skip``'th frame of each clip gets its own generation job
    (reference hunyuan_Gen.py:180); cost for shard balancing is the clip's
    full frame count."""
    if skip < 1:
        raise ValueError(f"--skip must be >= 1, got {skip}")
    jobs = []
    for name in sorted(os.listdir(input_root)):
        rgb_dir = os.path.join(input_root, name, "masked_rgb")
        if os.path.isdir(rgb_dir):
            frames = sorted(os.listdir(rgb_dir), key=_natural_key)
            picked = [os.path.join(rgb_dir, f)
                      for i, f in enumerate(frames) if i % skip == 0]
            if picked:
                jobs.append((tuple(picked), len(frames)))
    return jobs


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input-root", required=True)
    p.add_argument("--output", default="./generated_assets")
    p.add_argument("--N", type=int, default=1, help="total shards")
    p.add_argument("--n", type=int, default=0, help="this shard index")
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--octree-resolution", type=int, default=384)
    p.add_argument("--max-faces", type=int, default=40000)
    p.add_argument("--texture", action="store_true")
    p.add_argument("--skip", type=int, default=256,
                   help="generate a mesh for every N-th frame of each job "
                        "(reference hunyuan_Gen.py:98,180 — frame 0 only at "
                        "the default when clips are shorter than N)")
    p.add_argument("--seed", type=int, default=42,
                   help="diffusion sampling seed, re-applied per image "
                        "(reference hunyuan_Gen.py:97,194)")
    p.add_argument("--mv", action="store_true",
                   help="multiview conditioning: each job dir provides a "
                        "views/ folder with front/left/back/right images "
                        "(reference MVImageProcessorV2 + DinoImageEncoderMV)")
    args = p.parse_args(argv)
    if args.skip < 1:
        p.error(f"--skip must be >= 1, got {args.skip}")

    from motion324_tpu.utils.jit_cache import enable_compilation_cache
    enable_compilation_cache()

    import numpy as np
    from PIL import Image

    from motion324_tpu.hy3dgen.paint_pipeline import PaintPipeline
    from motion324_tpu.hy3dgen.postprocess import (reduce_faces,
                                                   remove_degenerate,
                                                   remove_floaters)
    from motion324_tpu.hy3dgen.shape_pipeline import ShapeGenPipeline
    from motion324_tpu.io.glb import export_glb
    from motion324_tpu.utils.logging import log

    jobs = scan_jobs(args.input_root, args.skip)
    if not jobs:
        log(f"no *_processed/masked_rgb jobs under {args.input_root}")
        return 1
    mine = greedy_shards(jobs, args.N)[args.n]
    log(f"shard {args.n}/{args.N}: {len(mine)} of {len(jobs)} jobs")

    pipe = ShapeGenPipeline.init_random(
        conditioner_type="mv" if args.mv else "single")

    def _load(path):
        return np.asarray(Image.open(path).convert("RGB"),
                          dtype=np.float32) / 255.0

    def _mv_views(img_path):
        """views/{front,left,back,right}.* next to masked_rgb."""
        views_dir = os.path.join(os.path.dirname(os.path.dirname(img_path)),
                                 "views")
        found = {}
        if os.path.isdir(views_dir):
            for f in sorted(os.listdir(views_dir)):
                tag = os.path.splitext(f)[0].lower()
                if tag in ("front", "left", "back", "right"):
                    found[tag] = _load(os.path.join(views_dir, f))
        return found
    painter = PaintPipeline() if args.texture else None
    os.makedirs(args.output, exist_ok=True)
    work = [(p, len(fp) > 1) for fp in mine for p in fp]
    for img_path, multi_frame in work:
        stem = img_path.split(os.sep)[-3].replace("_processed", "")
        if multi_frame:  # one mesh per selected frame
            stem += "_" + os.path.splitext(os.path.basename(img_path))[0]
        image = _load(img_path)
        if args.mv:
            views = _mv_views(img_path)
            if not views:
                views = {"front": image}
            cond_input = views
            image = views.get("front", image)  # paint reference view
        else:
            cond_input = image
        mesh = pipe(cond_input, num_inference_steps=args.steps,
                    octree_resolution=args.octree_resolution,
                    seed=args.seed)
        if not len(mesh.faces):
            log(f"{stem}: empty mesh, skipping")
            continue
        if len(mesh.faces) > 4_000_000:  # noise-level output guard
            mesh = reduce_faces(mesh, 2_000_000, method="cluster")
        mesh = reduce_faces(remove_degenerate(remove_floaters(mesh)),
                            args.max_faces)
        if painter is not None:
            mesh = painter(mesh, image)
        out = os.path.join(args.output, f"{stem}.glb")
        export_glb(out, mesh.vertices, mesh.faces, uv=mesh.uv,
                   texture=mesh.texture)
        log(f"{stem}: wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
