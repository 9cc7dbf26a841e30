"""Benchmark the paint stack at product dims on the local device.

VERDICT r4 item 3: the multiview texture UNet had never been timed at the
reference's product configuration — 6 ortho views, 512^2 diffusion, 30
Euler-Ancestral CFG steps (reference texgen/pipelines.py:40-47,
multiview_utils.py:28,84) — nor had the LCM/turbo few-step variant. This
times, with random full-dim weights (SD-2-class UNet2p5D 320/640/1280/1280,
context 1024):

  1. ``paint_unet_30step_sec``  — the 30-step 6-view diffusion loop alone
     (VAE encodes + denoise loop + VAE decodes), the dominant phase;
  2. ``paint_lcm_8step_sec``    — the same with the LCM sampler at 8 steps;
  3. ``paint_e2e_sec``          — the full PaintPipeline: UV unwrap, 6 view
     renders, diffusion, back-projection bake, inpaint (host + device).

Prints one JSON line; numbers feed BENCH_extra.json's paint section and the
tiger-path budget in BASELINE.md.

Usage::

    python scripts/bench_paint.py [--resolution 512] [--steps 30] [--faces 20000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--lcm-steps", type=int, default=8)
    p.add_argument("--faces", type=int, default=20000,
                   help="test-mesh face count for the e2e phase")
    p.add_argument("--texture-size", type=int, default=2048)
    p.add_argument("--skip-e2e", action="store_true")
    p.add_argument("--out-json", default=None,
                   help="merge results into this JSON file (BENCH_extra)")
    args = p.parse_args(argv)

    from motion324_tpu.utils.jit_cache import enable_compilation_cache
    enable_compilation_cache()

    import numpy as np

    from motion324_tpu.hy3dgen.paint_diffusion import MultiviewDiffusion

    res = {}
    rng = np.random.RandomState(0)
    ref = rng.rand(args.resolution, args.resolution, 3).astype(np.float32)
    control = rng.rand(6, args.resolution, args.resolution, 6).astype(
        np.float32)

    print(f"init UNet2p5D at SD-2 dims, {args.resolution}^2 latents...",
          file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    mv = MultiviewDiffusion.init_random(image_size=args.resolution)
    print(f"init: {time.perf_counter() - t0:.1f}s", file=sys.stderr,
          flush=True)

    def timed(label, fn, key):
        t0 = time.perf_counter()
        out = fn()
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        fn()
        steady = time.perf_counter() - t0
        print(f"{label}: {steady:.2f}s steady ({compile_s:.1f}s incl. "
              f"compile)  out {np.shape(out)}", file=sys.stderr, flush=True)
        res[key] = round(steady, 2)
        res[key + "_incl_compile"] = round(compile_s, 2)
        return out

    timed(f"6-view {args.steps}-step Euler-Ancestral CFG @{args.resolution}^2",
          lambda: mv.generate(ref, control, num_steps=args.steps),
          "paint_unet_30step_sec")
    timed(f"6-view {args.lcm_steps}-step LCM turbo @{args.resolution}^2",
          lambda: mv.generate(ref, control, num_steps=args.lcm_steps,
                              sampler="lcm"),
          "paint_lcm_8step_sec")

    if not args.skip_e2e:
        from motion324_tpu.hy3dgen.paint_pipeline import PaintPipeline
        from motion324_tpu.io.mesh import TriMesh

        # deformed-sphere test mesh at the requested face budget
        n_side = max(8, int(np.sqrt(args.faces / 2)) + 1)
        u, v = np.meshgrid(np.linspace(0, 2 * np.pi, n_side),
                           np.linspace(0.1, np.pi - 0.1, n_side))
        verts = np.stack([np.sin(v) * np.cos(u), np.sin(v) * np.sin(u),
                          np.cos(v)], -1).reshape(-1, 3).astype(np.float32)
        verts *= (1 + 0.15 * np.sin(3 * verts[:, :1]))
        faces = []
        for r in range(n_side - 1):
            for c in range(n_side - 1):
                a = r * n_side + c
                faces.append([a, a + n_side, a + 1])  # outward winding
                faces.append([a + 1, a + n_side, a + n_side + 1])
        mesh = TriMesh(vertices=verts, faces=np.asarray(faces, np.int64))

        painter = PaintPipeline(multiview_model=mv,
                                resolution=args.resolution,
                                texture_size=args.texture_size,
                                delight=False)
        t0 = time.perf_counter()
        out = painter(mesh, ref)
        e2e = time.perf_counter() - t0
        # second call = steady state: raster/diffusion/bake programs for
        # this face count are compiled now (per-mesh host work — unwrap,
        # inpaint — still runs, as it would per asset)
        t0 = time.perf_counter()
        out = painter(mesh, ref)
        e2e_steady = time.perf_counter() - t0
        print(f"paint e2e ({len(mesh.faces)} faces, texture "
              f"{args.texture_size}^2): {e2e_steady:.1f}s steady "
              f"({e2e:.1f}s incl. compile)  texture {np.shape(out.texture)}",
              file=sys.stderr, flush=True)
        res["paint_e2e_sec"] = round(e2e_steady, 2)
        res["paint_e2e_sec_incl_compile"] = round(e2e, 2)

    if args.out_json:
        merged = {}
        if os.path.exists(args.out_json):
            with open(args.out_json) as f:
                merged = json.load(f)
        merged["paint"] = res
        with open(args.out_json, "w") as f:
            json.dump(merged, f, indent=1)
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    sys.exit(main())
