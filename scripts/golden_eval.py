"""One-command golden-parity harness over the five BASELINE.json configs.

Runs every evaluation config end-to-end and emits one JSON
(``<output>/golden_eval.json``) with per-config status, wall time, and
metrics — the harness VERDICT r3 asked for so real-checkpoint parity can be
measured the moment weights appear, with a synthetic smoke mode CI runs today.

Configs (BASELINE.json):
  1. chili    — chili.glb + chili.mp4 through the 4D_from_existing path;
                result render scored against the input video (FVD / LPIPS /
                DreamSim / CLIP, the reference protocol of
                evaluation/evaluation.py:133-203).
  2. wolf     — wolf.mp4 (+ wolf.glb when present; otherwise mesh comes from
                shape gen on the first frame) through the same path.
  3. tiger    — tiger.mp4 video-only: segmentation + Hunyuan shape gen +
                motion (4D_from_video).
  4. long     — sliding-window inference over a 100+-frame sequence.
  5. train    — one dyscene-recipe training step on the local mesh
                (loss finiteness + step time).

Modes:
  smoke — synthetic assets (examples/synthetic/blob.*), random weights, tiny
          dims; exercises the same code paths and emits the same JSON shape.
          CPU-runnable: forces jax_platforms=cpu before JAX initialises.
  real  — real assets (default /root/reference/examples) + released weights.

Real mode expects these weight files under ``--weights-root`` (any may be
omitted; the dependent config then runs with random weights and is marked
``weights: random`` in the JSON):
  motion.pt                 Motion324 motion checkpoint (torch .pt,
                            utils/torch_convert.convert_motion_checkpoint), or
  motion_orbax/             an Orbax checkpoint directory from our trainer
  hy3d_dit.ckpt             Hunyuan3D-2 single-file ckpt ({'model','vae',
                            'conditioner'} — snapshot file
                            hunyuan3d-dit-v2-0/model.fp16.ckpt;
                            ShapeGenPipeline.from_hunyuan_ckpt)
  paint_unet.pt             HunyuanPaint UNet2p5D diffusers state dict
  paint_vae.pt              SD VAE state dict for the paint pipeline
  u2net.pt                  U2Net segmentation weights
  towers/ (optional)        i3d.pt / lpips_lins.pt+vgg.pt / clip.pt for
                            trained-tower metrics (untrained towers are
                            tagged in the metric JSON, evaluation/*.py)

Usage::

    python scripts/golden_eval.py --mode smoke --output /tmp/golden
    python scripts/golden_eval.py --mode real --weights-root ./weights \
        --output ./golden_real
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SYNTH = os.path.join(REPO, "examples", "synthetic")
REAL_ASSETS = "/root/reference/examples"


# --------------------------------------------------------------------------- #
def _render_result_video(glb_path: str, out_mp4: str, resolution: int,
                         n_cap: int = 64) -> str:
    """Animated GLB -> mp4 via the framework rasterizer (render_video.py)."""
    from motion324_tpu.evaluation.render_video import render_animated_glb
    from motion324_tpu.io.video import write_video

    frames = render_animated_glb(glb_path, resolution=resolution)
    return write_video(out_mp4, frames[:n_cap], fps=12)


def _video_metrics(gt_mp4: str, result_mp4: str, out_dir: str,
                   tower_weights: str | None):
    """Reference video protocol via scripts/evaluate.py (one JSON out)."""
    import evaluate
    argv = ["--mode", "video", "--gt-paths", gt_mp4,
            "--result-paths", result_mp4, "--output", out_dir]
    if tower_weights:
        argv += ["--tower-weights", tower_weights]
    evaluate.main(argv)
    with open(os.path.join(out_dir, "summary.json")) as f:
        return json.load(f)


def _maybe(path: str | None):
    return path if path and os.path.exists(path) else None


# --------------------------------------------------------------------------- #
def run_motion_config(name: str, mesh_path: str | None, video_path: str,
                      out_root: str, *, smoke: bool, checkpoint: str | None,
                      hy3d_ckpt: str | None, tower_weights: str | None,
                      max_frames: int | None, resolution: int,
                      u2net: str | None = None, paint_unet: str | None = None,
                      paint_vae: str | None = None, frames: int | None = None):
    """Configs 1/2/4 (mesh+video) and 3 (video-only when mesh_path=None)."""
    out_dir = os.path.join(out_root, name)
    os.makedirs(out_dir, exist_ok=True)
    overrides = ["training.frames=4"] if smoke else []
    if frames and not smoke:
        overrides = [f"training.frames={frames}",
                     "training.num_shape_samples=16384"]

    if mesh_path is not None:
        import inference_with_video_mesh as cli
        argv = ["--mesh", mesh_path, "--video", video_path,
                "--output", out_dir]
        if checkpoint:
            argv += ["--checkpoint", checkpoint]
        if max_frames:
            argv += ["--max-frames", str(max_frames)]
        if u2net:
            argv += ["--u2net", u2net]
        cli.main(argv + overrides)
    else:
        import inference_with_video_only as cli
        argv = ["--video", video_path, "--output", out_dir,
                "--octree-resolution", "64" if smoke else "384",
                "--steps", "3" if smoke else "50",
                "--max-faces", "2000" if smoke else "40000"]
        if smoke:
            argv += ["--shape-tiny"]
        if checkpoint:
            argv += ["--checkpoint", checkpoint]
        if max_frames:
            argv += ["--max-frames", str(max_frames)]
        if hy3d_ckpt:
            argv += ["--hy3d-ckpt", hy3d_ckpt]
        if u2net:
            argv += ["--u2net", u2net]
        if paint_unet and paint_vae:
            argv += ["--texture", "--paint-unet", paint_unet,
                     "--paint-vae", paint_vae]
        rc = cli.main(argv + overrides)
        if rc:
            return {"status": "empty_mesh",
                    "weights": "real" if hy3d_ckpt else "random"}

    glb = os.path.join(out_dir, "output_animation.glb")
    if not os.path.exists(glb):  # video-only writes under a stem subdir
        cands = [os.path.join(r, f) for r, _, fs in os.walk(out_dir)
                 for f in fs if f == "output_animation.glb"]
        if not cands:
            return {"status": "no_output_glb"}
        glb = cands[0]

    rendered = _render_result_video(glb, os.path.join(out_dir, "render.mp4"),
                                    resolution)
    metrics = _video_metrics(video_path, rendered,
                             os.path.join(out_dir, "eval"), tower_weights)
    return {"status": "ok", "result_glb": glb, "render": rendered,
            "weights": "real" if checkpoint else "random",
            "metrics": metrics}


def run_train_config(out_root: str, *, smoke: bool):
    """Config 5: one dyscene-recipe step; loss finiteness + wall time."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from motion324_tpu.config import load_config
    from motion324_tpu.models.motion_model import ModelConfig, MotionLatentModel
    from motion324_tpu.parallel.mesh import batch_sharding, make_mesh
    from motion324_tpu.training.optimizer import create_optimizer
    from motion324_tpu.training.train_step import TrainState, build_train_step

    cfg = load_config(os.path.join(REPO, "configs", "dyscene.yaml"))
    if smoke:
        cfg.training.frames = 2
        cfg.model.n_alternating_layers = 2
        cfg.model.pcd_layers = 1
    mcfg = ModelConfig.from_config(cfg, dtype="bfloat16", remat=not smoke)
    model = MotionLatentModel(mcfg)
    mesh = make_mesh()
    n_dev = mesh.devices.size
    per_chip = 1 if smoke else 32
    b = per_chip * n_dev
    t, s, n = (2, 64, 64) if smoke else (12, 4096, 4096)
    r = np.random.RandomState(0)
    f32 = lambda *shape: jnp.asarray(r.rand(*shape).astype(np.float32))
    batch = {
        "ref_shape_pcd": f32(b, s, 3), "ref_shape_normals": f32(b, s, 3),
        "ref_shape_rgbs": f32(b, s, 3), "ref_pcd": f32(b, n, 3),
        "ref_normal": f32(b, n, 3), "ref_rgb": f32(b, n, 3),
        "rgb_video": f32(b, t, mcfg.image_size, mcfg.image_size, 3),
        "point_clouds": f32(b, t, n, 3),
    }
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    tx, _ = create_optimizer(cfg)
    state = TrainState.create(params, tx)
    accum = int(cfg.training.get("grad_accum_steps", 1)) if not smoke else 1
    cfg.training.grad_accum_steps = accum
    step = build_train_step(model, tx, cfg, mesh)
    if accum > 1:
        # (accum, micro_b, ...) leading layout consumed by the accum scan
        batch = jax.tree.map(
            lambda a: a.reshape((accum, b // accum) + a.shape[1:]), batch)
        from jax.sharding import NamedSharding, PartitionSpec as P
        batch = jax.device_put(batch, NamedSharding(mesh, P(None, "dp")))
    else:
        batch = jax.device_put(batch, batch_sharding(mesh))
    state, m = step(state, batch, jax.random.PRNGKey(1))
    loss0 = float(m["loss"])  # includes compile
    t0 = time.perf_counter()
    state, m = step(state, batch, jax.random.PRNGKey(2))
    loss1 = float(m["loss"])
    dt = time.perf_counter() - t0
    ok = np.isfinite(loss0) and np.isfinite(loss1)
    return {"status": "ok" if ok else "nan_loss", "loss": loss1,
            "step_seconds": dt, "devices": n_dev,
            "samples_per_s": b / dt if dt else None}


# --------------------------------------------------------------------------- #
def main(argv=None):
    p = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--mode", choices=["smoke", "real"], required=True)
    p.add_argument("--output", default="./golden_eval_out")
    p.add_argument("--weights-root", default="./weights")
    p.add_argument("--assets-root", default=None,
                   help="real-asset dir (default /root/reference/examples)")
    p.add_argument("--configs", nargs="+", default=None,
                   choices=["chili", "wolf", "tiger", "long", "train"],
                   help="subset of configs to run (default: all five)")
    args = p.parse_args(argv)

    smoke = args.mode == "smoke"
    if smoke:
        # must happen before any JAX initialisation
        import jax
        jax.config.update("jax_platforms", "cpu")
    from motion324_tpu.utils.jit_cache import enable_compilation_cache
    enable_compilation_cache()

    assets = args.assets_root or (SYNTH if smoke else REAL_ASSETS)
    w = args.weights_root
    ckpt = None if smoke else (_maybe(os.path.join(w, "motion.pt"))
                               or _maybe(os.path.join(w, "motion_orbax")))
    hy3d = None if smoke else _maybe(os.path.join(w, "hy3d_dit.ckpt"))
    towers = None if smoke else _maybe(os.path.join(w, "towers"))
    u2net = None if smoke else _maybe(os.path.join(w, "u2net.pt"))
    paint_u = None if smoke else _maybe(os.path.join(w, "paint_unet.pt"))
    paint_v = None if smoke else _maybe(os.path.join(w, "paint_vae.pt"))

    if smoke:
        blob_glb = os.path.join(SYNTH, "blob.glb")
        blob_mp4 = os.path.join(SYNTH, "blob.mp4")
        plan = {
            "chili": dict(mesh_path=blob_glb, video_path=blob_mp4,
                          max_frames=4, resolution=64),
            "wolf": dict(mesh_path=blob_glb, video_path=blob_mp4,
                         max_frames=4, resolution=64),
            "tiger": dict(mesh_path=None, video_path=blob_mp4,
                          max_frames=4, resolution=64),
            "long": dict(mesh_path=blob_glb, video_path=blob_mp4,
                         max_frames=None, resolution=64),
        }
    else:
        # frames=256 / 16384 shape samples = the shipped inference config
        # (reference scripts/4D_from_existing.sh:55-66)
        wolf_glb = _maybe(os.path.join(assets, "wolf.glb"))
        plan = {
            "chili": dict(mesh_path=os.path.join(assets, "chili.glb"),
                          video_path=os.path.join(assets, "chili.mp4"),
                          max_frames=32, resolution=512, frames=256),
            "wolf": dict(mesh_path=wolf_glb,
                         video_path=os.path.join(assets, "wolf.mp4"),
                         max_frames=32, resolution=512, frames=256),
            "tiger": dict(mesh_path=None,
                          video_path=os.path.join(assets, "tiger.mp4"),
                          max_frames=32, resolution=512, frames=256),
            "long": dict(mesh_path=os.path.join(assets, "chili.glb"),
                         video_path=os.path.join(assets, "chili.mp4"),
                         max_frames=128, resolution=512, frames=256),
        }

    selected = args.configs or ["chili", "wolf", "tiger", "long", "train"]
    os.makedirs(args.output, exist_ok=True)
    report = {"mode": args.mode, "weights_root": None if smoke else w,
              "configs": {}}
    for name in selected:
        t0 = time.perf_counter()
        try:
            if name == "train":
                res = run_train_config(args.output, smoke=smoke)
            else:
                res = run_motion_config(
                    name, out_root=args.output, smoke=smoke, checkpoint=ckpt,
                    hy3d_ckpt=hy3d, tower_weights=towers, u2net=u2net,
                    paint_unet=paint_u, paint_vae=paint_v, **plan[name])
        except Exception:
            res = {"status": "error",
                   "traceback": traceback.format_exc(limit=12)}
        res["seconds"] = round(time.perf_counter() - t0, 2)
        report["configs"][name] = res
        print(f"[golden] {name}: {res['status']} "
              f"({res['seconds']}s)", flush=True)

    out_json = os.path.join(args.output, "golden_eval.json")
    with open(out_json, "w") as f:
        json.dump(report, f, indent=2, default=str)
    print(json.dumps({"golden_eval": out_json,
                      "ok": all(c["status"] == "ok"
                                for c in report["configs"].values())}))
    return 0 if all(c["status"] in ("ok", "empty_mesh")
                    for c in report["configs"].values()) else 1


if __name__ == "__main__":
    sys.exit(main())
