"""CLI: evaluate predicted results against ground truth.

Covers both reference evaluation drivers
(reference: evaluation/evaluation.py:116-274 video metrics and
evaluation/evaluation_pcd.py:919 geometry metrics):

- ``--mode geometry``: pairs of animated GLBs -> per-frame Chamfer /
  F-score@0.02 / voxel IoU@128 after frame-0 scale-clipped ICP;
- ``--mode video``: pairs of videos -> PSNR / SSIM / LPIPS (+ FVD across the
  pair sets when >1 pair), on the 512^2 32-frame-subvideo protocol.

Results are written per pair as JSON plus an aggregate summary
(the reference writes per-pair .txt files + averages).

Usage::

    python scripts/evaluate.py --mode geometry \
        --gt-paths gt1.glb gt2.glb --result-paths p1.glb p2.glb --output eval/
    python scripts/evaluate.py --mode video \
        --gt-paths gt1.mp4 --result-paths pred1.mp4 --output eval/
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--mode", choices=["geometry", "video"], required=True)
    p.add_argument("--gt-paths", nargs="+", required=True)
    p.add_argument("--result-paths", nargs="+", required=True)
    p.add_argument("--output", default="./eval_results")
    p.add_argument("--num-points", type=int, default=50000)
    p.add_argument("--no-icp", action="store_true")
    p.add_argument("--tower-weights", default=None,
                   help="directory of converted perceptual-tower params "
                        "(clip.pkl / dreamsim.pkl / lpips.pkl / i3d.pkl — "
                        "pickled flax trees from the utils.*_convert "
                        "converters). Towers without a file run with RANDOM "
                        "weights and their metrics are tagged "
                        "untrained_tower=true.")
    args = p.parse_args(argv)

    import numpy as np
    from motion324_tpu.utils.logging import log

    if len(args.gt_paths) != len(args.result_paths):
        raise SystemExit("--gt-paths and --result-paths must pair up")
    os.makedirs(args.output, exist_ok=True)
    summaries = []

    if args.mode == "geometry":
        from motion324_tpu.evaluation.geometry import evaluate_sequence
        from motion324_tpu.io.glb import load_animated_glb

        for gt_path, pred_path in zip(args.gt_paths, args.result_paths):
            _, gt_faces, gt_frames, _ = load_animated_glb(gt_path)
            _, pr_faces, pr_frames, _ = load_animated_glb(pred_path)
            out = evaluate_sequence(gt_frames, gt_faces, pr_frames, pr_faces,
                                    num_points=args.num_points,
                                    align=not args.no_icp)
            name = os.path.splitext(os.path.basename(pred_path))[0]
            with open(os.path.join(args.output, f"{name}.json"), "w") as f:
                json.dump(out, f, indent=2)
            log(f"{name}: chamfer={out['chamfer']:.5f} "
                f"fscore={out['fscore']:.4f} iou={out['iou']:.4f}")
            summaries.append({k: out[k] for k in ("chamfer", "fscore", "iou")})
    else:
        from motion324_tpu.evaluation.clip_sim import (CLIPVisionTower,
                                                       CLIPVisionCfg,
                                                       DreamSim,
                                                       clip_similarity)
        from motion324_tpu.evaluation.video_metrics import (
            LPIPSVGG, compute_fvd, lpips_distance, prepare_video, psnr,
            split_subvideos, ssim)
        from motion324_tpu.inference.pipeline import load_video

        def tower_params(name):
            if args.tower_weights:
                path = os.path.join(args.tower_weights, f"{name}.pkl")
                if os.path.exists(path):
                    import pickle
                    with open(path, "rb") as f:
                        return pickle.load(f)
            return None

        lpips_params = tower_params("lpips")
        clip_params = tower_params("clip")
        ds_params = tower_params("dreamsim")
        lpips_model = LPIPSVGG(params=lpips_params)
        # protocol metrics (reference evaluation.py:133-203): LPIPS, CLIP
        # similarity, DreamSim per pair; FVD over the pair sets. A compact
        # tower keeps the no-weights CI path fast; converted bigG/DreamSim
        # weights slot straight into these constructors.
        if clip_params is not None:
            clip_tower = CLIPVisionTower(params=clip_params)
        else:
            clip_tower = CLIPVisionTower(CLIPVisionCfg(
                hidden=128, intermediate=256, layers=2, heads=4, patch=32,
                proj_dim=128))
        dreamsim = (DreamSim.from_params(ds_params) if ds_params is not None
                    else DreamSim())
        # perceptual metrics from RANDOM towers measure relative change only —
        # tag them so nobody compares the numbers against trained-tower runs
        # (the reference always loads released weights, evaluation.py:133-150)
        untrained = sorted(n for n, p in (("lpips", lpips_params),
                                          ("clip_sim", clip_params),
                                          ("dreamsim", ds_params))
                           if p is None)
        if untrained:
            log(f"WARNING: {', '.join(untrained)} computed with RANDOM tower "
                "weights — values are relative-only, NOT comparable to "
                "trained-tower numbers (pass --tower-weights to fix)")
        for gt_path, pred_path in zip(args.gt_paths, args.result_paths):
            gt = prepare_video(load_video(gt_path))
            pr = prepare_video(load_video(pred_path))
            t = min(len(gt), len(pr))
            rec = {
                "psnr": float(np.mean([psnr(gt[i], pr[i]) for i in range(t)])),
                "ssim": float(np.mean([ssim(gt[i], pr[i]) for i in range(t)])),
                "lpips": lpips_distance(gt[:t], pr[:t], lpips_model),
                "clip_sim": clip_similarity(gt[:t], pr[:t], tower=clip_tower),
                "dreamsim": dreamsim(gt[:t], pr[:t]),
            }
            if untrained:
                rec["untrained_tower"] = list(untrained)  # per-record copy
            name = os.path.splitext(os.path.basename(pred_path))[0]
            with open(os.path.join(args.output, f"{name}.json"), "w") as f:
                json.dump(rec, f, indent=2)
            log(f"{name}: " + " ".join(f"{k}={v:.4f}" for k, v in rec.items()
                                       if not isinstance(v, list)))
            summaries.append(rec)

        if len(args.gt_paths) > 1:
            # FVD is a distribution distance: computed across the pair SETS
            # (reference evaluation.py:200-203)
            from motion324_tpu.evaluation.i3d import i3d_feature_fn
            i3d_params = tower_params("i3d")
            fn = i3d_feature_fn(params=i3d_params)
            gts = [prepare_video(load_video(p)) for p in args.gt_paths]
            prs = [prepare_video(load_video(p)) for p in args.result_paths]
            fvd = compute_fvd(gts, prs, fn)
            if i3d_params is None:
                log("WARNING: FVD computed with a RANDOM I3D — relative-only")
                for s_ in summaries:
                    tags = s_.setdefault("untrained_tower", [])
                    if "fvd" not in tags:
                        tags.append("fvd")
            log(f"FVD over {len(gts)} pairs: {fvd:.3f}")
            for s in summaries:
                s["fvd"] = fvd

    agg = {k: float(np.mean([s[k] for s in summaries]))
           for k, v in summaries[0].items() if not isinstance(v, list)}
    summary = {"pairs": len(summaries), "mean": agg}
    if summaries and isinstance(summaries[0].get("untrained_tower"), list):
        summary["untrained_tower"] = summaries[0]["untrained_tower"]
    with open(os.path.join(args.output, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    log(f"summary over {len(summaries)} pairs: {agg}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
