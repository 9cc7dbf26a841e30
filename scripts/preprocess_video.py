"""CLI: video -> segmented 512^2 frame crops (black background).

Equivalent of the reference's ``utils/rmbg_for_black_bg.py`` CLI (reference:
rmbg_for_black_bg.py:262-392): frame extraction, per-frame background removal,
global bounding box over ALL frames, crop+pad to 512^2. ``--split-only``
extracts frames without segmentation (reference main_split_only :341-381).

Usage::

    python scripts/preprocess_video.py --input video.mp4 --output out_dir
        [--split-only] [--size 512] [--max-frames N]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True)
    p.add_argument("--output", default=None)
    p.add_argument("--split-only", action="store_true")
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--max-frames", type=int, default=None)
    p.add_argument("--model", choices=("heuristic", "u2net", "isnet"),
                   default="heuristic",
                   help="segmentation network; the reference CLI uses "
                        "isnet-general-use (rmbg_for_black_bg.py:26). "
                        "u2net/isnet need --weights (a torch .pth, converted "
                        "on load); without weights the border-statistics "
                        "heuristic runs.")
    p.add_argument("--weights", default=None,
                   help="torch checkpoint for --model u2net/isnet")
    args = p.parse_args(argv)

    import numpy as np
    from PIL import Image

    from motion324_tpu.inference.pipeline import load_video
    from motion324_tpu.inference.preprocess import preprocess_video_frames
    from motion324_tpu.utils.logging import log

    stem = os.path.splitext(os.path.basename(args.input))[0]
    out_dir = args.output or f"{stem}_processed"
    frames = load_video(args.input, args.max_frames)
    log(f"loaded {len(frames)} frames from {args.input}")

    if args.split_only:
        frame_dir = os.path.join(out_dir, "frames")
        os.makedirs(frame_dir, exist_ok=True)
        for t, f in enumerate(frames):
            Image.fromarray((f * 255).astype(np.uint8)).save(
                os.path.join(frame_dir, f"frame_{t:04d}.png"))
        log(f"wrote {len(frames)} raw frames to {frame_dir}")
        return 0

    params = model = None
    if args.model != "heuristic":
        if args.weights:
            from motion324_tpu.inference.segmentation import ISNet, U2Net
            from motion324_tpu.utils.torch_convert import (
                convert_isnet, convert_u2net, load_torch_state_dict)
            sd = load_torch_state_dict(args.weights)
            if args.model == "isnet":
                params, model = convert_isnet(sd), ISNet()
            else:
                params, model = convert_u2net(sd), U2Net()
            log(f"{args.model} weights converted from {args.weights}")
        else:
            log(f"WARNING: --model {args.model} without --weights — "
                "falling back to the border-statistics heuristic")

    masked, masks, bbox = preprocess_video_frames(frames, size=args.size,
                                                  params=params, model=model)
    rgb_dir = os.path.join(out_dir, "masked_rgb")
    mask_dir = os.path.join(out_dir, "masks")
    os.makedirs(rgb_dir, exist_ok=True)
    os.makedirs(mask_dir, exist_ok=True)
    for t in range(len(masked)):
        Image.fromarray((masked[t] * 255).astype(np.uint8)).save(
            os.path.join(rgb_dir, f"frame_{t:04d}.png"))
        Image.fromarray((masks[t] * 255).astype(np.uint8)).save(
            os.path.join(mask_dir, f"frame_{t:04d}.png"))
    log(f"wrote {len(masked)} masked crops to {rgb_dir} (bbox={bbox})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
