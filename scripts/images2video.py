"""CLI: image folder -> mp4 (reference: scripts/images2video.py:16-81).

Usage: ``python scripts/images2video.py --input frames/ --output out.mp4 [--fps 12]``
Frames are sorted naturally (frame_2 before frame_10).
"""

from __future__ import annotations

import argparse
import os
import re
import sys


def natural_key(name: str):
    return [int(t) if t.isdigit() else t.lower()
            for t in re.split(r"(\d+)", name)]


def images_to_video(input_dir: str, output_path: str, fps: int = 12) -> str:
    import imageio.v3 as iio
    import numpy as np

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from motion324_tpu.io.video import write_video

    names = sorted((n for n in os.listdir(input_dir)
                    if n.lower().endswith((".png", ".jpg", ".jpeg"))),
                   key=natural_key)
    if not names:
        raise FileNotFoundError(f"no images in {input_dir}")
    frames = np.stack([iio.imread(os.path.join(input_dir, n))[..., :3]
                       for n in names])
    return write_video(output_path, frames, fps=fps)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--fps", type=int, default=12)
    args = p.parse_args(argv)
    out = images_to_video(args.input, args.output, args.fps)
    print(f"wrote {out}")


if __name__ == "__main__":
    sys.exit(main())
