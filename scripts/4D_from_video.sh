#!/bin/bash
# Video -> 4D animation — drop-in equivalent of the reference's
# scripts/4D_from_video.sh: background removal + frame split, image->mesh
# generation, texture, motion, FBX/GLB export. Our inference_with_video_only
# runs the whole chain in one process (the reference chains three scripts).
#
# Usage: ./scripts/4D_from_video.sh <input_video> [--split_only] [ckpt]
set -e

if [ $# -lt 1 ]; then
    echo "Usage: $0 <input_video> [--split_only] [checkpoint]"
    exit 1
fi

INPUT="$1"; shift || true
SPLIT_ONLY="false"; CKPT=""
for a in "$@"; do
    if [ "$a" = "--split_only" ] || [ "$a" = "--split-only" ]; then
        SPLIT_ONLY="true"
    else
        CKPT="$a"
    fi
done

SCRIPT_DIR="$(cd "$(dirname "$0")" && pwd)"
cd "$(dirname "$SCRIPT_DIR")"
[ -f "$INPUT" ] || { echo "Error: video not found: $INPUT"; exit 1; }

NAME="$(basename "$INPUT" | sed 's/\.[^.]*$//')"
BASE="$(dirname "$INPUT")"
PROCESSED="$BASE/${NAME}_processed"

echo "Step 1: background removal + frame extraction -> $PROCESSED"
if [ "$SPLIT_ONLY" = "true" ]; then
    python scripts/preprocess_video.py --input "$INPUT" --split-only
    echo "Split-only mode: done."
    exit 0
fi
python scripts/preprocess_video.py --input "$INPUT"

CKPT_ARGS=()
[ -n "$CKPT" ] && CKPT_ARGS=(--checkpoint "$CKPT")

echo "Step 2: mesh generation + texture + motion -> $PROCESSED/animation"
python scripts/inference_with_video_only.py \
    --video "$INPUT" --output "$PROCESSED/animation" \
    --config configs/dyscene.yaml --texture \
    "${CKPT_ARGS[@]}" \
    training.num_shape_samples=16384 \
    training.num_pcd_samples=4096 \
    training.frames=256

echo "Animation output: $PROCESSED/animation"
