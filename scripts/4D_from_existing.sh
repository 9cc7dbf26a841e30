#!/bin/bash
# 4D animation from an existing mesh + video — drop-in equivalent of the
# reference's scripts/4D_from_existing.sh (same arguments, same defaults:
# 16384 shape samples, 256-frame window, segmentation on).
#
# Usage: ./scripts/4D_from_existing.sh <mesh.glb|.fbx> <video> <output_dir> [ckpt]
set -e

if [ $# -lt 3 ]; then
    echo "Usage: $0 <mesh_path> <video_path> <output_dir> [checkpoint]"
    echo "  mesh_path:  .glb/.obj/.fbx mesh"
    echo "  video_path: .mp4/.avi/.mov video or directory of images"
    echo "  checkpoint: optional Motion324 ckpt_*.pt or Orbax dir"
    exit 1
fi

MESH="$1"; VIDEO="$2"; OUT="$3"; CKPT="${4:-}"
SCRIPT_DIR="$(cd "$(dirname "$0")" && pwd)"
cd "$(dirname "$SCRIPT_DIR")"

[ -f "$MESH" ] || { echo "Error: mesh not found: $MESH"; exit 1; }
[ -e "$VIDEO" ] || { echo "Error: video not found: $VIDEO"; exit 1; }
mkdir -p "$OUT"

CKPT_ARGS=()
[ -n "$CKPT" ] && CKPT_ARGS=(--checkpoint "$CKPT")

python scripts/inference_with_video_mesh.py \
    --mesh "$MESH" --video "$VIDEO" --output "$OUT" \
    --config configs/dyscene.yaml \
    "${CKPT_ARGS[@]}" \
    training.num_shape_samples=16384 \
    training.frames=256

echo "Animation output: $OUT"
