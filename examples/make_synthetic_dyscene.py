"""Generate a tiny Dyscene16k-format dataset for driving train.py.

Layout matches the reference dataset contract (reference: dataset/dyscene.py:14,
SURVEY.md 2.1): pcds/<obj>_pointclouds/{frame_*.npy,faces.npy,
uv_face_texture.npz} + all_images/<obj>_images/camera_{0..14}/frame_*.jpg.

Usage: python examples/make_synthetic_dyscene.py /tmp/dyscene_tiny
Then:  python train.py --config configs/dyscene.yaml \
           training.dataset_path=/tmp/dyscene_tiny training.dataset_begin=0 ...
"""

import os, sys
import numpy as np
from PIL import Image
root = sys.argv[1]
CUBE_V = np.array([[0,0,0],[1,0,0],[1,1,0],[0,1,0],[0,0,1],[1,0,1],[1,1,1],[0,1,1]], np.float32)
CUBE_F = np.array([[0,2,1],[0,3,2],[4,5,6],[4,6,7],[0,1,5],[0,5,4],[2,3,7],[2,7,6],[1,2,6],[1,6,5],[3,0,4],[3,4,7]], np.int64)
for obj in ("obj_a", "obj_b", "obj_c", "obj_d"):
    pdir = os.path.join(root, "pcds", f"{obj}_pointclouds")
    os.makedirs(pdir, exist_ok=True)
    np.save(os.path.join(pdir, "faces.npy"), CUBE_F)
    np.savez(os.path.join(pdir, "uv_face_texture.npz"),
             face_uvs=np.random.RandomState(0).rand(12,3,2).astype(np.float32),
             texture_array=(np.random.RandomState(1).rand(8,8,3)*255).astype(np.float32))
    for t in range(16):
        np.save(os.path.join(pdir, f"frame_{t:04d}.npy"), CUBE_V + 0.01*t)
    for c in range(15):
        idir = os.path.join(root, "all_images", f"{obj}_images", f"camera_{c}")
        os.makedirs(idir, exist_ok=True)
        for t in range(16):
            Image.fromarray(np.full((28,28,3), (t*10)%255, np.uint8)).save(
                os.path.join(idir, f"frame_{t:04d}.jpg"))
print("dataset at", root)
