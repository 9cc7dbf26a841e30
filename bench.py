"""Benchmark: end-to-end model inference seconds per 32-frame clip on one chip.

Measures the flagship MotionLatentModel (768-d, DINOv2-B/14, bf16) running the
full per-clip compute of the `4D_from_existing` path: shape encoding of 16384
textured surface samples, video encoding of 32 frames, and decoding of 16384
query points (4x4096 chunks) — the device work between video-in and
trajectories-out. Prints one JSON line; ``vs_baseline`` is the ratio to the
5 s/clip BASELINE target (lower is better, <1 beats the target).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

TARGET_SEC = 5.0
T, N_SHAPE, N_PTS, CHUNK = 32, 16384, 16384, 4096


def main():
    from motion324_tpu.models.motion_model import ModelConfig, MotionLatentModel

    cfg = ModelConfig(dtype=jnp.bfloat16, frames=12)
    model = MotionLatentModel(cfg)

    r = np.random.RandomState(0)
    f32 = lambda *s: jnp.asarray(r.rand(*s).astype(np.float32))
    shape_args = (f32(1, N_SHAPE, 3), f32(1, N_SHAPE, 3), f32(1, N_SHAPE, 3))
    video = f32(1, T, 224, 224, 3)
    pts = (f32(1, N_PTS, 3), f32(1, N_PTS, 3), f32(1, N_PTS, 3))

    params = jax.jit(model.init)(jax.random.PRNGKey(0), {
        "ref_shape_pcd": shape_args[0], "ref_shape_normals": shape_args[1],
        "ref_shape_rgbs": shape_args[2], "ref_pcd": pts[0][:, :CHUNK],
        "ref_normal": pts[1][:, :CHUNK], "ref_rgb": pts[2][:, :CHUNK],
        "rgb_video": video[:, :2],
    })

    # params flow in as arguments (closure capture would embed them as XLA
    # constants and stall compilation)
    @jax.jit
    def encode(params, video, sp, sn, sr):
        mesh = model.apply(params, sp, sn, sr,
                           method=MotionLatentModel.encode_shape)
        return model.apply(params, video, mesh,
                           method=MotionLatentModel.encode_video)

    @jax.jit
    def decode(params, tokens, p, n, c):
        return model.apply(params, tokens, p, n, c,
                           method=MotionLatentModel.decode_points)

    def clip_once():
        tokens = encode(params, video, *shape_args)
        outs = [decode(params, tokens, pts[0][:, i:i + CHUNK],
                       pts[1][:, i:i + CHUNK], pts[2][:, i:i + CHUNK])
                for i in range(0, N_PTS, CHUNK)]
        jax.block_until_ready(outs)
        return outs

    clip_once()  # compile
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        clip_once()
        times.append(time.perf_counter() - t0)
    sec = float(np.median(times))
    print(json.dumps({
        "metric": "e2e_model_sec_per_32frame_clip",
        "value": round(sec, 4),
        "unit": "s",
        "vs_baseline": round(sec / TARGET_SEC, 4),
    }))


if __name__ == "__main__":
    main()
