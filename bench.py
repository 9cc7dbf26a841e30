"""Benchmark: end-to-end model inference seconds per 32-frame clip on one chip.

Measures the flagship MotionLatentModel (768-d, DINOv2-B/14, bf16) running the
full per-clip compute of the `4D_from_existing` path: shape encoding of 16384
textured surface samples, video encoding of 32 frames, and decoding of 16384
query points (4x4096 chunks) — the device work between video-in and
trajectories-out. Prints one JSON line; ``vs_baseline`` is the ratio to the
5 s/clip BASELINE target (lower is better, <1 beats the target).

Timing methodology: on tunneled-TPU backends ``block_until_ready`` does not
synchronize, so clips are CHAINED (each iteration's input is perturbed by the
previous output, forcing sequential execution) and timed with a single scalar
host readback; the constant tunnel latency is removed by differencing a 1-clip
and an N-clip chain.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

TARGET_SEC = 5.0
T, N_SHAPE, N_PTS, CHUNK = 32, 16384, 16384, 4096


def main():
    from motion324_tpu.utils.jit_cache import enable_compilation_cache
    enable_compilation_cache()
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
    def clip(params, video, sp, sn, sr, p0, n0, c0, p1, n1, c1, p2, n2, c2,
             p3, n3, c3):
        mesh = model.apply(params, sp, sn, sr,
                           method=MotionLatentModel.encode_shape)
        tokens = model.apply(params, video, mesh,
                             method=MotionLatentModel.encode_video)
        outs = [model.apply(params, tokens, p, n, c,
                            method=MotionLatentModel.decode_points)
                for p, n, c in ((p0, n0, c0), (p1, n1, c1),
                                (p2, n2, c2), (p3, n3, c3))]
        traj = jnp.concatenate(outs, axis=2)
        return traj, traj.mean()

    chunks = []
    for i in range(0, N_PTS, CHUNK):
        for a in pts:
            chunks.append(a[:, i:i + CHUNK])

    def chain(n_clips):
        v = video
        s = jnp.float32(0.0)
        for _ in range(n_clips):
            v = video + (s * 1e-12)  # serialize: depends on previous output
            _, s = clip(params, v, *shape_args, *chunks)
        return float(s)  # single host readback syncs the whole chain

    chain(1)  # compile
    reps = 3
    n_long = 8
    t1 = min(_timed(chain, 1) for _ in range(reps))
    tn = min(_timed(chain, n_long) for _ in range(reps))
    sec = max(tn - t1, 1e-9) / (n_long - 1)
    print(json.dumps({
        "metric": "e2e_model_sec_per_32frame_clip",
        "value": round(sec, 4),
        "unit": "s",
        "vs_baseline": round(sec / TARGET_SEC, 4),
    }))


def _timed(fn, *args):
    t0 = time.perf_counter()
    fn(*args)
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
