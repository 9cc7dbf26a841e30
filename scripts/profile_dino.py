"""Micro-profile of the frozen DINOv2 encoder at the dyscene training shapes.

The train-step profile attributes ~0.31 s/step (batch 32 -> 384 frames) to
the DINO forward — ~21 TF/s, far off the matmul roofline. This isolates the
patchify conv (14x14 stride-14) from the transformer body and times an
equivalent reshape+matmul patchify, to decide whether the conv lowering is
the bottleneck.
"""

import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
from motion324_tpu.models.dinov2 import DinoViT

B, H, W, C = 384, 224, 224, 768
ITERS = 20

model = DinoViT(embed_dim=C, depth=12, num_heads=12, patch_size=14,
                dtype=jnp.bfloat16)
x = jax.random.uniform(jax.random.PRNGKey(0), (B, H, W, 3)).astype(jnp.bfloat16)
params = jax.jit(model.init)(jax.random.PRNGKey(1), x[:1])


def timed(name, fn, *args, flops=None):
    jf = jax.jit(fn)
    float(jf(*args))
    t0 = time.perf_counter()
    float(jf(*args))
    dt = (time.perf_counter() - t0) / ITERS
    # `flops` is the TOTAL over all ITERS chained iterations; dt is per-iter
    tf = (flops or 0) / ITERS / dt / 1e12
    print(f"{name:26s} {dt * 1e3:8.2f} ms"
          + (f"  {tf:6.1f} TF/s" if flops else ""), flush=True)


def chain(fn):
    def run(*args):
        s = jnp.float32(0.0)
        for _ in range(ITERS):
            s = s + fn(*args, s)
        return s
    return run


# 1. full encoder
def full(params, x, s):
    out = model.apply(params, x + s.astype(x.dtype) * 1e-12)
    return out.astype(jnp.float32).mean()


# 2. patchify conv alone (same weights)
kern = params["params"]["patch_embed"]["kernel"]
bias = params["params"]["patch_embed"]["bias"]


def conv_only(x, s):
    h = jax.lax.conv_general_dilated(
        (x + s.astype(x.dtype) * 1e-12), kern.astype(jnp.bfloat16),
        window_strides=(14, 14), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return h.astype(jnp.float32).mean()


# 3. patchify as reshape + matmul
wmat = kern.reshape(14 * 14 * 3, C)


def matmul_patchify(x, s):
    xp = (x + s.astype(x.dtype) * 1e-12).reshape(B, 16, 14, 16, 14, 3)
    xp = xp.transpose(0, 1, 3, 2, 4, 5).reshape(B, 256, 14 * 14 * 3)
    h = xp @ wmat.astype(jnp.bfloat16) + bias.astype(jnp.bfloat16)
    return h.astype(jnp.float32).mean()


vit_flops = B * (256 * C * C * 4 * 2 + 256 * C * 4 * C * 2 * 2
                 + 12 * 2 * 2 * 257 * 257 * C) * 12 // 12  # per layer x12
vit_flops = 12 * B * (2 * 257 * C * C * 4 + 2 * 257 * C * 8 * C // 2
                      + 4 * 257 * 257 * C)
patch_flops = 2 * B * 256 * 588 * C

print(f"device: {jax.devices()[0]}", flush=True)
timed("dino full fwd", chain(full), params, x,
      flops=ITERS * (vit_flops + patch_flops))
timed("patchify conv", chain(conv_only), x, flops=ITERS * patch_flops)
timed("patchify reshape+matmul", chain(matmul_patchify), x,
      flops=ITERS * patch_flops)
