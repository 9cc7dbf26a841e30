"""Micro-profile of the ShapeVAE volume-decode chunk on the local chip.

Times each component of one 8192-point decode chunk (the unit of
hy3dgen/volume.py's lax.map sweep) in isolation, all as N back-to-back
iterations inside a single jit with a scalar readback, so the tunnel's
dispatch latency and transfer cost are excluded:

- full ``query`` (cross-attn vs 512 latents)
- ``query_topk`` (k=64)
- the decoder's matmul skeleton alone (c_q/c_proj/MLP at the same shapes)
- the attention alone

Prints ms/chunk and achieved TFLOP/s so the gap to peak is attributable.
"""

import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
from motion324_tpu.utils.jit_cache import enable_compilation_cache
enable_compilation_cache()
from motion324_tpu.hy3dgen.vae import ShapeVAE

CHUNK, LATENTS, WIDTH, HEADS, ITERS = 8192, 512, 1024, 16, 50

vae = ShapeVAE(num_latents=LATENTS, embed_dim=64, width=WIDTH, heads=HEADS,
               num_decoder_layers=16, dtype=jnp.bfloat16)
lat = jax.random.normal(jax.random.PRNGKey(0), (1, LATENTS, 64))
params = jax.jit(vae.init)(jax.random.PRNGKey(1), lat, jnp.zeros((1, 8, 3)))
processed = jax.jit(lambda p, l: vae.apply(p, l, method=ShapeVAE.decode))(
    params, lat)

pts = jax.random.uniform(jax.random.PRNGKey(2), (ITERS, CHUNK, 3),
                         minval=-1, maxval=1)


def timed(name, fn, *args, flops_per_iter=None):
    out = float(jax.jit(fn)(*args))  # compile + warm
    t0 = time.perf_counter()
    out = float(jax.jit(fn)(*args))
    dt = time.perf_counter() - t0
    ms = dt / ITERS * 1e3
    tf = (flops_per_iter or 0) / (dt / ITERS) / 1e12
    print(f"{name:28s} {ms:7.2f} ms/chunk"
          + (f"  {tf:6.1f} TF/s" if flops_per_iter else ""), flush=True)
    return out


def sweep_query(p, proc, pts):
    def one(q):
        return vae.apply(p, q[None], proc, method=ShapeVAE.query)[0].sum()
    return jax.lax.map(one, pts).sum()


def sweep_topk(p, proc, pts):
    def one(q):
        return vae.apply(p, q[None], proc, 64,
                         method=ShapeVAE.query_topk)[0].sum()
    return jax.lax.map(one, pts).sum()


# matmul skeleton at the same shapes: q_proj + c_q + c_proj + MLP(4x) + out
wq = jax.random.normal(jax.random.PRNGKey(3), (51, WIDTH), jnp.bfloat16)
w1 = jax.random.normal(jax.random.PRNGKey(4), (WIDTH, WIDTH), jnp.bfloat16)
w2 = jax.random.normal(jax.random.PRNGKey(5), (WIDTH, WIDTH), jnp.bfloat16)
w3 = jax.random.normal(jax.random.PRNGKey(6), (WIDTH, 4 * WIDTH), jnp.bfloat16)
w4 = jax.random.normal(jax.random.PRNGKey(7), (4 * WIDTH, WIDTH), jnp.bfloat16)


def sweep_matmuls(pts):
    def one(q):
        e = jnp.concatenate([q] * 17, axis=-1).astype(jnp.bfloat16)  # (c,51)
        x = e @ wq
        x = x @ w1
        x = x @ w2
        h = x @ w3
        x = (h @ w4 + x)
        return x.astype(jnp.float32).sum()
    return jax.lax.map(one, pts).sum()


def sweep_attn(p, proc, pts):
    from motion324_tpu.ops.attention import multi_head_attention
    hd = WIDTH // HEADS

    def one(q3):
        q = jnp.broadcast_to(q3[:, :1], (CHUNK, WIDTH)).astype(jnp.bfloat16)
        qh = q.reshape(1, CHUNK, HEADS, hd)
        kv = proc.reshape(1, LATENTS, HEADS, hd).astype(jnp.bfloat16)
        return multi_head_attention(qh, kv, kv).astype(jnp.float32).sum()
    return jax.lax.map(one, pts).sum()


# flops per chunk
mm_flops = 2 * CHUNK * (51 * WIDTH + WIDTH * WIDTH * 2 + WIDTH * 4 * WIDTH * 2)
attn_flops = 2 * CHUNK * LATENTS * WIDTH * 2
full_flops = mm_flops + attn_flops

print(f"device: {jax.devices()[0]}", flush=True)
timed("full query (512 lat)", sweep_query, params, processed, pts,
      flops_per_iter=full_flops)
timed("query_topk (k=64)", sweep_topk, params, processed, pts,
      flops_per_iter=mm_flops + 2 * CHUNK * 64 * WIDTH * 2)
timed("matmul skeleton", sweep_matmuls, pts, flops_per_iter=mm_flops)
timed("attention only", sweep_attn, params, processed, pts,
      flops_per_iter=attn_flops)
