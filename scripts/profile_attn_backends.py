"""Micro-bench: attention backend choice at the framework's hot shapes.

Times fwd and fwd+bwd for the dispatcher's candidate backends at each shape
(XLA fused vs Pallas single-KV/flash vs short kernel where legal), N
iterations inside one jit with a scalar readback. Drives the routing
thresholds in ops/attention.py with measured numbers instead of folklore.
"""

import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from motion324_tpu.ops.attention import multi_head_attention

ITERS = 30

SHAPES = [
    # (name, B, Sq, Sk, H, D, dtype)
    ("motion decoder xattn", 32, 4096, 68, 12, 64, jnp.bfloat16),
    ("shape-gen latents xattn", 1, 8192, 512, 16, 64, jnp.bfloat16),
    ("paint mva 2 views 64^2", 2, 8192, 8192, 10, 64, jnp.bfloat16),
]


def bench(name, b, sq, sk, h, d, dtype, backend):
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (b, sq, h, d), jnp.float32).astype(dtype)
    k = jax.random.normal(kk, (b, sk, h, d), jnp.float32).astype(dtype)
    v = jax.random.normal(kv, (b, sk, h, d), jnp.float32).astype(dtype)

    def fwd(q, k, v):
        def one(_, __):
            o = multi_head_attention(q, k, v, backend=backend)
            return _, o.astype(jnp.float32).sum()
        _, outs = jax.lax.scan(one, 0, jnp.arange(ITERS))
        return outs.sum()

    def fwdbwd(q, k, v):
        def one(_, __):
            def loss(q):
                return multi_head_attention(q, k, v, backend=backend) \
                    .astype(jnp.float32).sum()
            val, g = jax.value_and_grad(loss)(q)
            return _, val + g.astype(jnp.float32).sum()
        _, outs = jax.lax.scan(one, 0, jnp.arange(ITERS))
        return outs.sum()

    out = {}
    for tag, fn in [("fwd", fwd), ("fwd+bwd", fwdbwd)]:
        jf = jax.jit(fn)
        float(jf(q, k, v))  # compile
        t0 = time.perf_counter()
        float(jf(q, k, v))
        ms = (time.perf_counter() - t0) / ITERS * 1e3
        out[tag] = ms
    print(f"{name:26s} {backend:7s} fwd {out['fwd']:7.2f} ms   "
          f"fwd+bwd {out['fwd+bwd']:7.2f} ms", flush=True)


if __name__ == "__main__":
    print(f"device: {jax.devices()[0]}", flush=True)
    for name, b, sq, sk, h, d, dt in SHAPES:
        for backend in ("xla", "flash"):
            try:
                bench(name, b, sq, sk, h, d, dt, backend)
            except Exception as e:
                print(f"{name:26s} {backend:7s} FAILED: "
                      f"{str(e)[:80]}", flush=True)
