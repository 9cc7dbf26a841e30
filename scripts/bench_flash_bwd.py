"""Micro-bench the flash attention backward at the dyscene training shapes.

Times forward-only and forward+backward of ``flash_attention`` on the real
chip, at the global-attention shape of one training micro-batch (the
bench_train profile's dominant kernel), and prints ms plus the naive flop
ceiling so kernel changes can be A/B'd without a full train-step run::

    python scripts/bench_flash_bwd.py [--micro 2] [--steps 20]
    MOTION324_FUSED_BQ=2048 python scripts/bench_flash_bwd.py   # tile A/B

The "bwd-only" number is (fwd+bwd) - fwd, i.e. exactly what a kernel change
moves; at the r3 trace the fused backward sat at 3.27 ms/layer vs a ~2.4
naive ceiling (TODO.md session D).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--micro", type=int, default=2,
                   help="micro-batch (batch 32 / accum 16 = 2)")
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--seq", type=int, default=3888,
                   help="global-attn sequence (12 frames x 324 latents)")
    p.add_argument("--heads", type=int, default=12)
    p.add_argument("--dim", type=int, default=64)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from motion324_tpu.ops.flash_attention import flash_attention

    b, h, s, d = args.micro, args.heads, args.seq, args.dim
    kq, kk, kv, kg = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(kq, (b, h, s, d), jnp.bfloat16)
    k = jax.random.normal(kk, (b, h, s, d), jnp.bfloat16)
    v = jax.random.normal(kv, (b, h, s, d), jnp.bfloat16)
    cot = jax.random.normal(kg, (b, h, s, d), jnp.bfloat16)
    n = args.steps

    # ONE program runs n chained kernel calls (each iteration consumes the
    # previous one's output): per-dispatch tunnel latency (~20 ms over axon)
    # would otherwise swamp a ~1 ms kernel.
    @jax.jit
    def fwd_n(q, k, v):
        def body(qc, _):
            return flash_attention(qc, k, v).astype(qc.dtype), None
        out, _ = jax.lax.scan(body, q, None, length=n)
        return jnp.sum(out.astype(jnp.float32))

    @jax.jit
    def fwdbwd_n(q, k, v):
        def loss(q, k, v):
            return jnp.sum(flash_attention(q, k, v).astype(jnp.float32)
                           * cot.astype(jnp.float32))
        def body(carry, _):
            qc, kc, vc = carry
            dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(qc, kc, vc)
            return (dq.astype(qc.dtype), kc, vc), None
        (qo, _, _), _ = jax.lax.scan(body, (q, k, v), None, length=n)
        return jnp.sum(qo.astype(jnp.float32))

    def bench(fn, *a):
        float(fn(*a))  # compile+warm (block_until_ready is a no-op on axon)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(*a))
            times.append(time.perf_counter() - t0)
        return float(np.median(times)) / n

    t_fwd = bench(fwd_n, q, k, v)
    t_all = bench(fwdbwd_n, q, k, v)
    t_bwd = t_all - t_fwd

    # naive flop ceilings at v5e bf16 peak
    peak = 197e12
    fwd_flops = 2 * 2 * b * h * s * s * d          # qk^T + pv
    bwd_flops = 5 * 2 * b * h * s * s * d          # s, dp, dv, dk, dq
    print(f"shape (B,H,S,D)=({b},{h},{s},{d})")
    print(f"fwd:      {t_fwd * 1e3:7.2f} ms   ceiling {fwd_flops / peak * 1e3:6.2f} ms "
          f"({fwd_flops / t_fwd / peak * 100:5.1f}% MXU)")
    print(f"fwd+bwd:  {t_all * 1e3:7.2f} ms")
    print(f"bwd-only: {t_bwd * 1e3:7.2f} ms   ceiling {bwd_flops / peak * 1e3:6.2f} ms "
          f"({bwd_flops / t_bwd / peak * 100:5.1f}% MXU)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
