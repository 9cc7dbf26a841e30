"""Flash attention kernel vs exact XLA attention: forward and gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motion324_tpu.ops.attention import mha_reference
from motion324_tpu.ops.flash_attention import flash_attention


def _rand(key, shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype=jnp.float32).astype(dtype)


@pytest.mark.parametrize("sq,sk", [(256, 256), (324, 324), (100, 640), (640, 100)])
def test_forward_matches_reference(sq, sk):
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    b, h, d = 2, 3, 64
    q = _rand(kq, (b, h, sq, d))
    k = _rand(kk, (b, h, sk, d))
    v = _rand(kv, (b, h, sk, d))
    out = flash_attention(q, k, v, block_q=256, block_kv=256, interpret=True)
    ref = mha_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_forward_multiblock_online_softmax():
    # several kv blocks exercises the running-max/renormalisation path
    key = jax.random.PRNGKey(1)
    kq, kk, kv = jax.random.split(key, 3)
    q = _rand(kq, (1, 2, 128, 64)) * 4.0  # large logits stress numerics
    k = _rand(kk, (1, 2, 512, 64)) * 4.0
    v = _rand(kv, (1, 2, 512, 64))
    out = flash_attention(q, k, v, block_q=128, block_kv=128, interpret=True)
    ref = mha_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5, rtol=3e-5)


@pytest.mark.parametrize("sq,sk", [(256, 256), (200, 450)])
def test_gradients_match_reference(sq, sk):
    key = jax.random.PRNGKey(2)
    kq, kk, kv, kg = jax.random.split(key, 4)
    b, h, d = 1, 2, 64
    q = _rand(kq, (b, h, sq, d))
    k = _rand(kk, (b, h, sk, d))
    v = _rand(kv, (b, h, sk, d))
    cot = _rand(kg, (b, h, sq, d))

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, block_q=128, block_kv=128, interpret=True)
        return jnp.sum(o * cot)

    def loss_ref(q, k, v):
        return jnp.sum(mha_reference(q, k, v) * cot)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   atol=1e-4, rtol=1e-4, err_msg=f"d{name}")


def test_bf16_forward_close():
    key = jax.random.PRNGKey(3)
    kq, kk, kv = jax.random.split(key, 3)
    b, h, d = 1, 2, 64
    q = _rand(kq, (b, h, 256, d), jnp.bfloat16)
    k = _rand(kk, (b, h, 256, d), jnp.bfloat16)
    v = _rand(kv, (b, h, 256, d), jnp.bfloat16)
    out = flash_attention(q, k, v, block_q=128, block_kv=128, interpret=True)
    assert out.dtype == jnp.bfloat16
    ref = mha_reference(q.astype(jnp.float32), k.astype(jnp.float32),
                        v.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(out, dtype=np.float32),
                               np.asarray(ref), atol=3e-2, rtol=3e-2)


def test_custom_scale():
    key = jax.random.PRNGKey(4)
    kq, kk, kv = jax.random.split(key, 3)
    q = _rand(kq, (1, 1, 128, 64))
    k = _rand(kk, (1, 1, 128, 64))
    v = _rand(kv, (1, 1, 128, 64))
    out = flash_attention(q, k, v, scale=0.5, block_q=128, block_kv=128, interpret=True)
    ref = mha_reference(q, k, v, scale=0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


# --------------------------------------------------------------------------- #
# short-sequence kernel (KV resident in VMEM, fused single-pass backward)
# --------------------------------------------------------------------------- #
@pytest.mark.parametrize("sq,sk", [(324, 324), (256, 256), (257, 257),
                                   (200, 130)])
def test_short_forward_matches_reference(sq, sk):
    from motion324_tpu.ops.short_attention import short_attention
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(3), 3)
    b, h, d = 2, 4, 64
    q = _rand(kq, (b, h, sq, d))
    k = _rand(kk, (b, h, sk, d))
    v = _rand(kv, (b, h, sk, d))
    out = short_attention(q, k, v, interpret=True)
    ref = mha_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_short_gradients_match_reference():
    from motion324_tpu.ops.short_attention import short_attention
    kq, kk, kv, kg = jax.random.split(jax.random.PRNGKey(4), 4)
    b, h, sq, sk, d = 2, 2, 324, 324, 64
    q = _rand(kq, (b, h, sq, d))
    k = _rand(kk, (b, h, sk, d))
    v = _rand(kv, (b, h, sk, d))
    cot = _rand(kg, (b, h, sq, d))

    def loss_short(q, k, v):
        return jnp.sum(short_attention(q, k, v, interpret=True) * cot)

    def loss_ref(q, k, v):
        return jnp.sum(mha_reference(q, k, v) * cot)

    g1 = jax.grad(loss_short, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-5, rtol=5e-5)


def test_short_custom_scale_and_bf16():
    from motion324_tpu.ops.short_attention import short_attention
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(5), 3)
    b, h, s, d = 1, 2, 130, 64
    q = _rand(kq, (b, h, s, d), jnp.bfloat16)
    k = _rand(kk, (b, h, s, d), jnp.bfloat16)
    v = _rand(kv, (b, h, s, d), jnp.bfloat16)
    out = short_attention(q, k, v, scale=0.31, interpret=True)
    ref = mha_reference(q.astype(jnp.float32), k.astype(jnp.float32),
                        v.astype(jnp.float32), scale=0.31)
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               atol=3e-2, rtol=3e-2)


def test_fused_and_twokernel_backwards_agree():
    """Both flash backward implementations (fused single-sweep vs streaming
    two-kernel) must match the XLA reference and each other at multi-block
    shapes; the fused path routes only for KV <= _FUSED_BWD_MAX_KV, so this
    pins the two-kernel path against rot even when CI shapes are short."""
    from motion324_tpu.ops import flash_attention as fa
    key = jax.random.PRNGKey(7)
    kq, kk, kv, kg = jax.random.split(key, 4)
    b, h, sq, sk, d = 1, 2, 300, 516, 64
    q, k, v = (_rand(kq, (b, h, sq, d)), _rand(kk, (b, h, sk, d)),
               _rand(kv, (b, h, sk, d)))
    cot = _rand(kg, (b, h, sq, d))

    def loss(q, k, v):
        o = flash_attention(q, k, v, block_q=128, block_kv=128,
                            interpret=True)
        return jnp.sum(o * cot)

    def loss_ref(q, k, v):
        return jnp.sum(mha_reference(q, k, v) * cot)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    grads = {}
    old = fa._FUSED_BWD_MAX_KV
    try:
        for name, cap in [("fused", 8192), ("twokernel", 0)]:
            fa._FUSED_BWD_MAX_KV = cap
            grads[name] = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
            for g, r, nm in zip(grads[name], g_ref, "qkv"):
                np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                           atol=1e-4, rtol=1e-4,
                                           err_msg=f"{name} d{nm}")
    finally:
        fa._FUSED_BWD_MAX_KV = old
    for a, b_ in zip(grads["fused"], grads["twokernel"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)


@pytest.mark.parametrize("sq,sk", [(257, 257), (324, 324), (100, 640)])
def test_folded_forward_matches_reference(sq, sk):
    """Head-folded (B, S, H*D) kernel vs exact attention, incl. padded
    query rows (257 -> 272) and masked KV columns."""
    from motion324_tpu.ops.folded_attention import folded_attention
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(5), 3)
    b, h, d = 3, 4, 64
    q = _rand(kq, (b, h, sq, d))
    k = _rand(kk, (b, h, sk, d))
    v = _rand(kv, (b, h, sk, d))
    out = folded_attention(
        q.transpose(0, 2, 1, 3).reshape(b, sq, h * d),
        k.transpose(0, 2, 1, 3).reshape(b, sk, h * d),
        v.transpose(0, 2, 1, 3).reshape(b, sk, h * d),
        heads=h, interpret=True)
    ref = mha_reference(q, k, v).transpose(0, 2, 1, 3).reshape(b, sq, h * d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("b", [2, 4])  # b=4 exercises the bbi=4 backward grid
def test_folded_gradients_match_reference(b):
    from motion324_tpu.ops.folded_attention import folded_attention
    kq, kk, kv, kg = jax.random.split(jax.random.PRNGKey(6), 4)
    h, sq, sk, d = 3, 257, 324, 32
    q = _rand(kq, (b, h, sq, d))
    k = _rand(kk, (b, h, sk, d))
    v = _rand(kv, (b, h, sk, d))
    cot = _rand(kg, (b, sq, h * d))
    fold = lambda x: x.transpose(0, 2, 1, 3).reshape(x.shape[0], x.shape[2],
                                                     h * d)

    def loss_folded(q, k, v):
        return jnp.sum(folded_attention(fold(q), fold(k), fold(v), heads=h,
                                        interpret=True) * cot)

    def loss_ref(q, k, v):
        return jnp.sum(fold(mha_reference(q, k, v)) * cot)

    g1 = jax.grad(loss_folded, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-5, rtol=5e-5)


def test_dispatcher_short_path_uses_folded_layout():
    """multi_head_attention 'short' backend must equal the XLA reference on
    the (B, S, H, D) sequence-major contract."""
    from motion324_tpu.ops.attention import multi_head_attention
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(7), 3)
    b, sq, sk, h, d = 2, 257, 257, 4, 16
    q = _rand(kq, (b, sq, h, d))
    k = _rand(kk, (b, sk, h, d))
    v = _rand(kv, (b, sk, h, d))
    out = multi_head_attention(q, k, v, backend="short_interpret")
    ref = multi_head_attention(q, k, v, backend="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_folded_qblocked_tiny_kv_gradients():
    """Decoder-shaped route: thousands of queries vs tiny KV exercises the
    q-block grid and the dk/dv accumulation across q blocks."""
    from motion324_tpu.ops import folded_attention as fam
    kq, kk, kv, kg = jax.random.split(jax.random.PRNGKey(8), 4)
    b, h, sq, sk, d = 2, 2, 2100, 64, 32
    q = _rand(kq, (b, sq, h * d))
    k = _rand(kk, (b, sk, h * d))
    v = _rand(kv, (b, sk, h * d))
    cot = _rand(kg, (b, sq, h * d))
    old = fam._pick_bq
    fam._pick_bq = lambda sq_p, cap=512: old(sq_p, cap)  # force multi-block
    try:
        def loss(q, k, v):
            return jnp.sum(fam.folded_attention(q, k, v, heads=h,
                                                interpret=True) * cot)

        def unfold(x, s):
            return x.reshape(x.shape[0], s, h, d).transpose(0, 2, 1, 3)

        def loss_ref(q, k, v):
            o = mha_reference(unfold(q, sq), unfold(k, sk), unfold(v, sk))
            return jnp.sum(o.transpose(0, 2, 1, 3).reshape(cot.shape) * cot)

        g1 = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=5e-5, rtol=5e-5)
    finally:
        fam._pick_bq = old
