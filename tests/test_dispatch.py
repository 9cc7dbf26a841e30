"""Attention dispatcher contracts and parallel mesh helpers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motion324_tpu.ops.attention import mha_reference, multi_head_attention
from motion324_tpu.parallel.mesh import (batch_sharding, local_batch_size,
                                         make_mesh, replicate)


def _qkv(sq=32, sk=32, h=2, d=16, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    return (jax.random.normal(ks[0], (1, sq, h, d)),
            jax.random.normal(ks[1], (1, sk, h, d)),
            jax.random.normal(ks[2], (1, sk, h, d)))


def test_dispatcher_xla_on_cpu_default():
    q, k, v = _qkv()
    out_auto = multi_head_attention(q, k, v)  # cpu -> xla path
    out_xla = multi_head_attention(q, k, v, backend="xla")
    np.testing.assert_array_equal(np.asarray(out_auto), np.asarray(out_xla))


def test_dispatcher_backends_agree():
    q, k, v = _qkv(sq=100, sk=200)
    out_xla = multi_head_attention(q, k, v, backend="xla")
    out_flash = multi_head_attention(q, k, v, backend="interpret")
    np.testing.assert_allclose(np.asarray(out_xla), np.asarray(out_flash),
                               atol=2e-5, rtol=2e-5)


def test_dispatcher_rejects_unknown_backend():
    q, k, v = _qkv()
    with pytest.raises(ValueError, match="unknown attention backend"):
        multi_head_attention(q, k, v, backend="cuda")


def test_mha_reference_layout():
    # (B, H, S, D) layout helper used by kernels directly
    q = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 8, 16))
    out = mha_reference(q, q, q)
    assert out.shape == (2, 3, 8, 16)


def test_make_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape["dp"] * mesh.shape["mp"] == len(jax.devices())
    mesh2 = make_mesh(dp=4, mp=2)
    assert mesh2.shape == {"dp": 4, "mp": 2}
    with pytest.raises(ValueError):
        make_mesh(dp=3, mp=3)


def test_local_batch_size():
    mesh = make_mesh()
    assert local_batch_size(16, mesh) == 16 // mesh.shape["dp"]
    with pytest.raises(ValueError):
        local_batch_size(5, mesh)


def test_shardings_build():
    mesh = make_mesh()
    bs = batch_sharding(mesh)
    rep = replicate(mesh)
    x = jax.device_put(jnp.zeros((8, 4)), bs)
    y = jax.device_put(jnp.zeros((4,)), rep)
    assert x.sharding == bs and y.sharding == rep
