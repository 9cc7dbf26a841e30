"""MotionLatentModel forward: shapes, determinism, chunked-decode equivalence,
gradient flow (frozen image encoder), and pos-embed resize path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motion324_tpu.models.motion_model import ModelConfig, MotionLatentModel

SMALL = ModelConfig(feat_dim=96, tokens=8, pcd_layers=2, n_alternating_layers=4,
                    head_dim=32, frames=3, image_size=28, patch_size=14,
                    drop_rate=0.1, dino_depth=2, dino_heads=3)


def _sample(key, b=2, s=32, n=24, t=3, h=28, w=28):
    ks = jax.random.split(key, 7)
    return {
        "ref_shape_pcd": jax.random.normal(ks[0], (b, s, 3)),
        "ref_shape_normals": jax.random.normal(ks[1], (b, s, 3)),
        "ref_shape_rgbs": jax.random.uniform(ks[2], (b, s, 3)),
        "ref_pcd": jax.random.normal(ks[3], (b, n, 3)),
        "ref_normal": jax.random.normal(ks[4], (b, n, 3)),
        "ref_rgb": jax.random.uniform(ks[5], (b, n, 3)),
        "rgb_video": jax.random.uniform(ks[6], (b, t, h, w, 3)),
    }


@pytest.fixture(scope="module")
def model_and_params():
    model = MotionLatentModel(SMALL)
    sample = _sample(jax.random.PRNGKey(0))
    params = model.init(jax.random.PRNGKey(1), sample)
    return model, params, sample


def test_forward_shape(model_and_params):
    model, params, sample = model_and_params
    out = model.apply(params, sample)
    assert out.shape == (2, 3, 24, 3)
    assert out.dtype == jnp.float32
    assert np.isfinite(np.asarray(out)).all()


def test_eval_deterministic(model_and_params):
    model, params, sample = model_and_params
    o1 = model.apply(params, sample)
    o2 = model.apply(params, sample)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


def test_train_dropout_needs_rng_and_differs(model_and_params):
    model, params, sample = model_and_params
    o_eval = model.apply(params, sample)
    o_tr1 = model.apply(params, sample, train=True,
                        rngs={"dropout": jax.random.PRNGKey(7)})
    o_tr2 = model.apply(params, sample, train=True,
                        rngs={"dropout": jax.random.PRNGKey(8)})
    assert not np.allclose(np.asarray(o_tr1), np.asarray(o_eval))
    assert not np.allclose(np.asarray(o_tr1), np.asarray(o_tr2))


def test_chunked_decode_matches_full(model_and_params):
    """Decoding N points in chunks must equal one-shot decode (reference
    model/Pcd_motion.py:566-577 eval chunking)."""
    model, params, sample = model_and_params

    def encode(sample):
        mesh = model.apply(params, sample["ref_shape_pcd"], sample["ref_shape_normals"],
                           sample["ref_shape_rgbs"], method=MotionLatentModel.encode_shape)
        return model.apply(params, sample["rgb_video"], mesh,
                           method=MotionLatentModel.encode_video)

    tokens = encode(sample)
    full = model.apply(params, tokens, sample["ref_pcd"], sample["ref_normal"],
                       sample["ref_rgb"], method=MotionLatentModel.decode_points)
    parts = []
    for i in range(0, 24, 8):
        parts.append(model.apply(
            params, tokens, sample["ref_pcd"][:, i:i+8], sample["ref_normal"][:, i:i+8],
            sample["ref_rgb"][:, i:i+8], method=MotionLatentModel.decode_points))
    chunked = jnp.concatenate(parts, axis=2)
    np.testing.assert_allclose(np.asarray(full), np.asarray(chunked),
                               atol=1e-5, rtol=1e-5)


def test_pos_embed_resize_path(model_and_params):
    """T != trained frames exercises trilinear pos-embed re-interpolation
    (reference model/Pcd_motion.py:481-488)."""
    model, params, _ = model_and_params
    sample = _sample(jax.random.PRNGKey(3), t=5)
    out = model.apply(params, sample)
    assert out.shape == (2, 5, 24, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_image_encoder_frozen(model_and_params):
    """No gradient may flow into DINOv2 (reference dinov2.py:60-63 freeze)."""
    model, params, sample = model_and_params

    def loss_fn(p):
        out = model.apply(p, sample)
        return jnp.sum(out ** 2)

    grads = jax.grad(loss_fn)(params)
    dino = grads["params"]["image_encoder"]
    leaf_norms = [float(jnp.abs(g).max()) for g in jax.tree.leaves(dino)]
    assert max(leaf_norms) == 0.0
    other = grads["params"]["point_decoder"]
    assert max(float(jnp.abs(g).max()) for g in jax.tree.leaves(other)) > 0.0
