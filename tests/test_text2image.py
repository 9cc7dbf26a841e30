"""Text-to-image pipeline: CLIP text tower parity vs HF torch + tiny e2e."""

import numpy as np
import pytest

from motion324_tpu.hy3dgen.text2image import (CLIPTextCfg, CLIPTextTower,
                                              TextToImagePipeline,
                                              convert_clip_text)

SMALL = CLIPTextCfg(vocab=100, hidden=64, intermediate=128, layers=2,
                    heads=4, max_len=16, eos_token=99)


def test_clip_text_matches_hf_torch():
    torch = pytest.importorskip("torch")
    from transformers import CLIPTextConfig, CLIPTextModel
    torch.manual_seed(0)
    cfg = CLIPTextConfig(hidden_size=SMALL.hidden,
                         intermediate_size=SMALL.intermediate,
                         num_hidden_layers=SMALL.layers,
                         num_attention_heads=SMALL.heads,
                         vocab_size=SMALL.vocab,
                         max_position_embeddings=SMALL.max_len,
                         eos_token_id=SMALL.eos_token)
    ref = CLIPTextModel(cfg).eval()
    tower = CLIPTextTower(SMALL, params=convert_clip_text(ref.state_dict(),
                                                          SMALL))
    rng = np.random.RandomState(1)
    tokens = rng.randint(0, SMALL.vocab - 1, (2, SMALL.max_len))
    tokens[:, -1] = SMALL.eos_token
    with torch.no_grad():
        out = ref(torch.from_numpy(tokens))
        ref_states = out.last_hidden_state.numpy()
        ref_pooled = out.pooler_output.numpy()
    states, pooled = tower(tokens)
    np.testing.assert_allclose(states, ref_states, atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(pooled, ref_pooled, atol=2e-4, rtol=2e-4)


def test_text2image_tiny_end_to_end():
    pipe = TextToImagePipeline.init_random(image_size=64)
    tokens = np.array([1, 5, 9, 255] + [0] * 12)
    img = pipe(tokens, num_steps=2, seed=0)
    assert img.shape == (64, 64, 3)
    assert np.isfinite(img).all()
    assert 0.0 <= img.min() and img.max() <= 1.0
    # prompt-sensitivity: different tokens -> different image
    img2 = pipe(np.array([7, 2, 3, 255] + [0] * 12), num_steps=2, seed=0)
    assert not np.allclose(img, img2)
