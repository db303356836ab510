"""Committed REAL tiny T5 encoder (assets/t5_tiny) — round-4 VERDICT
missing #1 / next #4.

These tests run the PRODUCTION flax branch of `t5_encode_text` (models/t5.py)
against the committed-in-repo `FlaxT5EncoderModel` — real contextual
transformer encodings, no network, no hash fallback — and pin the properties
the training/eval pipeline relies on: registry integration, reference mask/
zeroing semantics (reference t5.py:63-84), determinism across calls,
contextuality (same word, different context -> different encoding), and the
fallback-env exemption (conftest sets MINIMAGEN_TPU_T5_FALLBACK=1 globally;
`local:` handles must still load — they are offline-safe by construction).
"""
import os

import numpy as np
import pytest

import minimagen_tpu.models.t5 as t5mod

ASSET_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         "assets", "t5_tiny")

pytestmark = pytest.mark.skipif(not os.path.isdir(ASSET_DIR),
                                reason="assets/t5_tiny not built")


def test_registry_and_dim():
    assert "t5_tiny" in t5mod.T5_VERSIONS
    assert t5mod.get_encoded_dim("t5_tiny") == 64


def test_loads_real_flax_encoder_despite_fallback_env(monkeypatch):
    """The conftest forces the hash fallback for hub models; the committed
    local encoder must load anyway (it needs no network)."""
    monkeypatch.setenv(t5mod.FORCE_FALLBACK_ENV, "1")
    t5mod._MODELS.pop("t5_tiny", None)
    enc, mask = t5mod.t5_encode_text(["a red circle"], name="t5_tiny", max_length=16)
    kind, tok, model = t5mod._MODELS["t5_tiny"]
    assert kind == "flax"
    from transformers import FlaxT5EncoderModel

    assert isinstance(model, FlaxT5EncoderModel)
    assert enc.shape == (1, 4, 64)  # 3 words + EOS
    assert mask.shape == (1, 4) and mask.all()


def test_reference_mask_and_zeroing_semantics():
    texts = ["a red circle", "a very big blue square on a table"]
    enc, mask = t5mod.t5_encode_text(texts, name="t5_tiny", max_length=16)
    b, L, d = enc.shape
    assert (b, d) == (2, 64)
    assert L == 9  # longest caption: 8 words + EOS
    assert mask.dtype == np.bool_
    assert mask[0].sum() == 4 and mask[1].sum() == 9
    # masked positions exactly zero, real positions not (reference t5.py:82)
    np.testing.assert_array_equal(np.asarray(enc[0, 4:]), np.zeros((L - 4, d), np.float32))
    assert np.abs(np.asarray(enc[0, :4])).sum() > 0


def test_deterministic_and_contextual():
    e1, _ = t5mod.t5_encode_text(["a red circle"], name="t5_tiny")
    e2, _ = t5mod.t5_encode_text(["a red circle"], name="t5_tiny")
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))

    # contextuality — what the hash fallback CANNOT do: the encoding of
    # "red" (position 1) differs between contexts because self-attention
    # mixes the whole caption into every position
    ea, _ = t5mod.t5_encode_text(["a red circle"], name="t5_tiny")
    eb, _ = t5mod.t5_encode_text(["a red square"], name="t5_tiny")
    diff = np.abs(np.asarray(ea[0, 1]) - np.asarray(eb[0, 1])).max()
    assert diff > 1e-4, "encodings are not contextual"


def test_truncation_and_word_tokenizer():
    enc, mask = t5mod.t5_encode_text(["one two three four five six"],
                                     name="t5_tiny", max_length=4)
    assert enc.shape[1] == 4 and mask.sum() == 4

    tok = t5mod.WordTokenizer(vocab_size=512)
    out = tok.batch_encode_plus(["a red circle", "a"], max_length=16)
    assert out.input_ids.shape == out.attention_mask.shape == (2, 4)
    assert out.input_ids[0, 3] == 1  # EOS appended like the real tokenizer
    assert (out.input_ids[0, :3] >= 2).all()  # 0=pad, 1=eos reserved
    assert out.input_ids[1, 1] == 1 and out.attention_mask[1, 2:].sum() == 0
    # stable across instances/processes (sha256-based, not salted hash())
    out2 = t5mod.WordTokenizer(vocab_size=512).batch_encode_plus(
        ["a red circle", "a"], max_length=16)
    np.testing.assert_array_equal(out.input_ids, out2.input_ids)


def test_composes_with_imagen_forward():
    """End-to-end: Imagen.forward(texts=...) through the committed REAL
    encoder — the production path the lite quality run trains through."""
    import jax

    from minimagen_tpu.models.imagen import Imagen
    from minimagen_tpu.models.unet import BaseTest

    imagen = Imagen(unets=[BaseTest()], image_sizes=(8,), timesteps=25,
                    cond_drop_prob=0.1, text_encoder_name="t5_tiny")
    assert imagen.text_embed_dim == 64
    imagen.init_params(jax.random.PRNGKey(0), batch_size=2, text_len=8)
    images = jax.random.uniform(jax.random.PRNGKey(1), (2, 8, 8, 3))
    loss = imagen.forward(images, texts=["a red circle", "a blue square"],
                          unet_number=1, key=jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
