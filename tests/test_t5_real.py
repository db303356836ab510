"""Real T5 encoder branches exercised OFFLINE (VERDICT round-1 item 4).

The sandbox has no network and no HF cache, so the hash fallback is what the
test suite normally runs. These tests cover the *real* flax/torch branches of
`t5_encode_text` (models/t5.py) by constructing tiny local
`FlaxT5EncoderModel(T5Config)` / `T5EncoderModel(T5Config)` instances (random
init, no download) plus a minimal tokenizer, injected through the `_MODELS`
cache. Asserted semantics mirror the reference wrapper
(/root/reference/minimagen/t5.py:31-84): longest-padding, truncation to
max_length, boolean attention mask, and masked positions zeroed in the
returned hidden states — on BOTH branches, plus flax/torch numerical
consistency at identical weights.
"""
import numpy as np
import pytest

import minimagen_tpu.models.t5 as t5mod

D_MODEL = 32
VOCAB = 128


class FakeTokenizer:
    """Whitespace tokenizer with the HF batch_encode_plus surface used by
    t5_encode_text: longest-padding, truncation, np/pt tensors."""

    def _ids(self, text, max_length):
        # stable (unsalted) token ids; 0 is the pad id
        return [sum(ord(c) for c in w) % (VOCAB - 2) + 1
                for w in text.split()[:max_length]]

    def batch_encode_plus(self, texts, padding="longest", max_length=256,
                          truncation=True, return_tensors="np"):
        assert padding == "longest" and truncation
        ids = [self._ids(t, max_length) for t in texts]
        longest = max((len(i) for i in ids), default=1)
        input_ids = np.zeros((len(ids), longest), dtype=np.int32)
        attention_mask = np.zeros((len(ids), longest), dtype=np.int32)
        for row, seq in enumerate(ids):
            input_ids[row, : len(seq)] = seq
            attention_mask[row, : len(seq)] = 1

        class Out:
            pass

        out = Out()
        if return_tensors == "pt":
            import torch

            out.input_ids = torch.from_numpy(input_ids.astype(np.int64))
            out.attention_mask = torch.from_numpy(attention_mask.astype(np.int64))
        else:
            out.input_ids = input_ids
            out.attention_mask = attention_mask
        return out


def _tiny_config():
    from transformers import T5Config

    return T5Config(
        vocab_size=VOCAB, d_model=D_MODEL, d_kv=8, d_ff=64,
        num_layers=2, num_heads=2, dropout_rate=0.0,
    )


@pytest.fixture
def torch_encoder():
    from transformers import T5EncoderModel

    import torch

    torch.manual_seed(0)
    model = T5EncoderModel(_tiny_config())
    model.eval()
    return model


def _install(monkeypatch, kind, model):
    monkeypatch.setitem(t5mod._MODELS, "t5_small", (kind, FakeTokenizer(), model))


TEXTS = ["a happy dog", "a very big red house with a roof"]


def _assert_reference_semantics(enc, mask):
    """The contract from reference t5.py:63-84."""
    b, L, d = enc.shape
    assert (b, d) == (2, D_MODEL)
    assert L == 8  # longest caption (8 words) sets the pad length
    assert mask.dtype == np.bool_ and mask.shape == (b, L)
    assert mask[0].sum() == 3 and mask[1].sum() == 8
    assert enc.dtype == np.float32
    # masked positions are exactly zero; real positions are not
    np.testing.assert_array_equal(enc[0, 3:], np.zeros((L - 3, d), np.float32))
    assert np.abs(enc[0, :3]).sum() > 0


def test_torch_branch_reference_semantics(monkeypatch, torch_encoder):
    _install(monkeypatch, "torch", torch_encoder)
    enc, mask = t5mod.t5_encode_text(TEXTS, name="t5_small")
    _assert_reference_semantics(np.asarray(enc), np.asarray(mask))


def test_flax_branch_reference_semantics(monkeypatch, torch_encoder, tmp_path):
    from transformers import FlaxT5EncoderModel

    torch_encoder.save_pretrained(tmp_path / "tiny_t5")
    flax_model = FlaxT5EncoderModel.from_pretrained(str(tmp_path / "tiny_t5"), from_pt=True)
    _install(monkeypatch, "flax", flax_model)
    enc, mask = t5mod.t5_encode_text(TEXTS, name="t5_small")
    _assert_reference_semantics(np.asarray(enc), np.asarray(mask))


def test_flax_and_torch_branches_agree_at_identical_weights(monkeypatch, torch_encoder, tmp_path):
    """The two real branches are interchangeable: same weights -> same
    encodings (so the TPU-side flax path is a faithful stand-in for the
    reference's torch path)."""
    from transformers import FlaxT5EncoderModel

    torch_encoder.save_pretrained(tmp_path / "tiny_t5")
    flax_model = FlaxT5EncoderModel.from_pretrained(str(tmp_path / "tiny_t5"), from_pt=True)

    _install(monkeypatch, "torch", torch_encoder)
    enc_pt, mask_pt = t5mod.t5_encode_text(TEXTS, name="t5_small")
    _install(monkeypatch, "flax", flax_model)
    enc_fx, mask_fx = t5mod.t5_encode_text(TEXTS, name="t5_small")

    np.testing.assert_array_equal(np.asarray(mask_pt), np.asarray(mask_fx))
    np.testing.assert_allclose(np.asarray(enc_pt), np.asarray(enc_fx), atol=2e-4)


def test_truncation_to_max_length(monkeypatch, torch_encoder):
    _install(monkeypatch, "torch", torch_encoder)
    enc, mask = t5mod.t5_encode_text(["one two three four five six"], name="t5_small",
                                     max_length=4)
    assert enc.shape[1] == 4 and mask.sum() == 4


def test_real_encoder_composes_with_imagen_forward(monkeypatch, torch_encoder):
    """End-to-end: Imagen.forward(texts=...) through a REAL (tiny) T5 encoder
    instead of the hash fallback."""
    import jax
    import jax.numpy as jnp

    from minimagen_tpu.models.imagen import Imagen
    from minimagen_tpu.models.unet import BaseTest

    _install(monkeypatch, "torch", torch_encoder)
    imagen = Imagen(unets=[BaseTest()], image_sizes=(8,), timesteps=25,
                    cond_drop_prob=0.1, text_encoder_name="t5_small",
                    text_embed_dim=D_MODEL)
    imagen.init_params(jax.random.PRNGKey(0), batch_size=2, text_len=4)
    images = jax.random.uniform(jax.random.PRNGKey(1), (2, 8, 8, 3))
    loss = imagen.forward(images, texts=TEXTS, unet_number=1, key=jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
