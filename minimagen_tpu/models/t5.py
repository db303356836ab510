"""Frozen text-encoder layer.

Capability parity with the reference T5 wrapper (/root/reference/minimagen/
t5.py:1-90): the same 10-variant registry (name -> HF handle / encoding dim /
size), `t5_encode_text(text, name, max_length)` returning the last hidden
state with masked positions zeroed plus a boolean attention mask, and
`get_encoded_dim(name)`.

Differences:
- Returns numpy/JAX arrays (the framework is torch-free on the compute path).
  The T5 model itself runs via HuggingFace transformers on the host when the
  checkpoint is available (it is frozen and used once per caption, so it is
  pre-encoding work, not accelerator work — the reference likewise runs it
  under no_grad, t5.py:74-79).
- **Offline fallback**: when the checkpoint cannot be loaded (no network, no
  cache), a deterministic hash-based encoder produces stable pseudo-embeddings
  with the correct (b, L, dim) shape/mask semantics so that the entire
  training/sampling pipeline runs end-to-end offline.  The fallback is
  deterministic across processes (seeded per-token by a stable hash), which
  preserves the "frozen encoder" property training relies on.
"""
from __future__ import annotations

import hashlib
import os
import warnings
from typing import List, Tuple

import numpy as np

MAX_LENGTH = 256  # reference t5.py:5

DEFAULT_T5_NAME = "t5_small"

# name -> handle / encoding dim / approx size in GB (reference t5.py:10-21)
T5_VERSIONS = {
    "t5_small": {"handle": "t5-small", "dim": 512, "size": 0.24},
    "t5_base": {"handle": "t5-base", "dim": 768, "size": 0.890},
    "t5_large": {"handle": "t5-large", "dim": 1024, "size": 2.75},
    "t5_3b": {"handle": "t5-3b", "dim": 1024, "size": 10.6},
    "t5_11b": {"handle": "t5-11b", "dim": 1024, "size": 42.1},
    "small1.1": {"handle": "google/t5-v1_1-small", "dim": 512, "size": 0.3},
    "base1.1": {"handle": "google/t5-v1_1-base", "dim": 768, "size": 0.99},
    "large1.1": {"handle": "google/t5-v1_1-large", "dim": 1024, "size": 3.13},
    "xl1.1": {"handle": "google/t5-v1_1-xl", "dim": 2048, "size": 11.4},
    "xxl1.1": {"handle": "google/t5-v1_1-xxl", "dim": 4096, "size": 44.5},
    # Committed-in-repo REAL tiny T5 encoder (built by tools/make_tiny_t5.py):
    # an actual FlaxT5EncoderModel (3 layers, d_model 64) loaded from a local
    # directory — no network — so the production flax encode path can back
    # offline training/eval runs with real contextual transformer encodings
    # instead of the hash fallback. `local:` handles resolve relative to the
    # repo root and are exempt from MINIMAGEN_TPU_T5_FALLBACK (they are
    # offline-safe by construction).
    "t5_tiny": {"handle": "local:assets/t5_tiny", "dim": 64, "size": 0.001},
}

_MODELS: dict = {}  # lazy (tokenizer, model) cache per name
_FALLBACK_WARNED = set()

# force the hash fallback (used by tests / offline CI)
FORCE_FALLBACK_ENV = "MINIMAGEN_TPU_T5_FALLBACK"


def get_encoded_dim(name: str) -> int:
    """Encoding dimensionality of a T5 variant (reference t5.py:87-90)."""
    return T5_VERSIONS[name]["dim"]


class WordTokenizer:
    """Deterministic word-level tokenizer for the committed local tiny T5.

    The sandbox has no sentencepiece, so local T5 encoders pair with this
    instead of the SP tokenizer: stable sha256-hashed word ids (pad=0, eos=1,
    appended like the real T5 tokenizer), with the HF `batch_encode_plus`
    surface `t5_encode_text` uses (longest-padding, truncation, np tensors).
    Deterministic across processes — the "frozen encoder" property training
    relies on holds.
    """

    def __init__(self, vocab_size: int):
        self.vocab_size = vocab_size

    def _ids(self, text: str, max_length: int) -> List[int]:
        ids = []
        for w in text.lower().split():
            digest = hashlib.sha256(w.encode("utf-8")).digest()
            ids.append(int.from_bytes(digest[:4], "little") % (self.vocab_size - 2) + 2)
        ids.append(1)  # </s> (the real T5 tokenizer appends EOS)
        return ids[:max_length]

    def batch_encode_plus(self, texts: List[str], padding: str = "longest",
                          max_length: int = MAX_LENGTH, truncation: bool = True,
                          return_tensors: str = "np"):
        assert padding == "longest" and truncation and return_tensors == "np"
        ids = [self._ids(t, max_length) for t in texts]
        longest = max((len(i) for i in ids), default=1)
        input_ids = np.zeros((len(ids), longest), dtype=np.int32)
        attention_mask = np.zeros((len(ids), longest), dtype=np.int32)
        for row, seq in enumerate(ids):
            input_ids[row, : len(seq)] = seq
            attention_mask[row, : len(seq)] = 1

        class _Out:  # matches the HF BatchEncoding attribute surface used here
            pass

        out = _Out()
        out.input_ids = input_ids
        out.attention_mask = attention_mask
        return out


def _load_local(name: str, handle: str):
    """Load a committed-in-repo flax T5 encoder (`local:<repo-relative-dir>`).

    Offline by construction — exempt from the FORCE_FALLBACK env. Returns the
    (kind, tokenizer, model) triple or None when the directory is absent."""
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    path = os.path.join(repo_root, handle[len("local:"):])
    if not os.path.isdir(path):
        return None
    try:
        from transformers import FlaxT5EncoderModel  # noqa: PLC0415

        model = FlaxT5EncoderModel.from_pretrained(path)
    except Exception:
        return None
    _MODELS[name] = ("flax", WordTokenizer(model.config.vocab_size), model)
    return _MODELS[name]


def _try_load_hf(name: str):
    """Load (kind, tokenizer, encoder) from the HF cache/network; None on failure.

    Prefers the Flax T5 encoder (runs ON the TPU next to the diffusion model —
    the TPU-native path) and falls back to the torch encoder on the host.
    `local:` handles load a committed flax encoder from inside the repo.
    """
    if name in _MODELS:
        return _MODELS[name]
    handle = T5_VERSIONS[name]["handle"]
    if handle.startswith("local:"):
        return _load_local(name, handle)
    if os.environ.get(FORCE_FALLBACK_ENV):
        return None

    tok = None
    try:
        from transformers import T5Tokenizer  # noqa: PLC0415

        tok = T5Tokenizer.from_pretrained(handle)
    except Exception:
        return None

    try:
        from transformers import FlaxT5EncoderModel  # noqa: PLC0415

        model = FlaxT5EncoderModel.from_pretrained(handle)
        _MODELS[name] = ("flax", tok, model)
        return _MODELS[name]
    except Exception:
        pass
    try:
        from transformers import T5EncoderModel  # noqa: PLC0415

        model = T5EncoderModel.from_pretrained(handle)
        model.eval()
        _MODELS[name] = ("torch", tok, model)
        return _MODELS[name]
    except Exception:
        return None


# --------------------------------------------------------------------------- #
# deterministic offline fallback                                              #
# --------------------------------------------------------------------------- #
def _hash_token_embedding(token: str, dim: int) -> np.ndarray:
    """Stable pseudo-embedding for a token: unit-ish gaussian seeded by a
    cryptographic hash of the token text.  Deterministic across processes."""
    digest = hashlib.sha256(token.encode("utf-8")).digest()
    seed = int.from_bytes(digest[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).astype(np.float32)


def _fallback_encode(texts: List[str], name: str, max_length: int) -> Tuple[np.ndarray, np.ndarray]:
    dim = get_encoded_dim(name)
    tokenized = [t.lower().split()[:max_length] for t in texts]
    longest = max((len(t) for t in tokenized), default=1)
    longest = max(longest, 1)
    enc = np.zeros((len(texts), longest, dim), dtype=np.float32)
    mask = np.zeros((len(texts), longest), dtype=bool)
    for i, toks in enumerate(tokenized):
        for j, tok in enumerate(toks):
            emb = _hash_token_embedding(tok, dim)
            # mix in position so word order matters (cheap positional signal)
            pos = _hash_token_embedding(f"<pos{j}>", dim)
            enc[i, j] = (emb + 0.1 * pos) / np.sqrt(1.01)
            mask[i, j] = True
    return enc, mask


def t5_encode_text(
    text: List[str],
    name: str = "t5_base",
    max_length: int = MAX_LENGTH,
) -> Tuple[np.ndarray, np.ndarray]:
    """Encode captions with a frozen T5 encoder (reference t5.py:31-84).

    :param text: list of caption strings.
    :param name: registry key (see :data:`T5_VERSIONS`).
    :param max_length: truncation length (longest-padding within the batch,
        like the reference tokenizer call, t5.py:63-69).
    :return: (encodings (b, L, dim) float32 with masked rows zeroed,
        mask (b, L) bool).
    """
    loaded = _try_load_hf(name)
    if loaded is None:
        if name not in _FALLBACK_WARNED:
            _FALLBACK_WARNED.add(name)
            warnings.warn(
                f"T5 checkpoint '{T5_VERSIONS[name]['handle']}' unavailable "
                f"(offline / no cache) — using the deterministic hash text "
                f"encoder. Shapes and masks match the real encoder; semantic "
                f"quality does not.",
                stacklevel=2,
            )
        return _fallback_encode(text, name, max_length)

    kind, tokenizer, model = loaded

    if kind == "flax":
        tokenized = tokenizer.batch_encode_plus(
            text, padding="longest", max_length=max_length, truncation=True, return_tensors="np"
        )
        out = model(input_ids=tokenized.input_ids, attention_mask=tokenized.attention_mask)
        mask = tokenized.attention_mask.astype(bool)
        enc = np.asarray(out.last_hidden_state, dtype=np.float32)
        enc = enc * mask[..., None]  # zero masked positions (reference t5.py:82)
        return enc, mask

    import torch  # noqa: PLC0415  (host-side pre-encoding only)

    tokenized = tokenizer.batch_encode_plus(
        text, padding="longest", max_length=max_length, truncation=True, return_tensors="pt"
    )
    with torch.no_grad():
        out = model(input_ids=tokenized.input_ids, attention_mask=tokenized.attention_mask)
        final_encoding = out.last_hidden_state
    mask = tokenized.attention_mask.bool()
    final_encoding = final_encoding.masked_fill(~mask.unsqueeze(-1), 0.0)
    return final_encoding.numpy().astype(np.float32), mask.numpy()
