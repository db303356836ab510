"""Datasets: URL-fetch captioned images + offline synthetic data.

Capability parity with the reference data layer (/root/reference/minimagen/
training.py:33-56, 122-175, 214-313 — SURVEY.md §2b rows L/M):

- `MinimagenDataset`: indexable dataset that fetches each image from its URL
  (urllib + PIL, retries, None on failure), resizes to a square side length,
  min-max renormalizes to [0,1], rejects non-3-channel images, and attaches
  the caption's T5 encoding + mask.
- `ConceptualCaptions(args, smalldata, testset)`: dataset factory.  Uses HF
  `datasets` when importable; otherwise falls back to the bundled offline
  synthetic dataset so the training CLI runs everywhere (documented
  deviation: this environment has no `datasets` package and no network).

TPU-first changes:
- Images are NHWC numpy float32.
- T5 encoding is **batched and cached per unique caption** instead of run
  per-item inside the loader (the reference re-runs the encoder for every
  item, training.py:267 — a major inefficiency noted in SURVEY.md §7).
- Encodings/masks are padded to a *fixed* `max_length` bucket by the collator
  (see collate.py) so XLA sees static shapes.
- `SyntheticCaptionedImages`: a deterministic procedural dataset (colored
  shapes + matching captions) for offline training/tests — replaces the
  reference's live-HTTP smoke path when the network is unavailable.
"""
from __future__ import annotations

import io
import urllib.request
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..models.t5 import t5_encode_text

USER_AGENT = "minimagen_tpu/0.1 (dataset fetcher)"


# --------------------------------------------------------------------------- #
# image fetching / preprocessing                                              #
# --------------------------------------------------------------------------- #
def fetch_single_image(image_url: str, timeout: Optional[float] = None, retries: int = 0):
    """Download one image; returns a PIL.Image or None on any failure
    (reference `_fetch_single_image`, training.py:129-142)."""
    import PIL.Image  # noqa: PLC0415

    image = None
    for _ in range(retries + 1):
        try:
            request = urllib.request.Request(image_url, data=None, headers={"user-agent": USER_AGENT})
            with urllib.request.urlopen(request, timeout=timeout) as req:
                image = PIL.Image.open(io.BytesIO(req.read()))
            break
        except Exception:
            image = None
    return image


def rescale_image(arr: np.ndarray, side_length: int) -> Optional[np.ndarray]:
    """Resize an HWC [0,1] image to a square and min-max renormalize to [0,1]
    (reference `_Rescale`, training.py:33-56: resize can push values outside
    [0,1], so it re-standardizes by min/max).

    DEFAULT path is the **exact resize_right algorithm**
    (`ops/resize_right.resize_np`: cubic a=-0.5, antialiased, reflect pad,
    scale_factors=(side/h, side/w) — identical weights to the reference's
    `_resize_image_to_square`, training.py:145-175). `out_shape` is pinned to
    (side, side) so the loader's static-shape contract holds even when
    `ceil(scale*in)` would round off by one.

    Set ``MINIMAGEN_TPU_NATIVE_RESIZE=1`` to use the native C++
    antialiased-Catmull-Rom path instead (native/preprocess.cpp) — faster for
    huge inputs but a *different* resampling grid than the reference.
    """
    import os  # noqa: PLC0415

    if arr.ndim == 2:
        arr = arr[:, :, None]
    elif arr.ndim != 3:
        return None

    if os.environ.get("MINIMAGEN_TPU_NATIVE_RESIZE") == "1":
        from . import native  # noqa: PLC0415

        if native.available():
            u8 = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
            out = native.resize_image_u8(u8, side_length, renorm=True)
            if out is not None:
                return out

    from ..ops.resize_right import resize_np  # noqa: PLC0415

    h, w = arr.shape[:2]
    out = arr.astype(np.float32)
    if (h, w) != (side_length, side_length):
        try:
            out = resize_np(out, scale_factors=(side_length / h, side_length / w),
                            out_shape=(side_length, side_length),
                            dims=(0, 1), pad_mode="reflect")
        except Exception:
            return None
    lo, hi = out.min(), out.max()
    if hi <= lo:
        return None  # constant image: the reference would divide by zero
    return ((out - lo) / (hi - lo)).astype(np.float32)


def pil_to_array(img) -> np.ndarray:
    """PIL -> HWC float32 in [0,1], preserving the image's native channel
    count (the reference applies torchvision ToTensor WITHOUT an RGB convert,
    training.py:242, then rejects non-3-channel results at :264-265 — so
    grayscale/RGBA inputs must stay 1-/4-channel here to be filtered the
    same way)."""
    arr = np.asarray(img, dtype=np.float32) / 255.0
    return arr


# --------------------------------------------------------------------------- #
# caption encoding cache                                                      #
# --------------------------------------------------------------------------- #
class CaptionEncoder:
    """Batched, cached T5 caption encoding (replaces the reference's
    per-item encoder invocation, training.py:267)."""

    def __init__(self, encoder_name: str, max_length: int):
        self.encoder_name = encoder_name
        self.max_length = max_length
        self._cache: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}

    def encode(self, caption: str) -> Tuple[np.ndarray, np.ndarray]:
        if caption not in self._cache:
            enc, mask = t5_encode_text([caption], self.encoder_name, self.max_length)
            self._cache[caption] = (np.asarray(enc[0]), np.asarray(mask[0]))
        return self._cache[caption]

    def precompute(self, captions: List[str], batch_size: int = 64) -> None:
        todo = [c for c in dict.fromkeys(captions) if c not in self._cache]
        for i in range(0, len(todo), batch_size):
            chunk = todo[i : i + batch_size]
            enc, mask = t5_encode_text(chunk, self.encoder_name, self.max_length)
            for j, c in enumerate(chunk):
                n = int(mask[j].sum())
                self._cache[c] = (np.asarray(enc[j][:n]), np.asarray(mask[j][:n]))


# --------------------------------------------------------------------------- #
# datasets                                                                    #
# --------------------------------------------------------------------------- #
class MinimagenDataset:
    """URL-fetching captioned-image dataset (reference training.py:214-269).

    Items are dicts {'image': (s, s, 3) float32 NHWC-item, 'encoding':
    (L, dim) float32, 'mask': (L,) bool} or None when the fetch/resize fails
    (the collator drops Nones, like the reference collator).
    """

    def __init__(self, hf_dataset, *, encoder_name: str, max_length: int,
                 side_length: int, train: bool = True, img_transform=None,
                 fetch_timeout: Optional[float] = 10.0, fetch_retries: int = 0):
        split = "train" if train else "validation"
        self.urls = hf_dataset[split]["image_url"]
        self.captions = hf_dataset[split]["caption"]
        self.side_length = side_length
        self.img_transform = img_transform
        self.fetch_timeout = fetch_timeout
        self.fetch_retries = fetch_retries
        self.encoder = CaptionEncoder(encoder_name, max_length)

    def __len__(self):
        return len(self.urls)

    def __getitem__(self, idx: int) -> Optional[Dict[str, np.ndarray]]:
        img = fetch_single_image(self.urls[idx], timeout=self.fetch_timeout, retries=self.fetch_retries)
        if img is None:
            return None
        arr = pil_to_array(img)
        arr = rescale_image(arr, self.side_length)
        if arr is None or arr.shape[-1] != 3:
            return None
        if self.img_transform is not None:
            arr = self.img_transform(arr)
            if arr is None:
                return None
        enc, mask = self.encoder.encode(self.captions[idx])
        return {"image": arr, "encoding": enc, "mask": mask}


_SYNTH_COLORS = {
    "red": (0.9, 0.1, 0.1), "green": (0.1, 0.8, 0.15), "blue": (0.15, 0.2, 0.9),
    "yellow": (0.9, 0.85, 0.1), "purple": (0.6, 0.15, 0.75), "orange": (0.95, 0.55, 0.1),
}
_SYNTH_SHAPES = ("square", "circle", "stripes")
NUM_SYNTH_COMBOS = len(_SYNTH_COLORS) * len(_SYNTH_SHAPES)  # 18 (color, shape) pairs


def synthetic_combo_caption(combo_id: int) -> str:
    """Caption of (color, shape) combo `combo_id` in the canonical order
    `_draw_synthetic` cycles through (combo_id == index % 18)."""
    colors = list(_SYNTH_COLORS)
    color = colors[combo_id % len(colors)]
    shape = _SYNTH_SHAPES[(combo_id // len(colors)) % len(_SYNTH_SHAPES)]
    return f"a {color} {shape}"


def holdout_split(n_holdout: int, seed: int = 5) -> Tuple[List[int], List[int]]:
    """Deterministic (train_combos, held_out_combos) split of the 18 synthetic
    (color, shape) combos — the caption-generalization eval protocol
    (round-4 VERDICT next #3): train excludes the held-out combos entirely,
    then eval compares caption fidelity on seen vs never-seen combos."""
    assert 0 <= n_holdout < NUM_SYNTH_COMBOS
    rng = np.random.default_rng(seed)
    held = sorted(int(i) for i in rng.choice(NUM_SYNTH_COMBOS, n_holdout, replace=False))
    train = [i for i in range(NUM_SYNTH_COMBOS) if i not in held]
    return train, held


def _draw_synthetic(index: int, side: int) -> Tuple[np.ndarray, str]:
    """Deterministic procedural image + caption for `index`."""
    rng = np.random.default_rng(index)
    color_name = list(_SYNTH_COLORS)[index % len(_SYNTH_COLORS)]
    shape = _SYNTH_SHAPES[(index // len(_SYNTH_COLORS)) % len(_SYNTH_SHAPES)]
    color = np.array(_SYNTH_COLORS[color_name], np.float32)

    img = np.full((side, side, 3), 0.92, np.float32)
    img += rng.normal(0, 0.01, img.shape).astype(np.float32)

    yy, xx = np.mgrid[0:side, 0:side].astype(np.float32) / side
    cx, cy = rng.uniform(0.35, 0.65, 2)
    r = rng.uniform(0.18, 0.3)
    if shape == "square":
        mask = (np.abs(xx - cx) < r) & (np.abs(yy - cy) < r)
    elif shape == "circle":
        mask = (xx - cx) ** 2 + (yy - cy) ** 2 < r**2
    else:  # stripes
        mask = (np.floor(xx * 6).astype(int) % 2) == 0
    img[mask] = color

    caption = f"a {color_name} {shape}"
    return np.clip(img, 0, 1), caption


class SyntheticCaptionedImages:
    """Offline deterministic dataset with the same item contract as
    :class:`MinimagenDataset`.  Procedural colored shapes + captions; index i
    always produces the same (image, caption) pair."""

    def __init__(self, *, num_items: int, side_length: int, encoder_name: str,
                 max_length: int, seed_offset: int = 0, failure_rate: float = 0.0,
                 combos: Optional[List[int]] = None):
        self.num_items = num_items
        self.side_length = side_length
        self.seed_offset = seed_offset
        self.failure_rate = failure_rate  # simulate fetch failures for tests
        self.encoder = CaptionEncoder(encoder_name, max_length)
        # optional restriction to a subset of the 18 (color, shape) combos
        # (see holdout_split): item i cycles through `combos` and never
        # produces an excluded pair, while instance variety (position/size
        # noise) still advances with i
        if combos is not None:
            assert combos and all(0 <= c < NUM_SYNTH_COMBOS for c in combos)
        self.combos = list(combos) if combos is not None else None

    def __len__(self):
        return self.num_items

    def _underlying_index(self, idx: int) -> int:
        if self.combos is None:
            return idx + self.seed_offset
        combo = self.combos[idx % len(self.combos)]
        block = idx // len(self.combos)
        return (block + self.seed_offset) * NUM_SYNTH_COMBOS + combo

    def __getitem__(self, idx: int) -> Optional[Dict[str, np.ndarray]]:
        if self.failure_rate > 0 and np.random.default_rng(idx).uniform() < self.failure_rate:
            return None
        img, caption = _draw_synthetic(self._underlying_index(idx), self.side_length)
        enc, mask = self.encoder.encode(caption)
        return {"image": img, "encoding": enc, "mask": mask}


class _SubsetDataset:
    """Index-remapped view of a dataset (split helper)."""

    def __init__(self, base, indices):
        self.base = base
        self.indices = list(indices)

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, i):
        return self.base[self.indices[i]]


def random_split(dataset, train_size: int, seed: int = 0):
    """Random train/valid split (reference uses torch random_split,
    training.py:310)."""
    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(dataset))
    return _SubsetDataset(dataset, perm[:train_size]), _SubsetDataset(dataset, perm[train_size:])


def ConceptualCaptions(args, smalldata: bool = False, testset: bool = False):
    """Load Conceptual Captions (reference training.py:272-313).

    When HF `datasets` is unavailable or the download fails, falls back to
    :class:`SyntheticCaptionedImages` (offline parity path) with a warning.
    Returns test_dataset if `testset` else (train_dataset, valid_dataset).
    """
    dset = None
    try:
        from datasets import load_dataset  # noqa: PLC0415

        dset = load_dataset("conceptual_captions")
        if smalldata:
            num = 16
            dset = {
                "train": {
                    "image_url": dset["train"]["image_url"][:num],
                    "caption": dset["train"]["caption"][:num],
                },
                "validation": {
                    "image_url": dset["validation"]["image_url"][:num],
                    "caption": dset["validation"]["caption"][:num],
                },
            }
    except Exception:
        dset = None

    if dset is not None:
        make = lambda train: MinimagenDataset(
            dset, max_length=args.MAX_NUM_WORDS, encoder_name=args.T5_NAME,
            side_length=args.IMG_SIDE_LEN, train=train,
        )
        if testset:
            return make(False)
        full = make(True)
        train_size = int(args.TRAIN_VALID_FRAC * len(full))
        train_ds, valid_ds = random_split(full, train_size)
        if args.VALID_NUM is not None:
            valid_ds.indices = valid_ds.indices[: args.VALID_NUM + 1]
        return train_ds, valid_ds

    # ---- offline fallback ------------------------------------------------ #
    import warnings

    warnings.warn(
        "HF `datasets`/network unavailable — using the offline synthetic "
        "captioned-image dataset (deterministic shapes + captions).",
        stacklevel=2,
    )
    num = 16 if smalldata else 2048
    make_synth = lambda offset, n: SyntheticCaptionedImages(
        num_items=n, side_length=args.IMG_SIDE_LEN, encoder_name=args.T5_NAME,
        max_length=args.MAX_NUM_WORDS, seed_offset=offset,
    )
    if testset:
        return make_synth(10_000, num)
    full = make_synth(0, num)
    train_size = int(args.TRAIN_VALID_FRAC * len(full))
    train_ds, valid_ds = random_split(full, train_size)
    if args.VALID_NUM is not None:
        valid_ds.indices = valid_ds.indices[: args.VALID_NUM + 1]
    return train_ds, valid_ds
