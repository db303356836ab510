"""On-disk dataset cache: prefetch images + pre-computed text encodings.

The reference fetches every image over HTTP and re-runs the T5 encoder for
every item, every epoch, inside the dataset loop (training.py:251-269) — the
dominant input-pipeline cost.  This module materializes a dataset once into
npz shards (images resized/normalized, encodings computed batched) and serves
epochs from disk at memory-map speed: the offline-first pipeline SURVEY.md §7
calls for.

Usage:
    build_cache(dataset, "cache_dir")            # once
    ds = CachedCaptionedImages("cache_dir")      # every run
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np

SHARD_SIZE = 256


def build_cache(dataset, out_dir: str, *, shard_size: int = SHARD_SIZE,
                num_threads: int = 8) -> Dict:
    """Materialize an indexable captioned-image dataset into npz shards.

    Failed items (None) are skipped — the cache contains only good items, so
    downstream batches are always full (unlike the live-fetch path's
    None-tolerant collation).

    :return: the manifest dict (also written to manifest.json).
    """
    from concurrent.futures import ThreadPoolExecutor  # noqa: PLC0415

    os.makedirs(out_dir, exist_ok=True)

    def fetch(i):
        try:
            return dataset[i]
        except Exception:
            return None

    items: List = []
    with ThreadPoolExecutor(max_workers=num_threads) as ex:
        for item in ex.map(fetch, range(len(dataset))):
            if item is not None:
                items.append(item)

    shards = []
    for s in range(0, len(items), shard_size):
        chunk = items[s : s + shard_size]
        max_len = max(x["encoding"].shape[0] for x in chunk)
        dim = chunk[0]["encoding"].shape[-1]
        images = np.stack([x["image"] for x in chunk]).astype(np.float32)
        encodings = np.zeros((len(chunk), max_len, dim), np.float32)
        masks = np.zeros((len(chunk), max_len), bool)
        for i, x in enumerate(chunk):
            n = x["encoding"].shape[0]
            encodings[i, :n] = x["encoding"]
            masks[i, :n] = np.asarray(x["mask"]).reshape(-1)[:n]
        name = f"shard_{s // shard_size:05d}.npz"
        np.savez(os.path.join(out_dir, name), image=images, encoding=encodings, mask=masks)
        shards.append({"file": name, "count": len(chunk)})

    manifest = {"num_items": len(items), "shard_size": shard_size, "shards": shards}
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


class CachedCaptionedImages:
    """Indexable dataset over a `build_cache` directory (lazy per-shard loads,
    LRU of one shard — access patterns are sequential-ish after shuffling at
    the batch level)."""

    def __init__(self, cache_dir: str):
        self.cache_dir = cache_dir
        with open(os.path.join(cache_dir, "manifest.json")) as f:
            self.manifest = json.load(f)
        self.shard_size = self.manifest["shard_size"]
        self._loaded_idx: Optional[int] = None
        self._loaded = None

    def __len__(self):
        return self.manifest["num_items"]

    def _shard(self, shard_idx: int):
        if self._loaded_idx != shard_idx:
            path = os.path.join(self.cache_dir, self.manifest["shards"][shard_idx]["file"])
            self._loaded = np.load(path)
            self._loaded_idx = shard_idx
        return self._loaded

    def __getitem__(self, idx: int):
        shard = self._shard(idx // self.shard_size)
        j = idx % self.shard_size
        return {
            "image": shard["image"][j],
            "encoding": shard["encoding"][j],
            "mask": shard["mask"][j],
        }
