"""Batching: None-tolerant collation + threaded prefetching loader.

Capability parity with the reference collator/dataloader layer
(/root/reference/minimagen/training.py:59-119, 316-322 — SURVEY.md §2b row N):
drops None/failed items, may return None for a fully-failed batch (the train
loop skips those), pads per-item masks and encodings.

TPU-first changes:
- Encodings/masks are padded to a **fixed** `max_length` bucket, not the
  per-batch longest (reference training.py:74-83) — XLA requires static
  shapes, and per-batch longest would trigger a recompile per new length.
  Padded encoding values are 0.0 and mask False (the reference pads the
  encoding with `False`→0.0 too, training.py:83).
- No device placement here: batches are host numpy; sharding/transfer happens
  in the training step (`parallel/mesh.py`), overlapping with compute.
- `DataLoader` is a minimal threaded prefetcher (the reference uses torch
  DataLoader with worker processes; here fetch latency is IO-bound so threads
  suffice and keep the framework torch-free).
"""
from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, List, Optional

import numpy as np


class MinimagenCollator:
    """Collate item dicts into fixed-shape numpy batches.

    :param max_length: static text-length bucket to pad encodings/masks to.
    :param device: unused, accepted for reference API compatibility
        (training.py:61-62); placement happens at the mesh layer.
    """

    def __init__(self, device=None, *, max_length: int = 64):
        self.device = device
        self.max_length = max_length

    def __call__(self, batch: List[Optional[Dict[str, np.ndarray]]]):
        batch = [x for x in batch if x is not None and x.get("image") is not None]
        if not batch:
            return None

        L = self.max_length
        images = np.stack([x["image"] for x in batch]).astype(np.float32)
        b = len(batch)
        dim = batch[0]["encoding"].shape[-1]
        encodings = np.zeros((b, L, dim), np.float32)
        masks = np.zeros((b, L), bool)
        for i, x in enumerate(batch):
            enc = np.squeeze(x["encoding"])
            msk = np.squeeze(x["mask"])
            if enc.ndim == 1:  # single-token caption squeezed to (dim,)
                enc = enc[None, :]
                msk = np.atleast_1d(msk)
            n = min(enc.shape[0], L)
            encodings[i, :n] = enc[:n]
            masks[i, :n] = msk[:n]
        return {"image": images, "encoding": encodings, "mask": masks}


def get_minimagen_dl_opts(device=None) -> dict:
    """Default dataloader options (reference training.py:316-322)."""
    return {
        "batch_size": 4,
        "shuffle": True,
        "num_workers": 0,
        "drop_last": True,
        "collate_fn": MinimagenCollator(device),
    }


class DataLoader:
    """Minimal threaded-prefetch dataloader over an indexable dataset.

    Mirrors the subset of the torch DataLoader surface the reference uses:
    `batch_size`, `shuffle`, `num_workers` (thread count here), `drop_last`,
    `collate_fn`; iteration yields collated batches (possibly None).
    """

    def __init__(self, dataset, batch_size: int = 4, shuffle: bool = True,
                 num_workers: int = 0, drop_last: bool = True, collate_fn=None,
                 seed: int = 0, prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(0, num_workers)
        self.drop_last = drop_last
        self.collate_fn = collate_fn or MinimagenCollator()
        self.seed = seed
        self.prefetch = prefetch
        self._epoch = 0
        # one long-lived worker pool (round-3 VERDICT weak #6: constructing a
        # ThreadPoolExecutor per batch churned threads); created lazily so a
        # num_workers=0 loader never spawns threads
        self._pool = None

    def _worker_pool(self):
        if self._pool is None:
            from concurrent.futures import ThreadPoolExecutor  # noqa: PLC0415

            self._pool = ThreadPoolExecutor(
                max_workers=self.num_workers,
                thread_name_prefix="minimagen-dl")
        return self._pool

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _index_batches(self) -> List[List[int]]:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(idx)
        batches = [idx[i : i + self.batch_size].tolist() for i in range(0, len(idx), self.batch_size)]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]
        return batches

    def _fetch_batch(self, indices: List[int]):
        if self.num_workers > 1:
            items = list(self._worker_pool().map(self.dataset.__getitem__, indices))
        else:
            items = [self.dataset[i] for i in indices]
        return self.collate_fn(items)

    def __iter__(self) -> Iterator:
        self._epoch += 1
        batches = self._index_batches()

        if self.prefetch <= 0:
            for b in batches:
                yield self._fetch_batch(b)
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        _SENTINEL = object()
        error: list = []

        def producer():
            try:
                for b in batches:
                    q.put(self._fetch_batch(b))
            except BaseException as e:  # propagate into the consumer
                error.append(e)
            finally:
                q.put(_SENTINEL)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is _SENTINEL:
                break
            yield item
        t.join()
        if error:
            raise error[0]
