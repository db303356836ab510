"""Tracing / profiling hooks.

The reference has no profiling support at all (SURVEY.md §5: progress
visibility is tqdm bars + prints).  Here:

- `trace(logdir)`: context manager around `jax.profiler` producing a
  TensorBoard-loadable XPlane trace of every XLA computation inside.
- `annotate(name)`: named trace span (shows up inside device traces).
- `StepTimer`: lightweight wall-clock step timing with steps/sec summaries,
  used by the training loop to report throughput in the progress log.
"""
from __future__ import annotations

import time
from contextlib import contextmanager
from typing import Dict, List, Optional

import jax


@contextmanager
def trace(logdir: str):
    """Capture a device/host profile into `logdir` (TensorBoard format)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span annotation visible in profiler traces."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock timing for training/sampling steps."""

    def __init__(self):
        self._t0: Optional[float] = None
        self.durations: List[float] = []

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        assert self._t0 is not None, "start() first"
        dt = time.perf_counter() - self._t0
        self.durations.append(dt)
        self._t0 = None
        return dt

    @contextmanager
    def step(self):
        self.start()
        try:
            yield
        finally:
            self.stop()

    @property
    def count(self) -> int:
        return len(self.durations)

    def summary(self, skip_first: int = 1) -> Dict[str, float]:
        """Mean/percentile step stats, skipping warmup/compile steps."""
        ds = self.durations[skip_first:] if len(self.durations) > skip_first else self.durations
        if not ds:
            return {"steps": 0, "mean_s": 0.0, "steps_per_sec": 0.0}
        mean = sum(ds) / len(ds)
        return {
            "steps": len(ds),
            "mean_s": mean,
            "steps_per_sec": (1.0 / mean) if mean > 0 else 0.0,
            "min_s": min(ds),
            "max_s": max(ds),
        }
