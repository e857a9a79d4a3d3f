"""Tracing / profiling hooks.

The reference has no profiler — only coarse per-epoch time.time() prints
(train_vit_sgd.py:130,159-163; SURVEY.md section 5). Here:
- `trace(logdir)`: context manager around jax.profiler.trace — produces a
  TensorBoard/Perfetto trace of device execution for any wrapped region;
- `EpochTimer`: per-epoch wall-time + images/sec accounting written to the run
  logs (and optionally a CSV column stream), which is how throughput numbers in
  BENCHLOG.md are reproduced in real runs.
"""
from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(logdir: str | None):
    """jax.profiler trace if a logdir is given, else no-op."""
    if not logdir:
        yield
        return
    import jax
    with jax.profiler.trace(logdir):
        yield


class EpochTimer:
    """Wall-clock + throughput per epoch.

    Usage:
        t = EpochTimer()
        ... epoch work ...
        line = t.finish(images=n)   # "epoch_time=42.1s images_per_sec=3041.2"
    """

    def __init__(self):
        self.t0 = time.perf_counter()

    def finish(self, images: int | None = None) -> str:
        dt = time.perf_counter() - self.t0
        parts = [f"epoch_time={dt:.1f}s"]
        if images:
            parts.append(f"images_per_sec={images / dt:.1f}")
        return " ".join(parts)

    def seconds(self) -> float:
        return time.perf_counter() - self.t0
