"""Tracing / profiling hooks (SURVEY.md §5 "tracing: none → jax.profiler").

Replaces the reference's ad-hoc timing (time.time() deltas into meters,
train.py:39-61) and its unused TimerBlock/IteratorTimer/gpumemusage helpers
(flownet2/utils/tools.py:24-53,98-128) with:

- ``TimerBlock``: context manager logging named sub-steps
- ``IteratorTimer``: wraps any iterator, accumulating per-item wall time
- ``device_memory_stats``: per-device live-bytes snapshot (the TPU analogue
  of the reference's nvidia-smi scrape)
- ``trace``: context manager around ``jax.profiler`` emitting a TensorBoard-
  readable trace directory
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

__all__ = ["TimerBlock", "IteratorTimer", "device_memory_stats", "trace"]


class TimerBlock:
    def __init__(self, title: str, log=print):
        self.title = title
        self.log = log

    def __enter__(self):
        self.start = time.perf_counter()
        self.log(f"{self.title}")
        return self

    def log_step(self, msg: str):
        self.log(f"  [{time.perf_counter() - self.start:8.3f}s] {msg}")

    def __exit__(self, *exc):
        self.log(f"  [{time.perf_counter() - self.start:8.3f}s] done")
        return False


class IteratorTimer:
    """Iterator wrapper accumulating time spent producing each item."""

    def __init__(self, iterable):
        self._it = iter(iterable)
        self.sum = 0.0
        self.count = 0

    def __iter__(self):
        return self

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)

    def __next__(self):
        t0 = time.perf_counter()
        item = next(self._it)
        self.sum += time.perf_counter() - t0
        self.count += 1
        return item


def device_memory_stats() -> dict:
    """{device: {bytes_in_use, peak_bytes_in_use, ...}} where supported."""
    import jax

    stats = {}
    for d in jax.local_devices():
        try:
            stats[str(d)] = d.memory_stats() or {}
        except Exception:
            stats[str(d)] = {}
    return stats


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Profile the enclosed block into ``logdir`` (TensorBoard 'profile')."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
