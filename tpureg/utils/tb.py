"""TensorBoard writer wrapper (observability parity, SURVEY.md §5).

The reference writes scalars/scalar-groups/image panels through
``torch.utils.tensorboard.SummaryWriter(flush_secs=30)`` (train.py:146,
inference.py:79-100). This wrapper keeps that surface but is torch-free
friendly: it tries ``torch.utils.tensorboard`` first, falls back to
``tensorboardX`` (same API, no torch dependency), and only then degrades
to a no-op — with a loud one-time warning so a TPU deployment without
either package knows it is flying blind, rather than silently losing all
TensorBoard observability.
"""

from __future__ import annotations

import sys

import numpy as np

__all__ = ["MetricWriter"]


def _make_writer(logdir: str, flush_secs: int):
    try:
        from torch.utils.tensorboard import SummaryWriter

        return SummaryWriter(logdir, flush_secs=flush_secs)
    except Exception:
        pass
    try:
        from tensorboardX import SummaryWriter

        return SummaryWriter(logdir, flush_secs=flush_secs)
    except Exception:
        pass
    return None


class MetricWriter:
    def __init__(self, logdir: str, flush_secs: int = 30):
        self._w = _make_writer(logdir, flush_secs)
        if self._w is None:
            print(
                "WARNING: no TensorBoard backend available (neither "
                "torch.utils.tensorboard nor tensorboardX importable) — "
                f"metric logging to {logdir!r} is DISABLED for this run.",
                file=sys.stderr,
                flush=True,
            )

    @property
    def enabled(self) -> bool:
        return self._w is not None

    def add_scalar(self, tag, value, step):
        if self._w is not None:
            self._w.add_scalar(tag, float(value), step)

    def add_scalars(self, tag, values: dict, step):
        if self._w is not None:
            self._w.add_scalars(
                tag, {k: float(v) for k, v in values.items()}, step
            )

    def add_images(self, tag, images, step, dataformats: str = "NHWC"):
        """images: [N, H, W, C] float in [0,1] or [N, C, H, W] uint8."""
        if self._w is None:
            return
        arr = np.asarray(images)
        if dataformats == "NHWC":
            arr = np.transpose(arr, (0, 3, 1, 2))
        self._w.add_images(tag, arr, step)

    def close(self):
        if self._w is not None:
            self._w.close()
