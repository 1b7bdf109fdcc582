"""TensorBoard writer wrapper (observability parity, SURVEY.md §5).

The reference writes scalars/scalar-groups/image panels through
``torch.utils.tensorboard.SummaryWriter(flush_secs=30)`` (train.py:146,
inference.py:79-100). This wrapper keeps that surface but degrades to a
no-op when tensorboard isn't importable, so headless test environments
don't need it.
"""

from __future__ import annotations

import numpy as np

__all__ = ["MetricWriter"]


class MetricWriter:
    def __init__(self, logdir: str, flush_secs: int = 30):
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._w = SummaryWriter(logdir, flush_secs=flush_secs)
        except Exception:
            self._w = None

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
