"""Synthetic random batches for smoke tests and benchmarks.

Fills the role of the reference's ``torch.rand`` ``__main__`` fixtures
(models.py:296,311; flownet2/models.py:568; PWC/models/PWCNet.py:528) and
BASELINE.json config 1 ("random data, CPU-runnable").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["random_pair_batch", "random_seg_batch", "random_volume_batch"]


def random_pair_batch(key, batch_size: int = 8, size: int = 256):
    """[B, H, W, 2] intensity-scaled fixed/moving pair batch."""
    return jax.random.uniform(key, (batch_size, size, size, 2), jnp.float32)


def random_seg_batch(key, batch_size: int = 8, size: int = 256, labels: int = 3):
    return jax.random.randint(
        key, (batch_size, size, size, 2), 0, labels + 1
    ).astype(jnp.float32)


def random_volume_batch(key, batch_size: int = 1, size=(176, 256, 256)):
    d, h, w = size
    return jax.random.uniform(key, (batch_size, d, h, w, 2), jnp.float32)
