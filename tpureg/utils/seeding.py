"""Deterministic seeding, the JAX way.

The reference seeds every RNG globally (utils.py:62-69). In JAX, randomness is
explicit: one root ``jax.random.key`` is split per consumer. ``seed_everything``
still seeds the *host-side* generators (numpy / python random) used by the data
pipeline's shuffling, and returns the root JAX key for on-device randomness.
"""

from __future__ import annotations

import random
from typing import Iterator

import jax
import numpy as np


def seed_everything(seed: int = 1) -> jax.Array:
    """Seed host RNGs and return a root JAX PRNG key.

    Capability parity with reference utils.py:62-69 (there: torch/cuda/cudnn
    global seeding). Determinism of on-device sampling comes from the returned
    key, not global state.
    """
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.key(seed)


def key_seq(key: jax.Array) -> Iterator[jax.Array]:
    """Infinite iterator of fresh subkeys from a root key."""
    while True:
        key, sub = jax.random.split(key)
        yield sub
