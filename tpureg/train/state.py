"""Train state: params + batch_stats + Adam optimizer in one pytree.

Functional replacement for the reference's model/optimizer objects
(train.py:124-133). Adam hyperparameters mirror the reference exactly,
including the quirk that ``eps`` is wired to the ``--lrMin`` flag (default
1e-4, train.py:129) rather than torch's 1e-8 default.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import optax
from flax import struct
from flax.training import train_state

__all__ = ["RegTrainState", "create_train_state"]


class RegTrainState(train_state.TrainState):
    batch_stats: Any = struct.field(default_factory=dict)


def create_train_state(
    model,
    rng: jax.Array,
    sample_batch,
    learning_rate=1e-4,
    adam_eps: float = 1e-4,
    b1: float = 0.9,
    b2: float = 0.999,
    sample_segs=None,
) -> RegTrainState:
    # jit the init: eager init dispatches every layer op separately, which is
    # pathologically slow through a remote-device tunnel (200s vs 2s for
    # FlowNetS on axon)
    init_fn = jax.jit(
        lambda rng, imgs, segs: model.init(rng, imgs, segs, train=True)
    )
    variables = init_fn(rng, sample_batch, sample_segs)
    tx = optax.adam(learning_rate, b1=b1, b2=b2, eps=adam_eps)
    return RegTrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=tx,
    )
