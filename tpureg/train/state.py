"""Train state: params + batch_stats + Adam optimizer in one pytree.

Functional replacement for the reference's model/optimizer objects
(train.py:124-133). Adam hyperparameters mirror the reference exactly,
including the quirk that ``eps`` is wired to the ``--lrMin`` flag (default
1e-4, train.py:129) rather than torch's 1e-8 default.

``flat_adam`` — Adam with the first/second moments stored as ONE flat
fp32 buffer each and the update computed in flat space — is provided and
exactness-tested, but NOT the default: the round-5 hardware A/B found
the per-leaf update (18.9 ms for FlowNet2's 162.5M-param tree, 4.24 GB
at 241 GB/s effective) is already near this workload's effective
bandwidth, and the flat form's extra ravel/unravel/apply passes
(~3.5 GB) regressed the full step 97 → 106 ms. Kept for param trees
with many more, smaller leaves, where per-op overhead dominates.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.flatten_util
import jax.numpy as jnp
import optax
from flax import struct
from flax.training import train_state

__all__ = ["RegTrainState", "create_train_state", "flat_adam"]


class RegTrainState(train_state.TrainState):
    batch_stats: Any = struct.field(default_factory=dict)


class FlatAdamState(NamedTuple):
    count: jnp.ndarray  # int32 step counter
    mu: jnp.ndarray     # flat first moment, fp32
    nu: jnp.ndarray     # flat second moment, fp32


def flat_adam(learning_rate, b1: float = 0.9, b2: float = 0.999,
              eps: float = 1e-8) -> optax.GradientTransformation:
    """optax.adam with flat moment buffers and a flat-space update.

    Per element this computes exactly what ``optax.adam`` computes
    (scale_by_adam with eps_root=0, bias-corrected moments), so swapping it
    in changes no trained result — only the on-device execution shape:
    one ``ravel_pytree`` concatenation of the gradients, one fused
    elementwise update over three contiguous fp32 buffers, one unravel of
    the update tree. ``learning_rate`` may be a float or a schedule
    (callable of the step count).
    """

    def init(params):
        flat, _ = jax.flatten_util.ravel_pytree(params)
        flat = flat.astype(jnp.float32)
        return FlatAdamState(
            count=jnp.zeros((), jnp.int32),
            mu=jnp.zeros_like(flat),
            nu=jnp.zeros_like(flat),
        )

    def update(grads, state, params=None):
        del params
        flat_g, unravel = jax.flatten_util.ravel_pytree(grads)
        flat_g = flat_g.astype(jnp.float32)
        count = state.count + 1
        mu = b1 * state.mu + (1.0 - b1) * flat_g
        nu = b2 * state.nu + (1.0 - b2) * jnp.square(flat_g)
        c = count.astype(jnp.float32)
        mu_hat = mu / (1.0 - jnp.power(b1, c))
        nu_hat = nu / (1.0 - jnp.power(b2, c))
        # optax evaluates lr schedules at the PRE-increment count
        # (scale_by_learning_rate: first update sees schedule(0)) — match it
        lr = (learning_rate(state.count) if callable(learning_rate)
              else learning_rate)
        upd = -lr * mu_hat / (jnp.sqrt(nu_hat) + eps)
        return unravel(upd), FlatAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


def create_train_state(
    model,
    rng: jax.Array,
    sample_batch,
    learning_rate=1e-4,
    adam_eps: float = 1e-4,
    b1: float = 0.9,
    b2: float = 0.999,
    sample_segs=None,
    flat: bool = False,
) -> RegTrainState:
    """``flat=True`` uses ``flat_adam`` — element-wise identical to
    optax.adam, executed over flat moment buffers. Measured on the v5e
    (round 5, BASELINE.md): the flat execution does NOT pay off for this
    workload — the ravel/unravel/apply passes add ~3.5 GB of traffic per
    step, and the full FlowNet2 step regressed 97 → 106 ms — so per-leaf
    (tree) Adam stays the default. The transform remains available (and
    exactness-tested) for param trees with many more, smaller leaves."""
    # jit the init: eager init dispatches every layer op separately, which is
    # pathologically slow through a remote-device tunnel (200s vs 2s for
    # FlowNetS on axon)
    init_fn = jax.jit(
        lambda rng, imgs, segs: model.init(rng, imgs, segs, train=True)
    )
    variables = init_fn(rng, sample_batch, sample_segs)
    if flat:
        tx = flat_adam(learning_rate, b1=b1, b2=b2, eps=adam_eps)
    else:
        tx = optax.adam(learning_rate, b1=b1, b2=b2, eps=adam_eps)
    return RegTrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=tx,
    )
