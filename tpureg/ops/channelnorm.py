"""Per-pixel channel L2 norm (reference's ChannelNorm CUDA op).

``channelnorm(x)[b, y, x] = sqrt(Σ_c x[b, y, x, c]²)`` — the brightness-error /
flow-magnitude feature used six times inside the FlowNet2 cascade
(flownet2/models.py:141,153,161,167,174,180; SURVEY.md §2.2).

On TPU this is a single VPU reduction over the lane (channel) dimension; XLA
fuses it into the surrounding elementwise graph, so a Pallas kernel would add
nothing. NHWC in, NHW1 out.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["channelnorm"]


def channelnorm(x, keepdims: bool = True):
    acc = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=keepdims)
    return jnp.sqrt(acc).astype(x.dtype)
