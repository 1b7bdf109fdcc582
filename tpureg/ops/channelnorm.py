"""Per-pixel channel L2 norm (reference's ChannelNorm CUDA op).

``channelnorm(x)[b, y, x] = sqrt(Σ_c x[b, y, x, c]²)`` — the brightness-error /
flow-magnitude feature used six times inside the FlowNet2 cascade
(flownet2/models.py:141,153,161,167,174,180; SURVEY.md §2.2).

On TPU this is a single VPU reduction over the lane (channel) dimension; XLA
fuses it into the surrounding elementwise graph, so a Pallas kernel would add
nothing. NHWC in, NHW1 out.

Numerical note: a small ``eps`` inside the sqrt keeps the backward finite at
exact-zero inputs. Without it, training the FlowNet2 cascade NaNs within a
few steps: the brightness-error input ``x1 - warp(x2)`` is exactly zero
wherever an out-of-bounds warp tap (0) meets a zero fixed pixel — guaranteed
on masked brain MRI backgrounds — and ``d/dx sqrt(Σx²) = x/‖x‖`` is 0/0
there. The forward perturbation is ≤ 1e-6 absolute, far below activation
scale.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["channelnorm"]


def channelnorm(x, keepdims: bool = True, eps: float = 1e-12):
    acc = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=keepdims)
    return jnp.sqrt(acc + eps).astype(x.dtype)
