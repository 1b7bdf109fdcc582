"""Correlation cost-volume (the reference's hot CUDA op, rebuilt TPU-native).

Semantics match NVIDIA's ``correlation_package.Correlation`` as configured by
the reference (SURVEY.md §2.2):

- FlowNetC / FlowNet2: ``pad=20, kernel=1, max_disp=20, stride1=1, stride2=2``
  → 21×21 = 441 output channels (flownet2/networks/FlowNetC.py:28-31).
- PWC-Net: ``md=4, stride1=stride2=1`` → 9×9 = 81 channels
  (PWC/models/PWCNet.py:69).
- ``spatial_correlation_sampler`` (kernel=1, patch=21, dilation_patch=2) used
  by FlowNetS/util.py:58-72 is the same math as the FlowNetC config.

For each displacement ``d = (dy, dx)`` with ``dy, dx ∈ {-md, -md+s2, ..., md}``:

    out[b, y, x, c_d] = (1/C) * Σ_c  f1[b, y, x, c] * f2[b, y+dy, x+dx, c]

with zero contribution where ``(y+dy, x+dx)`` is out of bounds. The output
channel index is ``c_d = iy * K + ix`` (row-major over (dy, dx)) — this
matters for pretrained-checkpoint import, since conv3_1 consumes the 441
channels in this order.

This module holds the pure-``jax.numpy`` reference implementation (fully
differentiable; XLA fuses it reasonably). ``correlation_pallas.py`` provides
the fused single-pass TPU kernel behind the same signature; ``correlation()``
dispatches to it on TPU backends.

Layout: NHWC.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["correlation", "correlation_reference", "displacement_count"]


def displacement_count(max_displacement: int, stride2: int = 1) -> int:
    """Displacements per axis: K = 2*md/s2 + 1 (21 for FlowNetC, 9 for PWC)."""
    return 2 * (max_displacement // stride2) + 1


def correlation_reference(f1, f2, max_displacement: int, stride2: int = 1):
    """Pure-jnp correlation cost volume. NHWC in, [B, H, W, K*K] out.

    Defines the op's semantics; the Pallas kernel is golden-tested against it.
    """
    b, h, w, c = f1.shape
    md, s2 = max_displacement, stride2
    k = displacement_count(md, s2)
    f2p = jnp.pad(f2, ((0, 0), (md, md), (md, md), (0, 0)))
    cols = []
    for iy in range(k):
        for ix in range(k):
            # f2p[:, iy*s2 : iy*s2+h, ix*s2 : ix*s2+w] == f2 shifted by
            # (dy, dx) = (iy*s2 - md, ix*s2 - md), zero-padded.
            shifted = jax.lax.dynamic_slice(
                f2p, (0, iy * s2, ix * s2, 0), (b, h, w, c)
            )
            cols.append(jnp.sum(f1 * shifted, axis=-1))
    out = jnp.stack(cols, axis=-1)
    return out / jnp.asarray(c, out.dtype)


def correlation(f1, f2, max_displacement: int, stride2: int = 1):
    """Correlation cost volume, fused Pallas kernel on TPU, jnp elsewhere.

    ``TPUREG_PORTABLE_OPS=1`` forces the pure-XLA reference lowering even on
    TPU — used when tracing multi-platform serving artifacts, where a
    TPU-only Pallas custom call cannot appear in the CPU branch
    (serving/export.py).
    """
    from .portable import portable_ops_enabled

    if jax.default_backend() == "tpu" and not portable_ops_enabled():
        from .correlation_pallas import correlation_pallas

        return correlation_pallas(f1, f2, max_displacement, stride2)
    return correlation_reference(f1, f2, max_displacement, stride2)
