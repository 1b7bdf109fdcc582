"""Dense rank-3 "plane" ops for the FlowNet2 cascade's full-res glue.

Why: between subnets the cascade manipulates 1–6 channel tensors at full
resolution — upsampled flows, backward-warped images, brightness errors,
channel norms, concats (flownet2/models.py:135-185). In NHWC those tensors
put C in the TPU lane dimension, and C < 128 pads every HBM pass to 128
lanes: a 1-channel 256² bf16 tensor occupies 402 MB physical instead of
3 MB, so each elementwise glue op costs ~0.7 ms of pure padding traffic
(measured; BASELINE.md "Space-to-depth packed fusion stage"). Storing each
channel as a rank-3 plane ``[B, H, W]`` puts W in lanes — fully dense —
and every glue op (scale, diff, abs, hypot, resize, warp) runs at the
chip's elementwise rate with zero extra FLOPs.

Convs still need channel-minor layouts; :func:`pack_planes` assembles the
space-to-depth packed NHWC input (nn/packed.py layout, C-major) that the
subnet stems consume directly, paying the (4× smaller) padded write once
per stem instead of on every glue op.

- ``resize_plane``: separable matrix-product resize on planes (same
  sampling matrices as ops/resize.py — torch ``F.interpolate`` parity).
- ``warp_plane``: 'pixel'-convention bilinear backward warp (Resample2d,
  flownet2/models.py:139) of one plane by plane flows — dispatches to the
  Pallas warp kernel (ops/warp_pallas.py) which natively works on planes.
- ``pack_planes``: planes → packed NHWC ``[B, H/2, W/2, 4C]``, exactly
  ``pack2(stack(planes, -1))``.
"""

from __future__ import annotations

import os
from typing import Sequence

import jax
import jax.numpy as jnp

from .resize import _axis_matrix
from .warp import base_grid, sample2d_gather

__all__ = ["resize_plane", "warp_plane", "pack_planes", "channelnorm_planes"]


def resize_plane(x: jnp.ndarray, size, method: str = "bilinear",
                 align_corners: bool = False) -> jnp.ndarray:
    """Resize planes ``[B, H, W] → [B, H_out, W_out]`` (torch semantics).

    Two MXU matrix products (ops/resize.py sampling matrices); numerically
    identical to ``resize2d`` on the equivalent NHWC tensor.
    """
    b, h, w = x.shape
    ho, wo = size
    dt = x.dtype
    mh = jnp.asarray(_axis_matrix(h, ho, method, align_corners), dt)
    mw = jnp.asarray(_axis_matrix(w, wo, method, align_corners), dt)
    # [B,H,W] @ [W,Wo] → [B,H,Wo]; then contract H with [Ho,H]
    y = jax.lax.dot_general(x, mw.T, (((2,), (0,)), ((), ())))
    y = jax.lax.dot_general(y, mh.T, (((1,), (0,)), ((), ())))
    return jnp.transpose(y, (0, 2, 1))


def warp_plane(img: jnp.ndarray, fx: jnp.ndarray, fy: jnp.ndarray
               ) -> jnp.ndarray:
    """Bilinear backward warp of plane ``img`` [B,H,W] at pixel positions
    ``xy + (fx, fy)`` — Resample2d semantics (zero OOB taps)."""
    b, h, w = img.shape
    grid = base_grid(h, w, jnp.float32)
    px = fx.astype(jnp.float32) + grid[..., 0]
    py = fy.astype(jnp.float32) + grid[..., 1]

    from .portable import portable_ops_enabled

    p_total = h * w
    if (jax.default_backend() == "tpu"
            and not os.environ.get("TPUREG_NO_PALLAS_WARP")
            and not portable_ops_enabled()):
        from .warp_pallas import supported, warp2d_pallas

        if supported((b, h, w, 1), p_total):
            out = warp2d_pallas(img, px.reshape(b, p_total),
                                py.reshape(b, p_total))
            return out.reshape(b, h, w).astype(img.dtype)
    return sample2d_gather(img[..., None], px, py)[..., 0]


def channelnorm_planes(planes: Sequence[jnp.ndarray],
                       eps: float = 1e-12) -> jnp.ndarray:
    """L2 norm across a list of planes (ops/channelnorm.py semantics,
    including the backward-finiteness eps)."""
    acc = sum(jnp.square(p.astype(jnp.float32)) for p in planes)
    return jnp.sqrt(acc + eps).astype(planes[0].dtype)


def pack_planes(planes: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Planes (each [B, H, W]) → packed NHWC ``[B, H/2, W/2, 4C]``.

    Identical to ``nn.packed.pack2(jnp.stack(planes, -1))``: packed channel
    ``c*4 + (py*2 + px)`` — so stems consume it with the packed lowerings
    and parameter order matches the fine-layout checkpoint exactly.
    """
    parts = []
    for p in planes:
        b, h, w = p.shape
        q = p.reshape(b, h // 2, 2, w // 2, 2)
        parts.append(q.transpose(0, 1, 3, 2, 4).reshape(b, h // 2, w // 2, 4))
    return jnp.concatenate(parts, axis=-1) if len(parts) > 1 else parts[0]
