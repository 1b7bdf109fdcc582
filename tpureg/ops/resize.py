"""Torch-parity separable resize as matrix products.

The reference leans on ``F.interpolate`` / ``nn.Upsample`` everywhere:
- STN input resize, bilinear **align_corners=True** (reference models.py:258)
- photometric-loss fixed-image resize, bilinear **align_corners=False**
  (reference loss.py:11,54)
- FlowNet2 inter-block upsample ×4 bilinear (align_corners=False default,
  flownet2/models.py:44,56) and ×4 nearest (flownet2/models.py:71-72)
- data pipeline slice resize to 256² bilinear / nearest (dataset.py:75)

On TPU, a separable linear resize is exactly two small matmuls — this keeps the
op on the MXU, avoids gathers entirely, and is bit-accurate to the PyTorch
sampling conventions (verified against torch in tests/test_resize.py).

Layout: NHWC. Weight matrices are built with numpy at trace time (static
shapes), so everything jits cleanly.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["resize2d", "resize_nd"]


@lru_cache(maxsize=None)
def _linear_matrix(n_in: int, n_out: int, align_corners: bool) -> np.ndarray:
    """(n_out, n_in) row-stochastic matrix for 1-D linear interpolation.

    align_corners=True : src = i * (n_in-1)/(n_out-1)
    align_corners=False: src = (i+0.5) * n_in/n_out - 0.5, clamped to edges
    (PyTorch upsampling convention; half-pixel centers.)
    """
    out = np.zeros((n_out, n_in), dtype=np.float64)
    if n_in == 1:
        out[:, 0] = 1.0
        return out.astype(np.float32)
    if align_corners:
        if n_out == 1:
            src = np.zeros(1)
        else:
            src = np.arange(n_out) * (n_in - 1) / (n_out - 1)
    else:
        src = (np.arange(n_out) + 0.5) * (n_in / n_out) - 0.5
    src = np.clip(src, 0.0, n_in - 1)
    lo = np.floor(src).astype(np.int64)
    lo = np.minimum(lo, n_in - 2)
    frac = src - lo
    out[np.arange(n_out), lo] = 1.0 - frac
    out[np.arange(n_out), lo + 1] = frac
    return out.astype(np.float32)


@lru_cache(maxsize=None)
def _nearest_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) one-hot matrix for PyTorch 'nearest' resize.

    PyTorch nearest (legacy, used by ``mode='nearest'``): src = floor(i * n_in/n_out).
    """
    idx = np.floor(np.arange(n_out) * (n_in / n_out)).astype(np.int64)
    idx = np.clip(idx, 0, n_in - 1)
    out = np.zeros((n_out, n_in), dtype=np.float32)
    out[np.arange(n_out), idx] = 1.0
    return out


def _axis_matrix(n_in: int, n_out: int, method: str, align_corners: bool) -> np.ndarray:
    if method == "bilinear" or method == "linear":
        return _linear_matrix(n_in, n_out, align_corners)
    if method == "nearest":
        return _nearest_matrix(n_in, n_out)
    raise ValueError(f"unknown resize method: {method}")


def resize2d(x, size, method: str = "bilinear", align_corners: bool = False):
    """Resize NHWC (or HWC / HW) images to ``size=(H_out, W_out)``.

    Exactly matches ``torch.nn.functional.interpolate(mode=...)`` for
    'bilinear' (both align_corners conventions) and 'nearest'.
    Implemented as ``A_h @ img @ A_w^T`` so it runs on the MXU.
    """
    h_out, w_out = size
    h_in, w_in = x.shape[-3], x.shape[-2]
    if (h_in, w_in) == (h_out, w_out):
        return x
    ah = jnp.asarray(_axis_matrix(h_in, h_out, method, align_corners))
    aw = jnp.asarray(_axis_matrix(w_in, w_out, method, align_corners))
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    # contract H then W; einsum keeps everything fused & on the MXU.
    # HIGHEST precision = fp32 accumulation on TPU (these matmuls are tiny;
    # exactness vs the PyTorch convention matters more than MXU bf16 speed).
    y = jnp.einsum("oh,...hwc->...owc", ah, xf, precision=jax.lax.Precision.HIGHEST)
    y = jnp.einsum("pw,...hwc->...hpc", aw, y, precision=jax.lax.Precision.HIGHEST)
    return y.astype(dtype)


def resize_nd(x, size, method: str = "linear", align_corners: bool = False):
    """Resize the leading spatial dims of ``[..., *spatial, C]`` arrays.

    Generalization used by the 3-D volume path (reference dataset.py:147
    ``Resized(spatial_size=(256,256,176))``). ``size`` is a tuple of output
    spatial extents; ``x`` has layout ``[batch?, *spatial, C]``.
    """
    n_sp = len(size)
    spatial_in = x.shape[-1 - n_sp : -1]
    dtype = x.dtype
    y = x.astype(jnp.float32)
    for ax, (n_in, n_out) in enumerate(zip(spatial_in, size)):
        if n_in == n_out:
            continue
        mat = jnp.asarray(_axis_matrix(n_in, n_out, method, align_corners))
        axis = y.ndim - 1 - n_sp + ax
        y = jnp.moveaxis(
            jnp.tensordot(
                mat,
                jnp.moveaxis(y, axis, 0),
                axes=([1], [0]),
                precision=jax.lax.Precision.HIGHEST,
            ),
            0,
            axis,
        )
    return y.astype(dtype)
