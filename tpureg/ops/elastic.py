"""On-device random elastic deformation (moving-image synthesis).

Replaces MONAI ``Rand2DElasticd`` in the training pipeline (reference
dataset.py:78-79: prob=1, spacing=(16,16), magnitude_range=(0,0.5) train /
(0.5,1) eval, zero padding, spline-mode image + nearest seg). The reference
runs this per-slice on the host CPU inside the DataLoader; here the whole
synthesis is a jit-able function on device — control-grid sampling, cubic
grid upsampling and the warp all fuse into the input pipeline step, which is
the main lever for feeding the TPU at full rate (SURVEY.md §7 "host data
pipeline throughput").

Semantics: a coarse control grid of displacement offsets (one point per
``spacing`` pixels, +1 boundary point each side) is drawn as
``N(0,1) * magnitude`` with ``magnitude ~ U(magnitude_range)`` per sample
(MONAI RandDeformGrid semantics, in pixel units), upsampled to the image
grid with bicubic interpolation (MONAI uses a spline of order 3 on the
grid), and applied as a backward warp — bilinear for images, nearest for
label maps. Deviation from MONAI: final image sampling is bilinear rather
than spline-order-3; at OASIS intensity scales the difference is below the
augmentation noise floor.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .warp import base_grid, sample2d, sample2d_nearest

__all__ = ["rand_elastic_2d", "elastic_displacement_2d", "rand_intensity"]


def rand_intensity(key: jax.Array, image, contrast=(0.7, 1.3),
                   brightness_std: float = 0.1):
    """Random contrast/brightness jitter + per-sample min-max rescale.

    On-device equivalent of the reference's ``rescale_img`` intensity
    augmentation (utils.py:113-118: contrast U(0.7,1.3), brightness
    N(0,0.1), then min-max normalize). ``image``: [B, H, W, C].
    """
    k_c, k_b = jax.random.split(key)
    b = image.shape[0]
    c = jax.random.uniform(k_c, (b, 1, 1, 1), minval=contrast[0],
                           maxval=contrast[1])
    off = jax.random.normal(k_b, (b, 1, 1, 1)) * brightness_std
    y = image * c + off
    lo = jnp.min(y, axis=(1, 2, 3), keepdims=True)
    hi = jnp.max(y, axis=(1, 2, 3), keepdims=True)
    return jnp.where(hi > lo, (y - lo) / (hi - lo), y)


def elastic_displacement_2d(
    key: jax.Array,
    batch: int,
    size: Tuple[int, int],
    spacing: Tuple[int, int] = (16, 16),
    magnitude_range: Tuple[float, float] = (0.0, 0.5),
):
    """[B, H, W, 2] smooth random displacement field in pixel units."""
    h, w = size
    gh = h // spacing[0] + 3  # control points incl. border padding
    gw = w // spacing[1] + 3
    k_mag, k_off = jax.random.split(key)
    mag = jax.random.uniform(
        k_mag, (batch, 1, 1, 1),
        minval=magnitude_range[0], maxval=magnitude_range[1],
    )
    offsets = jax.random.normal(k_off, (batch, gh, gw, 2)) * mag
    # bicubic upsample of the control grid to the image grid
    disp = jax.image.resize(offsets, (batch, h, w, 2), method="cubic")
    return disp


def rand_elastic_2d(
    key: jax.Array,
    image,
    seg=None,
    spacing: Tuple[int, int] = (16, 16),
    magnitude_range: Tuple[float, float] = (0.0, 0.5),
):
    """Deform [B, H, W, C] image (+ optional seg) by a random elastic field.

    Returns (deformed_image, deformed_seg_or_None). Zero padding outside the
    image, bilinear image sampling, nearest label sampling.
    """
    b, h, w, _ = image.shape
    disp = elastic_displacement_2d(key, b, (h, w), spacing, magnitude_range)
    pos = base_grid(h, w)[None] + disp
    px, py = pos[..., 0], pos[..., 1]
    out_img = sample2d(image, px, py)
    out_seg = None if seg is None else sample2d_nearest(seg, px, py)
    return out_img, out_seg
