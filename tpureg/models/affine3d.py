"""3-D affine pre-registration network (volumetric path).

Reference: ``affmodel`` models.py:156-191 — a 3-D conv stack (ReLU) flattened
into a fully-connected layer predicting a 3×4 affine matrix, applied to the
moving volume through ``affine_grid`` + ``grid_sample``. Trained with
``Affloss`` (loss.py:87-94) on whole volumes from volume_ds
(dataset.py:100-167).

Layout: volumes are [B, D, H, W, C] (C=2 fixed/moving stacked). The affine
warp reproduces torch ``affine_grid(align_corners=False)`` semantics: theta
acts on normalized coordinates in [-1, 1] with half-pixel centers, applied
via the shared trilinear sampler.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

__all__ = ["AffineNet3D", "affine_warp3d"]


def _norm_coords(n: int):
    """torch align_corners=False normalized centers: (-1+1/n .. 1-1/n)."""
    return (2.0 * jnp.arange(n, dtype=jnp.float32) + 1.0) / n - 1.0


def affine_warp3d(vol, theta):
    """Warp [B, D, H, W, C] by theta [B, 3, 4] (torch affine_grid semantics).

    torch's affine_grid maps output coords (x, y, z) normalized over (W, H, D)
    through theta rows (x', y', z'); grid_sample then samples with
    align_corners=False. Implemented gather-style with zero OOB taps.
    """
    b, d, h, w, c = vol.shape
    zs, ys, xs = _norm_coords(d), _norm_coords(h), _norm_coords(w)
    zz, yy, xx = jnp.meshgrid(zs, ys, xs, indexing="ij")  # (D, H, W)
    ones = jnp.ones_like(xx)
    coords = jnp.stack([xx, yy, zz, ones], axis=-1)  # (D, H, W, 4)
    # (B, D, H, W, 3) target normalized positions
    pos = jnp.einsum("dhwk,bjk->bdhwj", coords, theta)
    # align_corners=False: pixel = ((g+1)*n - 1)/2
    px = ((pos[..., 0] + 1.0) * w - 1.0) / 2.0
    py = ((pos[..., 1] + 1.0) * h - 1.0) / 2.0
    pz = ((pos[..., 2] + 1.0) * d - 1.0) / 2.0

    x0 = jnp.floor(px); y0 = jnp.floor(py); z0 = jnp.floor(pz)
    fx = px - x0; fy = py - y0; fz = pz - z0
    x0i = x0.astype(jnp.int32); y0i = y0.astype(jnp.int32); z0i = z0.astype(jnp.int32)
    flat = vol.reshape(b, d * h * w, c)

    def tap(xi, yi, zi, wgt):
        inb = ((xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
               & (zi >= 0) & (zi <= d - 1))
        idx = ((jnp.clip(zi, 0, d - 1) * h + jnp.clip(yi, 0, h - 1)) * w
               + jnp.clip(xi, 0, w - 1)).reshape(b, -1)
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return vals.reshape(*xi.shape, c) * (wgt * inb)[..., None]

    out = 0.0
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                wgt = ((fx if dx else 1 - fx) * (fy if dy else 1 - fy)
                       * (fz if dz else 1 - fz))
                out = out + tap(x0i + dx, y0i + dy, z0i + dz, wgt)
    return out


class AffineNet3D(nn.Module):
    """Conv3D stack → FC → 3×4 affine; warps the moving channel.

    Input [B, D, H, W, 2] (depth-last spatial stride pattern mirrors the
    reference's (2,2,1)/(2,2,1)/2/2/2/2 stride schedule over (H, W, D) —
    here (D-handling mapped onto our DHWC layout). Returns (theta, warped).
    """

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        b = x.shape[0]
        moving = x[..., 1:2]

        specs = [  # (features, kernel, (sD, sH, sW))
            (16, 7, (1, 2, 2)),
            (32, 5, (1, 2, 2)),
            (64, 3, (2, 2, 2)),
            (128, 3, (2, 2, 2)),
            (256, 3, (2, 2, 2)),
            (512, 3, (2, 2, 2)),
        ]
        y = x
        for i, (f, k, s) in enumerate(specs, start=1):
            y = nn.Conv(f, (k, k, k), strides=s,
                        padding=[(((k - 1) // 2),) * 2] * 3,
                        name=f"conv{i}")(y)
            y = nn.relu(y)
        y = y.reshape(b, -1)
        # identity-initialized head: zero weights + identity-affine bias keeps
        # the warp a no-op at init (stabler than the reference's default init)
        theta = nn.Dense(
            12,
            kernel_init=nn.initializers.zeros_init(),
            bias_init=lambda key, shape, dtype=jnp.float32: jnp.asarray(
                [1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0], dtype
            ),
            name="fc",
        )(y)
        theta = theta.reshape(b, 3, 4)
        warped = affine_warp3d(moving, theta)
        return theta, warped
