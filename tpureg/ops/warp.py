"""Bilinear backward warping (spatial transformer) for dense flow fields.

The reference uses three subtly different grid conventions that all must be
reproduced (SURVEY.md §7 "hard parts"):

- ``convention='stn'``   — the registration head's STN (reference
  models.py:256-268): normalized grid ``(flow+xy) * 2/size - 1`` followed by
  ``grid_sample(align_corners=True)``. Net effect: sample position
  ``p = (flow + xy) * (size-1)/size`` with zero padding.
- ``convention='pwc'``   — PWC-Net's in-model warp (reference
  PWC/models/PWCNet.py:143-179): ``2*(flow+xy)/(size-1) - 1`` followed by
  ``grid_sample(align_corners=False)`` → ``p = (flow+xy)*size/(size-1) - 0.5``,
  plus a warped-ones validity mask thresholded at 0.9999.
- ``convention='pixel'`` — FlowNet2's Resample2d CUDA op (flownet2/models.py:
  139,151,163,176): direct pixel coordinates ``p = xy + flow``, zero
  contribution from out-of-bounds taps.

All conventions share one 4-tap gather core. Images are NHWC; flow is
``[..., 2]`` with last axis ``(u_x, u_y)``.

On TPU the 4-tap gather compiles to XLA gather over a flattened (H*W, C)
payload; at the reference's shapes (≤256², C≤128 at ≤64²) this is a tiny
fraction of the conv FLOPs, so no Pallas kernel is needed here (the genuinely
hot custom op — correlation — does get one; see correlation_pallas.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["warp2d", "warp3d", "base_grid", "sample2d", "sample2d_gather",
           "sample2d_nearest", "sample3d", "sample3d_gather"]


def base_grid(h: int, w: int, dtype=jnp.float32):
    """(h, w, 2) grid of integer pixel coordinates, last axis (x, y).

    Matches reference models.py:195-204 / PWCNet.py:152-157 (xx, yy stacking).
    """
    xs = jnp.arange(w, dtype=dtype)
    ys = jnp.arange(h, dtype=dtype)
    xx, yy = jnp.meshgrid(xs, ys)  # both (h, w)
    return jnp.stack([xx, yy], axis=-1)


def sample2d(img, px, py):
    """Bilinear sample of NHWC ``img`` at float pixel positions (px, py).

    ``px``/``py`` are [B, H_out, W_out]. Out-of-bounds taps contribute zero
    (PyTorch grid_sample ``padding_mode='zeros'`` semantics — each of the four
    taps is zeroed independently when it falls outside the image).
    Returns [B, H_out, W_out, C].

    On TPU, single-channel full-resolution warps dispatch to the fused
    Pallas kernel (ops/warp_pallas.py) — the gather lowering is a scalar
    loop and dominated the FlowNet2 train step before this.
    """
    import os

    from .portable import portable_ops_enabled

    b, h, w, c = img.shape
    p_total = int(px.shape[1] * px.shape[2]) if px.ndim == 3 else 0
    if (p_total and jax.default_backend() == "tpu"
            and not os.environ.get("TPUREG_NO_PALLAS_WARP")
            and not portable_ops_enabled()):
        from .warp_pallas import supported, warp2d_pallas

        if supported(img.shape, p_total):
            out = warp2d_pallas(
                img[..., 0],
                px.reshape(b, p_total).astype(jnp.float32),
                py.reshape(b, p_total).astype(jnp.float32),
            )
            return out.reshape(*px.shape, 1).astype(img.dtype)
    return sample2d_gather(img, px, py)


def sample2d_gather(img, px, py):
    """Reference 4-tap gather implementation (semantics oracle, CPU path)."""
    b, h, w, c = img.shape
    compute_dtype = img.dtype if img.dtype == jnp.float64 else jnp.float32
    px = px.astype(compute_dtype)
    py = py.astype(compute_dtype)

    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    fx = px - x0
    fy = py - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    flat = img.reshape(b, h * w, c).astype(compute_dtype)

    def tap(xi, yi, weight):
        inb = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        xi_c = jnp.clip(xi, 0, w - 1)
        yi_c = jnp.clip(yi, 0, h - 1)
        idx = (yi_c * w + xi_c).reshape(b, -1)  # [B, H_out*W_out]
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
        vals = vals.reshape(*xi.shape, c)
        wgt = (weight * inb.astype(compute_dtype))[..., None]
        return vals * wgt

    out = (
        tap(x0i, y0i, (1 - fx) * (1 - fy))
        + tap(x0i + 1, y0i, fx * (1 - fy))
        + tap(x0i, y0i + 1, (1 - fx) * fy)
        + tap(x0i + 1, y0i + 1, fx * fy)
    )
    return out.astype(img.dtype)


def sample2d_nearest(img, px, py):
    """Nearest-neighbor sample of NHWC ``img`` at float pixel positions.

    Out-of-bounds positions yield zero. Used for label-map (segmentation)
    warping in the data pipeline (MONAI ``mode='nearest'`` equivalent,
    reference dataset.py:79).
    """
    b, h, w, c = img.shape
    xi = jnp.rint(px).astype(jnp.int32)
    yi = jnp.rint(py).astype(jnp.int32)
    inb = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
    idx = (jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)).reshape(b, -1)
    flat = img.reshape(b, h * w, c)
    vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
    return vals.reshape(*xi.shape, c) * inb[..., None].astype(img.dtype)


def warp2d(img, flow, convention: str = "stn", return_mask: bool = False,
           mask_threshold: float = 0.9999):
    """Backward-warp NHWC ``img`` by flow ``[B, H, W, 2]`` (x, y displacement).

    ``convention`` selects the reference grid convention (module docstring).
    For 'pwc', the output is always multiplied by the thresholded validity
    mask (PWCNet.py:169-179); with ``return_mask=True`` the call returns
    ``(masked_output, mask)`` so callers can reuse the mask.
    ``mask_threshold`` is the validity cutoff — 0.9999 for the new PWCDCNet
    (:169), 0.999 for PWCDCNet_old's in-model warp (:405).
    """
    b, h, w, _ = flow.shape
    grid = base_grid(h, w, jnp.float32)
    pos = grid + flow.astype(jnp.float32)
    px, py = pos[..., 0], pos[..., 1]

    if convention == "stn":
        # reference models.py:262-266: grid*2/size - 1, grid_sample align_corners=True
        # → p_src = (flow + xy) * (size-1)/size
        px = px * ((w - 1) / w)
        py = py * ((h - 1) / h)
        out = sample2d(img, px, py)
        mask = None
    elif convention == "pwc":
        # PWCNet.py:164-168: 2*(flow+xy)/(size-1) - 1, grid_sample align_corners=False
        # → p_src = (flow+xy) * size/(size-1) - 0.5
        px = px * (w / max(w - 1, 1)) - 0.5
        py = py * (h / max(h - 1, 1)) - 0.5
        out = sample2d(img, px, py)
        ones = jnp.ones_like(img)
        mask = sample2d(ones, px, py)
        mask = jnp.where(mask < mask_threshold, 0.0, 1.0).astype(img.dtype)
        out = out * mask
    elif convention == "pixel":
        # flownet2 Resample2d: direct pixel displacement, zero OOB taps
        out = sample2d(img, px, py)
        mask = None
    else:
        raise ValueError(f"unknown warp convention: {convention}")

    if return_mask:
        return out, mask
    return out


def sample3d(vol, px, py, pz):
    """Trilinear sample of ``[B, D, H, W, C]`` volumes at float voxel
    positions px/py/pz ``[B, D, H, W]``. Zero out-of-bounds taps.

    On TPU, single-channel volumes dispatch to the fused banded Pallas
    kernel (ops/warp3d_pallas.py) — the 8-tap gather lowering is memory-
    latency bound and dominated the full-resolution VoxelMorph3D train
    step (804.6 ms forward per (256,256,176) volume) before this. The
    kernel's traced guard falls back to the gather for flows whose row
    taps don't fit its windows, so dispatch is always exact.
    """
    import os

    b, d, h, w, c = vol.shape
    if (c == 1 and jax.default_backend() == "tpu"
            and not os.environ.get("TPUREG_NO_PALLAS_WARP3D")):
        from .portable import portable_ops_enabled
        from .warp3d_pallas import supported, warp3d_pallas

        if not portable_ops_enabled() and supported((b, d, h, w)):
            p = d * h * w
            out = warp3d_pallas(
                vol[..., 0],
                px.reshape(b, p).astype(jnp.float32),
                py.reshape(b, p).astype(jnp.float32),
                pz.reshape(b, p).astype(jnp.float32),
            )
            return out.reshape(b, d, h, w, 1).astype(vol.dtype)
    return sample3d_gather(vol, px, py, pz)


def sample3d_gather(vol, px, py, pz):
    """Reference 8-tap gather implementation (semantics oracle, CPU path)."""
    b, d, h, w, c = vol.shape
    compute_dtype = jnp.float32
    px = px.astype(compute_dtype)
    py = py.astype(compute_dtype)
    pz = pz.astype(compute_dtype)
    x0 = jnp.floor(px); y0 = jnp.floor(py); z0 = jnp.floor(pz)
    fx = px - x0; fy = py - y0; fz = pz - z0
    x0i = x0.astype(jnp.int32); y0i = y0.astype(jnp.int32); z0i = z0.astype(jnp.int32)

    flat = vol.reshape(b, d * h * w, c).astype(compute_dtype)

    def tap(xi, yi, zi, weight):
        inb = (
            (xi >= 0) & (xi <= w - 1)
            & (yi >= 0) & (yi <= h - 1)
            & (zi >= 0) & (zi <= d - 1)
        )
        xi_c = jnp.clip(xi, 0, w - 1)
        yi_c = jnp.clip(yi, 0, h - 1)
        zi_c = jnp.clip(zi, 0, d - 1)
        idx = ((zi_c * h + yi_c) * w + xi_c).reshape(b, -1)
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
        vals = vals.reshape(*xi.shape, c)
        return vals * (weight * inb.astype(compute_dtype))[..., None]

    out = 0.0
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                wgt = (
                    (fx if dx else 1 - fx)
                    * (fy if dy else 1 - fy)
                    * (fz if dz else 1 - fz)
                )
                out = out + tap(x0i + dx, y0i + dy, z0i + dz, wgt)
    return out.astype(vol.dtype)


def warp3d(vol, flow, convention: str = "pixel"):
    """Backward-warp ``[B, D, H, W, C]`` volumes by ``[B, D, H, W, 3]`` flow.

    3-D analogue (supports the volumetric path, reference dataset.py:100-167 +
    models.py:156-191). Flow last axis is (u_x, u_y, u_z) over (W, H, D).
    Trilinear, zero out-of-bounds taps.
    """
    del convention  # single pixel-displacement convention in the 3-D path
    b, d, h, w, c = vol.shape
    compute_dtype = jnp.float32
    zs = jnp.arange(d, dtype=compute_dtype)
    ys = jnp.arange(h, dtype=compute_dtype)
    xs = jnp.arange(w, dtype=compute_dtype)
    zz, yy, xx = jnp.meshgrid(zs, ys, xs, indexing="ij")
    px = xx[None] + flow[..., 0].astype(compute_dtype)
    py = yy[None] + flow[..., 1].astype(compute_dtype)
    pz = zz[None] + flow[..., 2].astype(compute_dtype)
    return sample3d(vol, px, py, pz)
