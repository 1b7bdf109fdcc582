"""Self-supervised registration losses (numerics locked to reference loss.py).

Multi-scale total = Charbonnier photometric + Pearson/NCC correlation + TV
smoothness, with the reference's exact constants:

- ``charbonnier(x) = (x² + ε²)^α`` with α=0.25, ε=1e-9 (loss.py:33-35)
- per-scale weights ``0.05 * (1..n)`` — ascending, so the **coarsest** flow
  carries the largest weight (loss.py:71; deliberate trained behavior,
  SURVEY.md §7 quirks)
- λ=0.5 (smooth), γ=100 (photo), ζ=100 (corr), each scaled by 1/n
  (loss.py:66,80-82)
- photometric/correlation losses resize the *fixed* image down to each flow
  scale with bilinear align_corners=False (loss.py:11,54)
- smoothness uses forward differences with zero padding at the far edge, so
  the last row/column penalizes the raw flow magnitude — reference quirk
  preserved (loss.py:25-27)
- the correlation loss is a *global* Pearson over the whole batch tensor with
  a 1/B factor and an all-zero guard returning corr=1 (loss.py:52-64)

Everything is pure jnp on NHWC arrays and jit/grad-safe (the zero guard uses
the double-where trick so gradients stay finite).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp

from ..ops.resize import resize2d

__all__ = [
    "charbonnier",
    "photometric_loss",
    "photometric_loss_3d",
    "smoothness_loss",
    "smoothness_loss_3d",
    "correlation_loss",
    "correlation_loss_3d",
    "OFEloss",
    "DEFloss3D",
    "Affloss",
]


def charbonnier(x, alpha: float = 0.25, epsilon: float = 1.0e-9):
    return jnp.power(jnp.square(x) + epsilon**2, alpha)


def photometric_loss(fixed, warped):
    """Charbonnier photometric difference, summed, per batch element.

    ``fixed``: [B, H, W, 1]; ``warped``: [B, h, w, 1] at any flow scale —
    fixed is resized down to (h, w) (reference loss.py:9-13).
    """
    h, w = warped.shape[1], warped.shape[2]
    fixed = resize2d(fixed, (h, w), "bilinear", align_corners=False)
    return jnp.sum(charbonnier(fixed - warped)) / fixed.shape[0]


def photometric_loss_3d(fixed, warped):
    """3-D variant — no resize (reference loss.py:16-18)."""
    return jnp.sum(charbonnier(fixed - warped)) / fixed.shape[0]


def smoothness_loss(flow):
    """TV-style flow smoothness with zero-padded forward differences.

    ``flow``: [B, h, w, 2]. Matches reference loss.py:23-30 including the
    far-edge zero padding (last row/col compare against 0) and the
    sum-over-components / 2 normalization.
    """
    b = flow.shape[0]
    zeros_row = jnp.zeros_like(flow[:, :1])
    zeros_col = jnp.zeros_like(flow[:, :, :1])
    v_tr = jnp.concatenate([flow[:, 1:], zeros_row], axis=1)
    h_tr = jnp.concatenate([flow[:, :, 1:], zeros_col], axis=2)
    s = charbonnier(flow - v_tr) + charbonnier(flow - h_tr)
    s = jnp.sum(s, axis=-1) / 2.0
    return jnp.sum(s) / b


def _pearson_one_minus(fixed, warped, batch):
    """1 - global Pearson with the reference's 1/B factor and zero guard."""
    vx = warped - jnp.mean(warped)
    vy = fixed - jnp.mean(fixed)
    sx = jnp.sum(jnp.square(vx))
    sy = jnp.sum(jnp.square(vy))
    degenerate = (sx == 0.0) | (sy == 0.0)
    # double-where keeps grads finite when a branch divides by ~0
    denom = jnp.where(degenerate, 1.0, jnp.sqrt(sx) * jnp.sqrt(sy))
    corr = jnp.where(degenerate, 1.0, jnp.sum(vx * vy) / denom / batch)
    return 1.0 - corr


def correlation_loss(fixed, warped):
    """[B,H,W,1] fixed vs [B,h,w,1] warped (reference loss.py:52-64)."""
    h, w = warped.shape[1], warped.shape[2]
    fixed = resize2d(fixed, (h, w), "bilinear", align_corners=False)
    return _pearson_one_minus(fixed, warped, warped.shape[0])


def correlation_loss_3d(fixed, warped):
    """Volumetric variant, no resize (reference loss.py:38-50)."""
    return _pearson_one_minus(fixed, warped, warped.shape[0])


def OFEloss(
    flows: Sequence[jnp.ndarray],
    warpeds: Sequence[jnp.ndarray],
    fixed: jnp.ndarray,
    lamb_da: float = 0.5,
    gamma: float = 100.0,
    zeta: float = 100.0,
    weight_order: str = "ascending",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Multi-scale OFE loss → (photo, corr, smooth, total).

    ``flows[i]``: [B, h_i, w_i, 2] finest-first; ``warpeds[i]``: the moving
    image warped at that scale; ``fixed``: [B, H, W, 1].
    Reference loss.py:66-84.

    ``weight_order``: ``"ascending"`` is the reference semantics (weights
    ``0.05·(1..n)`` over the scale list — with FlowNet's finest-first flow
    tuples the COARSEST scale carries the largest weight, loss.py:71).
    ``"descending"`` reverses that: the FIRST (finest / most-refined) entry
    carries the largest weight — RAFT's supervised latest-heaviest
    convention applied to its most-refined-first iteration tuple
    (models/raft.py). NOTE: a round-5 hardware A/B found descending
    converges measurably SLOWER on registration Dice under this
    self-supervised loss (BASELINE.md "RAFT iteration-weight order"), so
    ``train.default_loss_kwargs`` keeps ascending for RAFT; the option
    remains for supervised-style schedules.
    """
    n = len(flows)
    if weight_order not in ("ascending", "descending"):
        raise ValueError(
            f"weight_order must be 'ascending'|'descending', got {weight_order!r}"
        )
    weights = 0.05 * jnp.arange(1, n + 1, dtype=jnp.float32)
    if weight_order == "descending":
        weights = weights[::-1]
    p_loss = 0.0
    c_loss = 0.0
    s_loss = 0.0
    for i in range(n):
        p_loss = p_loss + weights[i] * photometric_loss(fixed, warpeds[i])
        c_loss = c_loss + weights[i] * correlation_loss(fixed, warpeds[i])
        s_loss = s_loss + weights[i] * smoothness_loss(flows[i])
    p_loss = gamma / n * p_loss
    c_loss = zeta / n * c_loss
    s_loss = lamb_da / n * s_loss
    return p_loss, c_loss, s_loss, p_loss + s_loss + c_loss


def smoothness_loss_3d(flow):
    """Volumetric TV-style smoothness — 3-D extension of ``smoothness_loss``.

    Same construction as the 2-D reference quirk (loss.py:23-30): Charbonnier
    of zero-padded forward differences along each spatial axis, summed over
    the three displacement components / 3, averaged over batch. Used by the
    learned deformable 3-D path (no reference equivalent — its volumetric
    losses stop at the affine stage, loss.py:87-94).
    """
    b = flow.shape[0]
    s = 0.0
    for axis in (1, 2, 3):
        zeros = jnp.zeros_like(jnp.take(flow, jnp.arange(1), axis=axis))
        shifted = jnp.concatenate(
            [jnp.take(flow, jnp.arange(1, flow.shape[axis]), axis=axis), zeros],
            axis=axis,
        )
        s = s + charbonnier(flow - shifted)
    s = jnp.sum(s, axis=-1) / 3.0
    return jnp.sum(s) / b


def DEFloss3D(
    flow: jnp.ndarray,
    warped: jnp.ndarray,
    fixed: jnp.ndarray,
    lamb_da: float = 0.5,
    gamma: float = 100.0,
    zeta: float = 100.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Deformable 3-D registration loss → (photo, corr, smooth, total).

    Single-scale volumetric analogue of ``OFEloss`` with the same λ/γ/ζ
    defaults: Charbonnier photometric + global Pearson (reference 3-D
    variants, loss.py:16-19,38-50) + volumetric flow smoothness. Drives the
    learned deformable path (models/voxelmorph3d.py) — the stage beyond the
    reference's affine-only volumetric training.
    """
    p_loss = gamma * photometric_loss_3d(fixed, warped)
    c_loss = zeta * correlation_loss_3d(fixed, warped)
    s_loss = lamb_da * smoothness_loss_3d(flow)
    return p_loss, c_loss, s_loss, p_loss + c_loss + s_loss


def Affloss(warped, fixed, lamb_da: float = 1.0, gamma: float = 1.0):
    """3-D affine pre-registration loss → (photo, corr, total).

    Reference loss.py:87-94 (note: λ multiplies the correlation term there).
    """
    p_loss = gamma * photometric_loss_3d(fixed, warped)
    c_loss = lamb_da * correlation_loss_3d(fixed, warped)
    return p_loss, c_loss, p_loss + c_loss
