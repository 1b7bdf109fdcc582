"""Registration head: flow predictor + spatial-transformer warping (L2).

Capability parity with ``opticalFlowReg`` (reference models.py:208-289):

- predictor selected by name through the model registry (models.py:212-252)
- ``stn``: the moving frame is bilinearly resized (align_corners=True) to
  each flow's resolution, then backward-warped with the 'stn' grid
  convention (models.py:256-268)
- forward warps the moving image at **every** flow scale, the moving
  segmentation and a 16-px visualization grid at the finest scale
  (models.py:277-281)
- warped segmentations are rounded and clipped to the label range [0, 3] —
  the reference does this through a GPU→CPU→GPU numpy round-trip
  (models.py:286); here it is a fused on-device ``clip(rint(x))``
- both forward signatures are supported: train-style ``(imgs)`` and
  eval-style ``(imgs, segs)`` (models.py:270-271 / train.py:50 /
  inference.py:53) via ``segs: Optional``.

Layout: imgs/segs are [B, H, W, 2] (channel 0 fixed, 1 moving); flows are
[B, h, w, 2].
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..models import build_predictor
from ..ops.resize import resize2d
from ..ops.warp import warp2d

__all__ = ["OpticalFlowReg", "stn_warp", "grid_image"]


def stn_warp(flow, frame):
    """Warp ``frame`` [B, H, W, C] by ``flow`` [B, h, w, 2] at flow scale.

    Reference models.py:256-268: resize frame → flow resolution
    (bilinear, align_corners=True), then grid-sample with the 'stn'
    convention.
    """
    h, w = flow.shape[1], flow.shape[2]
    frame = resize2d(frame, (h, w), "bilinear", align_corners=True)
    return warp2d(frame, flow, convention="stn")


def grid_image(size: int = 256, spacing: int = 16, offset: int = 7):
    """[size, size] image with 1.0 grid lines (reference utils.py:15-23)."""
    img = jnp.zeros((size, size), jnp.float32)
    idx = jnp.arange(offset, size - 1, spacing)
    img = img.at[idx, :].set(1.0)
    img = img.at[:, idx].set(1.0)
    return img


class OpticalFlowReg(nn.Module):
    """Registration head wrapping any registry predictor."""

    conv_predictor: str = "flownets"
    use_bn: bool = True
    num_seg_labels: int = 3

    def setup(self):
        self.predictor = build_predictor(self.conv_predictor, self.use_bn)

    def __call__(
        self,
        imgs: jnp.ndarray,
        segs: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> Tuple[
        Tuple[jnp.ndarray, ...],
        Tuple[jnp.ndarray, ...],
        Optional[jnp.ndarray],
        jnp.ndarray,
    ]:
        flows = self.predictor(imgs, train=train)
        moving = imgs[..., 1:2]

        # Warp each DISTINCT flow once: FlowNet2 returns the fusion flow
        # twice (reference flownet2/models.py:191), and XLA does not
        # reliably CSE duplicate Pallas custom-calls — without this, the
        # cascade pays a second full-resolution warp fwd+bwd for the
        # identical tensor. Object identity only (no value comparison), so
        # the math is unchanged for every model.
        warp_cache = {}
        warped_images = []
        for f in flows:
            if id(f) not in warp_cache:
                warp_cache[id(f)] = stn_warp(f, moving)
            warped_images.append(warp_cache[id(f)])
        warped_images = tuple(warped_images)

        warped_segs_int = None
        if segs is not None:
            m_seg = segs[..., 1:2]
            warped_seg = stn_warp(flows[0], m_seg)
            # on-device replacement for the reference's numpy round-trip
            # (models.py:286): bilinear-warped labels rounded to [0, labels]
            warped_segs_int = jnp.clip(
                jnp.rint(warped_seg), 0, self.num_seg_labels
            )

        h, w = imgs.shape[1], imgs.shape[2]
        grid = grid_image(h)[None, :, :, None]
        grid = jnp.broadcast_to(grid, (imgs.shape[0], h, w, 1))
        warped_grid = stn_warp(flows[0], grid)

        return flows, warped_images, warped_segs_int, warped_grid
