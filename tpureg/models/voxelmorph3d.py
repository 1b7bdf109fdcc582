"""Learned 3-D deformable registration: VoxelMorph-style SVF UNet.

The reference's volumetric path stops at the affine stage (``affmodel``,
reference models.py:156-191, trained with ``Affloss`` loss.py:87-94); full
deformable 3-D registration exists there only as the *classical* ANTs SyN
comparator (inference_ants.py:51-57). This module completes the learned side:
a UNet predicts a stationary velocity field (SVF) over the whole volume, the
field is exponentiated by scaling-and-squaring into a diffeomorphic
displacement, and the moving volume is trilinearly warped — the standard
probabilistic-VoxelMorph construction (Balakrishnan et al. 2019 / Dalca et
al. 2018), built TPU-first:

- all convolutions are NDHWC 3³ kernels → XLA maps them straight to the MXU;
- the velocity field lives at 1/``int_downsize`` resolution, so the
  ``int_steps`` scaling-and-squaring warp compositions run on a volume 8×
  smaller than full resolution (int_downsize=2);
- up/downsampling uses the framework's separable matmul resize
  (ops/resize.py) — no gathers;
- under a device mesh the volume can be spatially sharded ('spatial' axis,
  H dimension): convolutions and the trilinear warp are resolved by GSPMD
  with halo exchanges, same as the affine path (cli/train3d.py
  --spatial_shards).

Output contract matches the classical comparator (classical/syn3d.py):
``(flow, warped)`` with flow in pixel units, last axis (u_x, u_y, u_z), so
the Jacobian-regularity metrics and ``apply_flow3d`` work unchanged on either
path.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..classical.syn3d import exp_velocity3d
from ..ops.resize import resize_nd
from ..ops.warp import warp3d

__all__ = ["VoxelMorph3D"]


class _Conv3DBlock(nn.Module):
    """3³ conv (optional stride) + LeakyReLU(0.2) — VoxelMorph convention."""

    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(
            self.features,
            (3, 3, 3),
            strides=(self.stride,) * 3,
            padding=((1, 1),) * 3,
            name="conv",
        )(x)
        return nn.leaky_relu(y, 0.2)


def _up2(x):
    """Nearest ×2 upsample of [B, D, H, W, C] (matmul resize, no gathers)."""
    d, h, w = x.shape[1:4]
    return resize_nd(x, (2 * d, 2 * h, 2 * w), "nearest")


class VoxelMorph3D(nn.Module):
    """UNet → stationary velocity field → diffeomorphic 3-D warp.

    ``__call__(x)`` with ``x`` [B, D, H, W, 2] (channel 0 fixed, 1 moving)
    returns ``(flow, warped, velocity)``:

    - ``flow``     [B, D, H, W, 3] full-resolution displacement (pixel units)
    - ``warped``   [B, D, H, W, 1] moving warped to fixed
    - ``velocity`` [B, D/s, H/s, W/s, 3] the SVF (s = int_downsize), exposed
      for velocity-space regularization.

    D, H, W must be divisible by 2^len(enc_features).
    """

    enc_features: Sequence[int] = (16, 32, 32, 32)
    dec_features: Sequence[int] = (32, 32, 32)
    extra_features: Sequence[int] = (32, 16, 16)
    int_steps: int = 7
    int_downsize: int = 2

    @nn.compact
    def __call__(
        self, x, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        assert self.int_downsize in (1, 2)
        b, d, h, w, _ = x.shape
        moving = x[..., 1:2]

        # --- UNet encoder: stride-2 conv pyramid
        skips = []
        y = x
        for i, f in enumerate(self.enc_features):
            y = _Conv3DBlock(f, stride=2, name=f"enc{i}")(y)
            skips.append(y)

        # --- decoder: conv + ×2 upsample + skip concat, down to 1/int_downsize
        n_up = len(self.enc_features) - (1 if self.int_downsize == 2 else 0)
        for i, f in enumerate(self.dec_features):
            y = _Conv3DBlock(f, name=f"dec{i}")(y)
            y = _up2(y)
            y = jnp.concatenate([y, skips[-(i + 2)]], axis=-1)
        # remaining upsamples (full-res case int_downsize=1; the final step
        # reaches input resolution, where there is no skip to concatenate)
        for i in range(len(self.dec_features), n_up):
            y = _Conv3DBlock(self.dec_features[-1], name=f"dec{i}")(y)
            y = _up2(y)
            if i + 2 <= len(skips):
                y = jnp.concatenate([y, skips[-(i + 2)]], axis=-1)

        # --- refinement head at velocity resolution
        for i, f in enumerate(self.extra_features):
            y = _Conv3DBlock(f, name=f"extra{i}")(y)

        # velocity head: tiny-variance init so the initial map ≈ identity
        velocity = nn.Conv(
            3,
            (3, 3, 3),
            padding=((1, 1),) * 3,
            kernel_init=nn.initializers.normal(1e-5),
            name="flow_head",
        )(y.astype(jnp.float32))

        # --- scaling-and-squaring integration at velocity resolution
        flow_small = exp_velocity3d(velocity, self.int_steps)
        if self.int_downsize == 2:
            flow = (
                resize_nd(flow_small, (d, h, w), "linear", align_corners=True)
                * 2.0
            )
        else:
            flow = flow_small

        warped = warp3d(moving, flow)
        return flow, warped, velocity
