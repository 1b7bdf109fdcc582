"""FlowNet2 — the full C→S1→S2 ∥ SD → Fusion cascade as one XLA program.

Reference: flownet2/models.py:31-191 (grayscale-adapted variant: input is
[B, H, W, 2] fixed/moving channels, split at :129-132). Pipeline:

1. FlowNetC on the pair → flow2 (¼ res) → ×div_flow(20), ×4 bilinear
   upsample (:135-136)
2. warp moving by that flow (Resample2d → ops.warp2d 'pixel'), brightness
   error magnitude via channelnorm (:139-141); concat 6-ch input → FlowNetS1
3. same refine step again → FlowNetS2 (:151-159); its full-res flow is
   upsampled with **nearest** (upsample4, :72,160) — reference quirk kept
4. FlowNetSD on the raw pair, flow2 **/ div_flow**, nearest ×4 (:172-173)
5. 9-channel fusion stack (:185) → FlowNetFusion → final full-res flow
6. returns the fusion flow twice (:191) so the multi-scale loss sees n=2
   identical scales — behavior preserved (SURVEY.md §7 quirks).

The whole cascade jits into a single XLA computation; each subnet is its own
Flax module so pretrained-checkpoint import maps cleanly (compat/).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops.channelnorm import channelnorm
from ..ops.resize import resize2d
from ..ops.warp import warp2d
from .flownet_c import FlowNetC
from .flownet_fusion import FlowNetFusion
from .flownet_s import FlowNetS
from .flownet_sd import FlowNetSD

__all__ = ["FlowNet2", "FlowNet2C", "FlowNet2S", "FlowNet2SD", "FlowNet2CS",
           "FlowNet2CSS"]


class FlowNet2(nn.Module):
    use_bn: bool = True
    div_flow: float = 20.0
    # None = auto: plane/packed glue at ≥256² even dims (see _call_packed)
    packed: "bool | None" = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        b, h, w, _ = x.shape
        packed = self.packed
        if packed is None:
            packed = h * w >= 256 * 256 and h % 2 == 0 and w % 2 == 0
        if packed:
            return self._call_packed(x, train)
        x1 = x[..., 0:1]
        x2 = x[..., 1:2]

        def up4(flow, method):
            return resize2d(flow, (flow.shape[1] * 4, flow.shape[2] * 4),
                            method, align_corners=False)

        # --- block 1: FlowNetC
        flow_c2 = FlowNetC(use_bn=self.use_bn, name="flownetc")(x, train)[0]
        flow_c = up4(flow_c2 * self.div_flow, "bilinear")

        warped1 = warp2d(x2, flow_c, convention="pixel")
        err1 = channelnorm(x1 - warped1)
        concat1 = jnp.concatenate(
            [x, warped1, flow_c / self.div_flow, err1], axis=-1
        )

        # --- block 2: FlowNetS1
        flow_s1_2 = FlowNetS(input_channels=6, use_bn=self.use_bn,
                             style="nvidia", name="flownets_1")(concat1, train)[0]
        flow_s1 = up4(flow_s1_2 * self.div_flow, "bilinear")

        warped2 = warp2d(x2, flow_s1, convention="pixel")
        err2 = channelnorm(x1 - warped2)
        concat2 = jnp.concatenate(
            [x, warped2, flow_s1 / self.div_flow, err2], axis=-1
        )

        # --- block 3: FlowNetS2 (nearest ×4, reference quirk :160)
        flow_s2_2 = FlowNetS(input_channels=6, use_bn=self.use_bn,
                             style="nvidia", name="flownets_2")(concat2, train)[0]
        flow_s2 = up4(flow_s2_2 * self.div_flow, "nearest")
        norm_s2 = channelnorm(flow_s2)
        warped_s2 = warp2d(x2, flow_s2, convention="pixel")
        err_s2 = channelnorm(x1 - warped_s2)

        # --- block 4: FlowNetSD branch (flow divided, not multiplied — :173)
        flow_sd_2 = FlowNetSD(use_bn=self.use_bn, name="flownets_d")(x, train)[0]
        flow_sd = up4(flow_sd_2 / self.div_flow, "nearest")
        norm_sd = channelnorm(flow_sd)
        warped_sd = warp2d(x2, flow_sd, convention="pixel")
        err_sd = channelnorm(x1 - warped_sd)

        # --- block 5: fusion (9-channel stack, :185)
        concat3 = jnp.concatenate(
            [x1, flow_sd, flow_s2, norm_sd, norm_s2, err_sd, err_s2], axis=-1
        )
        flow_fused = FlowNetFusion(use_bn=self.use_bn,
                                   name="flownetfusion")(concat3, train)

        return (flow_fused, flow_fused)

    def _call_packed(self, x, train):
        """Identical cascade, full-res glue on dense rank-3 planes.

        At 256² every inter-subnet tensor is 1–6 channels; in NHWC each
        pays lane padding to 128 on every HBM pass (402 MB physical for a
        3 MB plane — ops/planes.py rationale). Here the glue (upsample ×
        div_flow, Resample2d warps, channelnorms) runs on ``[B, H, W]``
        planes at dense bandwidth, subnets consume space-to-depth packed
        stem inputs (nn/packed.py lowerings — same parameters, same math),
        and the fusion tail stays packed end-to-end. Same graph as the
        NHWC path (equivalence-tested, tests/test_packed.py); parameter
        trees are identical, so checkpoints are path-independent.
        """
        from ..ops.planes import (
            channelnorm_planes,
            pack_planes,
            resize_plane,
            warp_plane,
        )

        b, h, w, _ = x.shape
        x1 = x[..., 0]  # planes [B, H, W]
        x2 = x[..., 1]
        xp = pack_planes([x1, x2])

        def up4_planes(flow2, scale, method):
            """¼-res NHWC flow → full-res (fx, fy) planes, ×scale first."""
            f = flow2 * scale
            return (resize_plane(f[..., 0], (h, w), method),
                    resize_plane(f[..., 1], (h, w), method))

        # --- block 1: FlowNetC
        flow_c2 = FlowNetC(use_bn=self.use_bn, packed_input=True,
                           name="flownetc")(xp, train)[0]
        fcx, fcy = up4_planes(flow_c2, self.div_flow, "bilinear")

        warped1 = warp_plane(x2, fcx, fcy)
        err1 = channelnorm_planes([x1 - warped1])
        concat1 = pack_planes([x1, x2, warped1, fcx / self.div_flow,
                               fcy / self.div_flow, err1])

        # --- block 2: FlowNetS1
        flow_s1_2 = FlowNetS(input_channels=6, use_bn=self.use_bn,
                             style="nvidia", packed_input=True,
                             name="flownets_1")(concat1, train)[0]
        fs1x, fs1y = up4_planes(flow_s1_2, self.div_flow, "bilinear")

        warped2 = warp_plane(x2, fs1x, fs1y)
        err2 = channelnorm_planes([x1 - warped2])
        concat2 = pack_planes([x1, x2, warped2, fs1x / self.div_flow,
                               fs1y / self.div_flow, err2])

        # --- block 3: FlowNetS2 (nearest ×4, reference quirk :160)
        flow_s2_2 = FlowNetS(input_channels=6, use_bn=self.use_bn,
                             style="nvidia", packed_input=True,
                             name="flownets_2")(concat2, train)[0]
        fs2x, fs2y = up4_planes(flow_s2_2, self.div_flow, "nearest")
        norm_s2 = channelnorm_planes([fs2x, fs2y])
        warped_s2 = warp_plane(x2, fs2x, fs2y)
        err_s2 = channelnorm_planes([x1 - warped_s2])

        # --- block 4: FlowNetSD branch (flow divided, not multiplied — :173)
        flow_sd_2 = FlowNetSD(use_bn=self.use_bn, packed_input=True,
                              name="flownets_d")(xp, train)[0]
        fsdx, fsdy = up4_planes(flow_sd_2, 1.0 / self.div_flow, "nearest")
        norm_sd = channelnorm_planes([fsdx, fsdy])
        warped_sd = warp_plane(x2, fsdx, fsdy)
        err_sd = channelnorm_planes([x1 - warped_sd])

        # --- block 5: fusion (9-channel stack, :185) — stays packed
        concat3 = pack_planes([x1, fsdx, fsdy, fs2x, fs2y, norm_sd, norm_s2,
                               err_sd, err_s2])
        flow_fused = FlowNetFusion(use_bn=self.use_bn, packed_in=True,
                                   name="flownetfusion")(concat3, train)

        return (flow_fused, flow_fused)


class FlowNet2C(nn.Module):
    """Standalone FlowNetC with the FlowNet2 eval head (flownet2/models.py:193-259)."""

    use_bn: bool = True
    div_flow: float = 20.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        flows = FlowNetC(use_bn=self.use_bn, name="flownetc")(x, train)
        if train:
            return flows
        f2 = flows[0]
        return (resize2d(f2 * self.div_flow,
                         (f2.shape[1] * 4, f2.shape[2] * 4), "bilinear"),)


class FlowNet2S(nn.Module):
    """Standalone FlowNetS block with upsampled eval flow (flownet2/models.py:261-305)."""

    use_bn: bool = True
    div_flow: float = 20.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        flows = FlowNetS(input_channels=2, use_bn=self.use_bn, style="nvidia",
                         name="flownets")(x, train)
        if train:
            return flows
        f2 = flows[0]
        return (resize2d(f2 * self.div_flow,
                         (f2.shape[1] * 4, f2.shape[2] * 4), "bilinear"),)


class FlowNet2SD(nn.Module):
    """Standalone FlowNetSD with upsampled eval flow (flownet2/models.py:307-357)."""

    use_bn: bool = True
    div_flow: float = 20.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        flows = FlowNetSD(use_bn=self.use_bn, name="flownets_d")(x, train)
        if train:
            return flows
        f2 = flows[0]
        return (resize2d(f2 * self.div_flow,
                         (f2.shape[1] * 4, f2.shape[2] * 4), "bilinear"),)


class _CascadePrefix(nn.Module):
    """Shared C→S... prefix used by the CS and CSS variants."""

    use_bn: bool
    div_flow: float
    n_s_blocks: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x1, x2 = x[..., 0:1], x[..., 1:2]

        def up4(flow):
            return resize2d(flow, (flow.shape[1] * 4, flow.shape[2] * 4),
                            "bilinear", align_corners=False)

        flow = up4(FlowNetC(use_bn=self.use_bn, name="flownetc")(x, train)[0]
                   * self.div_flow)
        names = ["flownets_1", "flownets_2"]
        last_flows = None
        for i in range(self.n_s_blocks):
            warped = warp2d(x2, flow, convention="pixel")
            err = channelnorm(x1 - warped)
            concat = jnp.concatenate(
                [x, warped, flow / self.div_flow, err], axis=-1
            )
            last_flows = FlowNetS(input_channels=6, use_bn=self.use_bn,
                                  style="nvidia", name=names[i])(concat, train)
            flow = up4(last_flows[0] * self.div_flow)
        return flow, last_flows


class FlowNet2CS(nn.Module):
    """C→S cascade (flownet2/models.py:359-422)."""

    use_bn: bool = True
    div_flow: float = 20.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        flow, flows = _CascadePrefix(self.use_bn, self.div_flow, 1,
                                     name="cascade")(x, train)
        return flows if train else (flow,)


class FlowNet2CSS(nn.Module):
    """C→S→S cascade (flownet2/models.py:424-511)."""

    use_bn: bool = True
    div_flow: float = 20.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        flow, flows = _CascadePrefix(self.use_bn, self.div_flow, 2,
                                     name="cascade")(x, train)
        return flows if train else (flow,)
