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

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        b, h, w, _ = x.shape
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
