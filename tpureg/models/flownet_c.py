"""FlowNetC — siamese encoder + correlation cost volume flow estimator.

Reference: flownet2/networks/FlowNetC.py:13-130 (grayscale-adapted: 1-channel
stems, input [B, H, W, 2] fixed/moving stacked in channels, split at :71-75).
Correlation config ``max_disp=20, stride2=2`` → 441 channels (:28-31), then
LeakyReLU(0.1), a 1×1 conv_redir (256→32), concat → conv3_1(473→256) and the
standard FlowNetS decoder. Upsample-flow deconvs are biased here (:53-56),
unlike the FlowNetS blocks — reproduced.

TPU-native: the correlation is the fused Pallas kernel (ops/correlation).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..nn.layers import (
    ConvBlock,
    bias_uniform01,
    init_kaiming_leaky,
    init_xavier_uniform,
    predict_flow,
)
from ..ops.correlation import correlation
from .flownet_s import refine_level

__all__ = ["FlowNetC", "FlowNetCPinard"]


class FlowNetC(nn.Module):
    use_bn: bool = True
    max_displacement: int = 20
    corr_stride: int = 2
    packed_input: bool = False  # x is nn/packed.py layout (2ch → 8 packed)

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        k_init, b_init = init_xavier_uniform(), bias_uniform01

        def block(feat, k, s, name):
            return ConvBlock(
                feat, k, s, use_bn=self.use_bn, kernel_init=k_init,
                bias_init=b_init, name=name,
            )

        if self.packed_input:
            from ..nn.packed import PackedConvBlock

            # C-major packed channels: 0-3 = x1 phases, 4-7 = x2 phases
            x1 = x[..., 0:4]
            x2 = x[..., 4:8]
            conv1 = PackedConvBlock(64, 2, 7, use_bn=self.use_bn,
                                    kernel_init=k_init, bias_init=b_init,
                                    name="conv1")
        else:
            x1 = x[..., 0:1]
            x2 = x[..., 1:2]
            conv1 = block(64, 7, 2, "conv1")
        conv2 = block(128, 5, 2, "conv2")
        conv3 = block(256, 5, 2, "conv3")

        c1a = conv1(x1, train)
        c2a = conv2(c1a, train)
        c3a = conv3(c2a, train)
        c3b = conv3(conv2(conv1(x2, train), train), train)

        corr = correlation(c3a, c3b, self.max_displacement, self.corr_stride)
        corr = nn.leaky_relu(corr, 0.1)
        redir = block(32, 1, 1, "conv_redir")(c3a, train)
        merged = jnp.concatenate([redir, corr], axis=-1)

        c3 = block(256, 3, 1, "conv3_1")(merged, train)
        c4 = block(512, 3, 2, "conv4")(c3, train)
        c4 = block(512, 3, 1, "conv4_1")(c4, train)
        c5 = block(512, 3, 2, "conv5")(c4, train)
        c5 = block(512, 3, 1, "conv5_1")(c5, train)
        c6 = block(1024, 3, 2, "conv6")(c5, train)
        c6 = block(1024, 3, 1, "conv6_1")(c6, train)

        flow6 = predict_flow(use_bias=True, kernel_init=k_init, bias_init=b_init,
                             name="predict_flow6")(c6)
        # biased upsample-flow deconvs (flownet2/networks/FlowNetC.py:53-56)
        cat5, flow5 = refine_level(5, c6, c5, flow6, 512, k_init, b_init,
                                   True, True)
        cat4, flow4 = refine_level(4, cat5, c4, flow5, 256, k_init, b_init,
                                   True, True)
        cat3, flow3 = refine_level(3, cat4, c3, flow4, 128, k_init, b_init,
                                   True, True)
        _, flow2 = refine_level(2, cat3, c2a, flow3, 64, k_init, b_init,
                                True, True)

        if train:
            return (flow2, flow3, flow4, flow5, flow6)
        return (flow2,)


class FlowNetCPinard(nn.Module):
    """FlowNetC, Clément-Pinard lineage (reference FlowNetS/FlowNetC.py:9-107).

    The FlowNetS-package sibling of the flownet2-flavor net above — an unused
    path in the reference drivers but §2.1 API surface. Differences from the
    flownet2 flavor, all reproduced:

    - RGB siamese stems: 2×3-channel input split ``x[:, :3] / x[:, 3:]``
      (FlowNetC.py:55-56) instead of 2×1-channel.
    - kaiming_normal(a=0.1) weights, zero biases everywhere
      (FlowNetC.py:45-49); predict/deconv/upsample convs unbiased
      (util.py:45-55), conv biased only without BN (util.py:17-42).
    - correlation via ``correlate`` (util.py:58-72):
      spatial_correlation_sample(kernel=1, patch=21, dilation_patch=2) — the
      same math as ``Correlation(md=20, stride2=2)`` (441 channels, /C
      normalization, row-major (dy, dx) order) — followed by in-place
      LeakyReLU(0.1).
    - train returns (flow2..flow6); eval returns the bare flow2
      (FlowNetC.py:98-101) — exposed here as a 1-tuple for registry
      uniformity (the tensor itself is the parity surface).
    """

    use_bn: bool = True
    max_displacement: int = 20
    corr_stride: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        k_init = init_kaiming_leaky(0.1)
        b_init = nn.initializers.zeros_init()

        def block(feat, k, s, name):
            return ConvBlock(
                feat, k, s, use_bn=self.use_bn, kernel_init=k_init,
                bias_init=b_init, name=name,
            )

        x1 = x[..., 0:3]
        x2 = x[..., 3:6]
        conv1 = block(64, 7, 2, "conv1")
        conv2 = block(128, 5, 2, "conv2")
        conv3 = block(256, 5, 2, "conv3")

        c1a = conv1(x1, train)
        c2a = conv2(c1a, train)
        c3a = conv3(c2a, train)
        c3b = conv3(conv2(conv1(x2, train), train), train)

        corr = correlation(c3a, c3b, self.max_displacement, self.corr_stride)
        corr = nn.leaky_relu(corr, 0.1)
        redir = block(32, 1, 1, "conv_redir")(c3a, train)
        merged = jnp.concatenate([redir, corr], axis=-1)

        c3 = block(256, 3, 1, "conv3_1")(merged, train)
        c4 = block(512, 3, 2, "conv4")(c3, train)
        c4 = block(512, 3, 1, "conv4_1")(c4, train)
        c5 = block(512, 3, 2, "conv5")(c4, train)
        c5 = block(512, 3, 1, "conv5_1")(c5, train)
        c6 = block(1024, 3, 2, "conv6")(c5, train)
        c6 = block(1024, 3, 1, "conv6_1")(c6, train)

        flow6 = predict_flow(use_bias=False, kernel_init=k_init,
                             bias_init=b_init, name="predict_flow6")(c6)
        cat5, flow5 = refine_level(5, c6, c5, flow6, 512, k_init, b_init,
                                   False, False)
        cat4, flow4 = refine_level(4, cat5, c4, flow5, 256, k_init, b_init,
                                   False, False)
        cat3, flow3 = refine_level(3, cat4, c3, flow4, 128, k_init, b_init,
                                   False, False)
        _, flow2 = refine_level(2, cat3, c2a, flow3, 64, k_init, b_init,
                                False, False)

        if train:
            return (flow2, flow3, flow4, flow5, flow6)
        return (flow2,)
