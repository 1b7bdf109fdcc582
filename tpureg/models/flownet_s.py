"""FlowNetS — the 'simple' encoder/decoder flow estimator, TPU-native.

Covers three reference variants behind one Flax implementation:

- ``style='pinard'`` (default predictor of the registration head): the
  FlowNetS-package network (reference FlowNetS/FlowNetS.py:10-93): 2-ch input,
  zero-bias predict/deconv/upsample convs, kaiming(a=0.1) init, and a bilinear
  flow0 head — flow2 resized to the input resolution
  (FlowNetS/FlowNetS.py:82). Train returns (flow0, flow2..flow6); eval
  returns (flow0, flow2) (FlowNetS/FlowNetS.py:84-87).
- ``style='nvidia'`` (the S1/S2 blocks of the FlowNet2 cascade): 6-ch input,
  biased convs with xavier/U(0,1) init (flownet2/networks/FlowNetS.py:15-94),
  no flow0 head; train returns (flow2..flow6), eval (flow2,).
- ``FlowNetSFull``: the repo-local 7-level variant decoding to full
  resolution (reference models.py:58-153), unused by the drivers by default
  but part of the API surface.

Layout: NHWC in/out; each flow is [B, h, w, 2] (u_x, u_y), finest-first.
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..nn.layers import (
    ConvBlock,
    Deconv,
    TorchConvTranspose,
    bias_uniform01,
    init_kaiming_leaky,
    init_xavier_uniform,
    predict_flow,
)
from ..ops.resize import resize2d

__all__ = ["FlowNetS", "FlowNetSFull", "flownet_s_encoder", "refine_level"]


def _style_inits(style: str):
    """(kernel_init, bias_init, biased_heads) per package convention."""
    if style == "pinard":
        return init_kaiming_leaky(0.1), nn.initializers.zeros_init(), False
    if style == "nvidia":
        return init_xavier_uniform(), bias_uniform01, True
    raise ValueError(f"unknown FlowNetS style: {style}")


def flownet_s_encoder(x, train, use_bn, k_init, b_init,
                      packed_input: bool = False):
    """conv1..conv6_1 pyramid shared by FlowNetS variants. Returns levels 1-6.

    ``packed_input=True``: ``x`` is the space-to-depth packed layout
    (nn/packed.py) and conv1 consumes it directly via the k7 stride-2
    lowering — same parameters, same math, no fine-layout materialization
    of the padded full-res input (C ≤ 6 at 256² costs 4× its logical HBM
    traffic in NHWC). c1 and everything after are unaffected (fine NHWC).
    """

    def block(feat, k, s, name):
        return ConvBlock(
            feat, k, s, use_bn=use_bn, kernel_init=k_init, bias_init=b_init,
            name=name,
        )

    if packed_input:
        from ..nn.packed import PackedConvBlock

        c1 = PackedConvBlock(64, 2, 7, use_bn=use_bn, kernel_init=k_init,
                             bias_init=b_init, name="conv1")(x, train)
    else:
        c1 = block(64, 7, 2, "conv1")(x, train)
    c2 = block(128, 5, 2, "conv2")(c1, train)
    c3 = block(256, 5, 2, "conv3")(c2, train)
    c3 = block(256, 3, 1, "conv3_1")(c3, train)
    c4 = block(512, 3, 2, "conv4")(c3, train)
    c4 = block(512, 3, 1, "conv4_1")(c4, train)
    c5 = block(512, 3, 2, "conv5")(c4, train)
    c5 = block(512, 3, 1, "conv5_1")(c5, train)
    c6 = block(1024, 3, 2, "conv6")(c5, train)
    c6 = block(1024, 3, 1, "conv6_1")(c6, train)
    return c1, c2, c3, c4, c5, c6


def refine_level(
    level: int,
    concat_prev,
    skip,
    flow_prev,
    deconv_feat: int,
    k_init,
    b_init,
    biased: bool,
    upflow_bias: bool,
):
    """One decoder step: upsample flow + deconv features, concat with skip.

    Returns (concat, flow) where ``flow = predict_flow(concat)`` is the
    refined flow at this level. Mirrors the repeated block pattern of every
    FlowNet decoder (e.g. flownet2/networks/FlowNetS.py:69-89). Upsampled
    tensors are cropped to the skip's spatial size for non-2^k inputs —
    the reference's functional ``crop_like`` (FlowNetS/util.py:75-79).
    """
    flow_up = TorchConvTranspose(
        2, 4, 2, 1, use_bias=upflow_bias, kernel_init=k_init, bias_init=b_init,
        name=f"upflow{level+1}to{level}",
    )(flow_prev)
    feat_up = Deconv(
        deconv_feat, use_bias=biased, kernel_init=k_init, bias_init=b_init,
        name=f"deconv{level}",
    )(concat_prev)
    sh, sw = skip.shape[1], skip.shape[2]
    flow_up = flow_up[:, :sh, :sw]
    feat_up = feat_up[:, :sh, :sw]
    concat = jnp.concatenate([skip, feat_up, flow_up], axis=-1)
    flow = predict_flow(
        use_bias=biased, kernel_init=k_init, bias_init=b_init,
        name=f"predict_flow{level}",
    )(concat)
    return concat, flow


class FlowNetS(nn.Module):
    """FlowNetS pyramid flow estimator (see module docstring for variants)."""

    input_channels: int = 2
    use_bn: bool = True
    style: str = "pinard"
    packed_input: bool = False  # x is nn/packed.py layout (nvidia only)

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        k_init, b_init, biased = _style_inits(self.style)
        # Both variants use unbiased upsample-flow deconvs here
        # (FlowNetS/FlowNetS.py:39-42; flownet2/networks/FlowNetS.py:42-45).
        upflow_bias = False
        assert not (self.packed_input and self.style == "pinard"), \
            "pinard flow0 needs the fine input size"

        _, c2, c3, c4, c5, c6 = flownet_s_encoder(
            x, train, self.use_bn, k_init, b_init,
            packed_input=self.packed_input,
        )

        flow6 = predict_flow(
            use_bias=biased, kernel_init=k_init, bias_init=b_init,
            name="predict_flow6",
        )(c6)
        cat5, flow5 = refine_level(
            5, c6, c5, flow6, 512, k_init, b_init, biased, upflow_bias
        )
        cat4, flow4 = refine_level(
            4, cat5, c4, flow5, 256, k_init, b_init, biased, upflow_bias
        )
        cat3, flow3 = refine_level(
            3, cat4, c3, flow4, 128, k_init, b_init, biased, upflow_bias
        )
        _, flow2 = refine_level(
            2, cat3, c2, flow3, 64, k_init, b_init, biased, upflow_bias
        )

        if self.style == "pinard":
            h, w = x.shape[1], x.shape[2]
            flow0 = resize2d(flow2, (h, w), "bilinear", align_corners=False)
            if train:
                return (flow0, flow2, flow3, flow4, flow5, flow6)
            return (flow0, flow2)
        if train:
            return (flow2, flow3, flow4, flow5, flow6)
        return (flow2,)


class FlowNetSFull(nn.Module):
    """Repo-local FlowNetS decoding to full resolution (models.py:58-153).

    Extra levels: deconv1 (194→32), deconv0 (98→16), predict_flow1 (98),
    predict_flow0 on [x, deconv0, flow1_up] (20 ch). Returns 7 flows,
    finest (full-res) first.
    """

    input_channels: int = 2
    use_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        k_init = init_kaiming_leaky(0.1)
        b_init = nn.initializers.zeros_init()
        biased = False

        c1, c2, c3, c4, c5, c6 = flownet_s_encoder(
            x, train, self.use_bn, k_init, b_init
        )

        flow6 = predict_flow(use_bias=biased, kernel_init=k_init,
                             name="predict_flow6")(c6)
        cat5, flow5 = refine_level(5, c6, c5, flow6, 512, k_init, b_init,
                                   biased, False)
        cat4, flow4 = refine_level(4, cat5, c4, flow5, 256, k_init, b_init,
                                   biased, False)
        cat3, flow3 = refine_level(3, cat4, c3, flow4, 128, k_init, b_init,
                                   biased, False)
        cat2, flow2 = refine_level(2, cat3, c2, flow3, 64, k_init, b_init,
                                   biased, False)
        cat1, flow1 = refine_level(1, cat2, c1, flow2, 32, k_init, b_init,
                                   biased, False)
        _, flow0 = refine_level(0, cat1, x, flow1, 16, k_init, b_init,
                                biased, False)
        return (flow0, flow1, flow2, flow3, flow4, flow5, flow6)
