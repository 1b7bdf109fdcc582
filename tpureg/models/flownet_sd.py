"""FlowNetSD — the 'small displacement' branch of the FlowNet2 cascade.

Reference: flownet2/networks/FlowNetSD.py:11-106. Differences from FlowNetS:
a stride-1 conv0 stem, doubled conv1/2 stages, and ``inter_conv`` (conv+BN,
no activation) feature compression before each flow prediction, so predict
convs see 512/256/128/64 channels instead of the raw concat widths.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..nn.layers import (
    ConvBlock,
    Deconv,
    IConvBlock,
    TorchConvTranspose,
    bias_uniform01,
    init_xavier_uniform,
    predict_flow,
)

__all__ = ["FlowNetSD"]


class FlowNetSD(nn.Module):
    use_bn: bool = True
    packed_input: bool = False  # x is nn/packed.py layout

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

            # conv0 stays packed (resident), conv1 consumes packed → fine
            c0 = PackedConvBlock(64, 1, use_bn=self.use_bn,
                                 kernel_init=k_init, bias_init=b_init,
                                 name="conv0")(x, train)
            c1 = PackedConvBlock(64, 2, use_bn=self.use_bn,
                                 kernel_init=k_init, bias_init=b_init,
                                 name="conv1")(c0, train)
        else:
            c0 = block(64, 3, 1, "conv0")(x, train)
            c1 = block(64, 3, 2, "conv1")(c0, train)
        c1 = block(128, 3, 1, "conv1_1")(c1, train)
        c2 = block(128, 3, 2, "conv2")(c1, train)
        c2 = block(128, 3, 1, "conv2_1")(c2, train)
        c3 = block(256, 3, 2, "conv3")(c2, train)
        c3 = block(256, 3, 1, "conv3_1")(c3, train)
        c4 = block(512, 3, 2, "conv4")(c3, train)
        c4 = block(512, 3, 1, "conv4_1")(c4, train)
        c5 = block(512, 3, 2, "conv5")(c4, train)
        c5 = block(512, 3, 1, "conv5_1")(c5, train)
        c6 = block(1024, 3, 2, "conv6")(c5, train)
        c6 = block(1024, 3, 1, "conv6_1")(c6, train)

        def up_flow(flow, name):
            # torch default bias=True here (FlowNetSD.py:46-49)
            return TorchConvTranspose(2, 4, 2, 1, use_bias=True,
                                      kernel_init=k_init, bias_init=b_init,
                                      name=name)(flow)

        def deconv(feat, y, name):
            return Deconv(feat, use_bias=True, kernel_init=k_init,
                          bias_init=b_init, name=name)(y)

        def inter(feat, y, name):
            return IConvBlock(feat, use_bn=self.use_bn, kernel_init=k_init,
                              bias_init=b_init, name=name)(y, train)

        def predict(y, name):
            return predict_flow(use_bias=True, kernel_init=k_init,
                                bias_init=b_init, name=name)(y)

        def crop_cat(skip, feat, fl):
            sh, sw = skip.shape[1], skip.shape[2]
            return jnp.concatenate(
                [skip, feat[:, :sh, :sw], fl[:, :sh, :sw]], axis=-1
            )

        flow6 = predict(c6, "predict_flow6")
        cat5 = crop_cat(c5, deconv(512, c6, "deconv5"),
                        up_flow(flow6, "upflow6to5"))
        flow5 = predict(inter(512, cat5, "inter_conv5"), "predict_flow5")

        cat4 = crop_cat(c4, deconv(256, cat5, "deconv4"),
                        up_flow(flow5, "upflow5to4"))
        flow4 = predict(inter(256, cat4, "inter_conv4"), "predict_flow4")

        cat3 = crop_cat(c3, deconv(128, cat4, "deconv3"),
                        up_flow(flow4, "upflow4to3"))
        flow3 = predict(inter(128, cat3, "inter_conv3"), "predict_flow3")

        cat2 = crop_cat(c2, deconv(64, cat3, "deconv2"),
                        up_flow(flow3, "upflow3to2"))
        flow2 = predict(inter(64, cat2, "inter_conv2"), "predict_flow2")

        if train:
            return (flow2, flow3, flow4, flow5, flow6)
        return (flow2,)
