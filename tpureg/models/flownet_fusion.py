"""FlowNetFusion — shallow fusion net producing the final full-res flow.

Reference: flownet2/networks/FlowNetFusion.py:11-66. Input: the 9-channel
stack [img0, sd_flow(2), s2_flow(2), sd_norm, s2_norm, sd_err, s2_err]
assembled by the cascade (flownet2/models.py:185). Three-level encoder,
two inter_conv-compressed decoder steps, single full-res flow out.
"""

from __future__ import annotations

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

__all__ = ["FlowNetFusion"]


class FlowNetFusion(nn.Module):
    use_bn: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False) -> jnp.ndarray:
        k_init, b_init = init_xavier_uniform(), bias_uniform01

        def block(feat, k, s, name):
            return ConvBlock(
                feat, k, s, use_bn=self.use_bn, kernel_init=k_init,
                bias_init=b_init, name=name,
            )

        c0 = block(64, 3, 1, "conv0")(x, train)
        c1 = block(64, 3, 2, "conv1")(c0, train)
        c1 = block(128, 3, 1, "conv1_1")(c1, train)
        c2 = block(128, 3, 2, "conv2")(c1, train)
        c2 = block(128, 3, 1, "conv2_1")(c2, train)

        flow2 = predict_flow(use_bias=True, kernel_init=k_init, bias_init=b_init,
                            name="predict_flow2")(c2)
        flow2_up = TorchConvTranspose(2, 4, 2, 1, use_bias=True,
                                      kernel_init=k_init, bias_init=b_init,
                                      name="upflow2to1")(flow2)
        d1 = Deconv(32, use_bias=True, kernel_init=k_init, bias_init=b_init,
                    name="deconv1")(c2)
        sh, sw = c1.shape[1], c1.shape[2]
        cat1 = jnp.concatenate(
            [c1, d1[:, :sh, :sw], flow2_up[:, :sh, :sw]], axis=-1
        )  # 162 ch
        i1 = IConvBlock(32, use_bn=self.use_bn, kernel_init=k_init,
                        bias_init=b_init, name="inter_conv1")(cat1, train)
        flow1 = predict_flow(use_bias=True, kernel_init=k_init, bias_init=b_init,
                            name="predict_flow1")(i1)
        flow1_up = TorchConvTranspose(2, 4, 2, 1, use_bias=True,
                                      kernel_init=k_init, bias_init=b_init,
                                      name="upflow1to0")(flow1)
        d0 = Deconv(16, use_bias=True, kernel_init=k_init, bias_init=b_init,
                    name="deconv0")(cat1)
        sh, sw = c0.shape[1], c0.shape[2]
        cat0 = jnp.concatenate(
            [c0, d0[:, :sh, :sw], flow1_up[:, :sh, :sw]], axis=-1
        )  # 82 ch
        i0 = IConvBlock(16, use_bn=self.use_bn, kernel_init=k_init,
                        bias_init=b_init, name="inter_conv0")(cat0, train)
        return predict_flow(use_bias=True, kernel_init=k_init, bias_init=b_init,
                           name="predict_flow0")(i0)
