"""FlowNetFusion — shallow fusion net producing the final full-res flow.

Reference: flownet2/networks/FlowNetFusion.py:11-66. Input: the 9-channel
stack [img0, sd_flow(2), s2_flow(2), sd_norm, s2_norm, sd_err, s2_err]
assembled by the cascade (flownet2/models.py:185). Three-level encoder,
two inter_conv-compressed decoder steps, single full-res flow out.

TPU layout: at full resolution every tensor here is skinny (C ∈ {2, 11, 16,
64, 82}) and pays the NHWC lane-padding tax on each HBM pass — this subnet
alone was 40.6 ms of the 123.8 ms FlowNet2 train step (tools/trace_ops.py).
When the input is large (≥256², even dims) the full-res stage runs in the
space-to-depth packed layout of nn/packed.py: pack once, conv0 resident,
conv1 consumes packed directly via the stride-2 lowering, and the decoder
tail (deconv0 / upflow1to0 phase-outputs, inter_conv0, predict_flow0) stays
packed until a single cheap unpack of the 2-channel flow. Identical math
(packed kernels are zero-filled rearrangements of the same parameters);
parameter/variable trees match the unpacked path exactly, so checkpoints,
torch import, and FSDP sharding rules are layout-independent.
"""

from __future__ import annotations

from typing import Optional

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
from ..nn.packed import (
    PackedConvBlock,
    PackedIConvBlock,
    _PackedConv,
    pack2,
    unpack2,
)

__all__ = ["FlowNetFusion"]


class FlowNetFusion(nn.Module):
    use_bn: bool = True
    # None = auto (packed iff input ≥ 256² with even dims); tests force it
    packed: Optional[bool] = None
    # x is already the packed layout (cascade hands over pack_planes output)
    packed_in: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False) -> jnp.ndarray:
        k_init, b_init = init_xavier_uniform(), bias_uniform01
        if self.packed_in:
            h, w = 2 * x.shape[1], 2 * x.shape[2]
            packed = True
        else:
            h, w = x.shape[1], x.shape[2]
            packed = self.packed
            if packed is None:
                packed = h * w >= 256 * 256 and h % 2 == 0 and w % 2 == 0

        def block(feat, k, s, name):
            return ConvBlock(
                feat, k, s, use_bn=self.use_bn, kernel_init=k_init,
                bias_init=b_init, name=name,
            )

        if packed:
            xp = x if self.packed_in else pack2(x)
            c0p = PackedConvBlock(64, 1, use_bn=self.use_bn,
                                  kernel_init=k_init, bias_init=b_init,
                                  name="conv0")(xp, train)
            c1 = PackedConvBlock(64, 2, use_bn=self.use_bn,
                                 kernel_init=k_init, bias_init=b_init,
                                 name="conv1")(c0p, train)
        else:
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

        if packed:
            # The upsampled tensors never materialize in fine NHWC: the
            # phase deconvs emit the packed layout directly (zero extra
            # cost), the concat commutes with packing (C-major order), and
            # only the final 2-channel flow unpacks.
            flow1_up_p = TorchConvTranspose(
                2, 4, 2, 1, use_bias=True, kernel_init=k_init,
                bias_init=b_init, packed_out=True, name="upflow1to0")(flow1)
            d0p = Deconv(16, use_bias=True, kernel_init=k_init,
                         bias_init=b_init, packed_out=True,
                         name="deconv0")(cat1)
            cat0p = jnp.concatenate([c0p, d0p, flow1_up_p], axis=-1)  # 4·82
            i0p = PackedIConvBlock(16, use_bn=self.use_bn, kernel_init=k_init,
                                   bias_init=b_init,
                                   name="inter_conv0")(cat0p, train)
            flow0p = _PackedConv(2, 1, use_bias=True, kernel_init=k_init,
                                 bias_init=b_init,
                                 name="predict_flow0")(i0p)
            return unpack2(flow0p)

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
