"""Flax building blocks with PyTorch-compatible geometry and initialization.

The reference's three model packages use three distinct conv-stack recipes
(SURVEY.md §7 "numerical parity" hard part):

- FlowNetS package (Pinard lineage): conv(k, s, pad=(k-1)//2) + optional BN +
  LeakyReLU(0.1); kaiming_normal(a=0.1) init, zero bias
  (FlowNetS/util.py:17-55, FlowNetS/FlowNetS.py:44-51).
- flownet2 package (NVIDIA): same geometry; xavier_uniform weights and
  U(0,1) bias (flownet2/networks/submodules.py:7-38, FlowNetC.py:58-67);
  ``i_conv`` = conv + BN with **no** activation.
- PWC package: no BN, LeakyReLU(0.1), kaiming_normal(fan_in) init, zero bias
  (PWC/models/PWCNet.py:24-34,136-140).

Deconvolution follows torch ``ConvTranspose2d(k=4, s=2, p=1)`` exactly: it is
implemented as ``conv_general_dilated`` with input dilation 2, padding
``k-1-p=2`` and a spatially-flipped kernel — the algebraic identity of the
transposed convolution, in plain NHWC/HWIO layout so XLA maps it straight to
the MXU.

BatchNorm: torch defaults (eps=1e-5, momentum 0.1) → flax momentum 0.9.
All modules are NHWC and take a ``train`` flag threaded to BN.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = [
    "TorchConv",
    "TorchConvTranspose",
    "ConvBlock",
    "IConvBlock",
    "Deconv",
    "PredictFlow",
    "init_kaiming_leaky",
    "init_xavier_uniform",
    "bias_uniform01",
]


def init_kaiming_leaky(negative_slope: float = 0.1):
    """torch ``kaiming_normal_(w, a)``: std = sqrt(2/(1+a²)) / sqrt(fan_in)."""
    gain_sq = 2.0 / (1.0 + negative_slope**2)
    return nn.initializers.variance_scaling(gain_sq, "fan_in", "normal")


def init_xavier_uniform():
    return nn.initializers.xavier_uniform()


def bias_uniform01(key, shape, dtype=jnp.float32):
    """torch ``init.uniform_(bias)`` default U(0, 1) — flownet2 quirk."""
    return jax.random.uniform(key, shape, dtype)


def _pair(v: Union[int, Tuple[int, int]]) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)


class TorchConv(nn.Module):
    """2-D conv with torch geometry: pad=(k-1)//2 (or explicit), NHWC/HWIO."""

    features: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    stride: Union[int, Tuple[int, int]] = 1
    padding: Optional[int] = None  # default (k-1)//2
    dilation: Union[int, Tuple[int, int]] = 1
    use_bias: bool = True
    kernel_init: Callable = init_kaiming_leaky(0.1)
    bias_init: Callable = nn.initializers.zeros_init()
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        k = _pair(self.kernel_size)
        d = _pair(self.dilation)
        if self.padding is None:
            p = ((k[0] - 1) // 2 * d[0], (k[1] - 1) // 2 * d[1])
        else:
            p = _pair(self.padding)
        return nn.Conv(
            features=self.features,
            kernel_size=k,
            strides=_pair(self.stride),
            padding=(p, p) if isinstance(p[0], int) else p,
            kernel_dilation=d,
            use_bias=self.use_bias,
            kernel_init=self.kernel_init,
            bias_init=self.bias_init,
            dtype=self.dtype,
            name="conv",
        )(x)


class TorchConvTranspose(nn.Module):
    """torch ``ConvTranspose2d(k, s, p)`` as an input-dilated convolution.

    Output spatial size = (in-1)*s - 2p + k (for the reference's k=4, s=2,
    p=1 everywhere: exactly 2× upsampling). The parameter is stored in the
    equivalent-convolution layout (h, w, in, out); checkpoint import flips /
    transposes torch's (in, out, kh, kw) accordingly (compat/torch_import.py).
    """

    features: int
    kernel_size: int = 4
    stride: int = 2
    padding: int = 1
    use_bias: bool = False
    kernel_init: Callable = init_kaiming_leaky(0.1)
    bias_init: Callable = nn.initializers.zeros_init()
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        k, s, p = self.kernel_size, self.stride, self.padding
        in_feat = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init, (k, k, in_feat, self.features), jnp.float32
        )
        dtype = self.dtype or x.dtype
        pad = k - 1 - p
        y = jax.lax.conv_general_dilated(
            x.astype(dtype),
            kernel.astype(dtype),
            window_strides=(1, 1),
            padding=((pad, pad), (pad, pad)),
            lhs_dilation=(s, s),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,), jnp.float32)
            y = y + bias.astype(dtype)
        return y


class _BN(nn.Module):
    """torch-default BatchNorm over NHW (per-channel)."""

    @nn.compact
    def __call__(self, x, train: bool):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=jnp.float32,
            name="bn",
        )(x)


class ConvBlock(nn.Module):
    """conv [+ BN] + LeakyReLU(0.1) — the universal encoder block."""

    features: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    stride: Union[int, Tuple[int, int]] = 1
    padding: Optional[int] = None
    dilation: int = 1
    use_bn: bool = True
    kernel_init: Callable = init_kaiming_leaky(0.1)
    bias_init: Callable = nn.initializers.zeros_init()
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = TorchConv(
            self.features,
            self.kernel_size,
            self.stride,
            self.padding,
            self.dilation,
            use_bias=not self.use_bn,
            kernel_init=self.kernel_init,
            bias_init=self.bias_init,
            dtype=self.dtype,
        )(x)
        if self.use_bn:
            y = _BN()(y, train)
        return nn.leaky_relu(y, 0.1)


class IConvBlock(nn.Module):
    """conv [+ BN], **no activation** (flownet2 ``i_conv``, submodules.py:20-29).

    Note the reference keeps conv bias=True even in the BN variant here.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    use_bn: bool = True
    kernel_init: Callable = init_xavier_uniform()
    bias_init: Callable = bias_uniform01
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = TorchConv(
            self.features,
            self.kernel_size,
            self.stride,
            use_bias=True,
            kernel_init=self.kernel_init,
            bias_init=self.bias_init,
            dtype=self.dtype,
        )(x)
        if self.use_bn:
            y = _BN()(y, train)
        return y


class Deconv(nn.Module):
    """ConvTranspose(4, 2, 1) + LeakyReLU(0.1)."""

    features: int
    use_bias: bool = False
    kernel_init: Callable = init_kaiming_leaky(0.1)
    bias_init: Callable = nn.initializers.zeros_init()
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        y = TorchConvTranspose(
            self.features,
            use_bias=self.use_bias,
            kernel_init=self.kernel_init,
            bias_init=self.bias_init,
            dtype=self.dtype,
        )(x)
        return nn.leaky_relu(y, 0.1)


class PredictFlow(nn.Module):
    """3×3 conv → 2 flow channels (bias per package convention)."""

    use_bias: bool = False
    kernel_init: Callable = init_kaiming_leaky(0.1)
    bias_init: Callable = nn.initializers.zeros_init()
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        return TorchConv(
            2,
            3,
            1,
            use_bias=self.use_bias,
            kernel_init=self.kernel_init,
            bias_init=self.bias_init,
            dtype=self.dtype,
        )(x)
