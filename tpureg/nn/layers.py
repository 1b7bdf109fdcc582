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

Parameter-tree naming (consumed by compat/torch_import.py):
``<block>/conv/kernel`` + ``<block>/bn/{scale,bias}`` for conv blocks,
``<name>/kernel`` for bare convs created via ``torch_conv``/``predict_flow``,
``<name>/kernel`` for TorchConvTranspose, ``<deconv>/convt/kernel`` inside
Deconv.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = [
    "torch_conv",
    "predict_flow",
    "TorchConvTranspose",
    "ConvBlock",
    "IConvBlock",
    "Deconv",
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


def torch_conv(
    features: int,
    kernel_size: Union[int, Tuple[int, int]] = 3,
    stride: Union[int, Tuple[int, int]] = 1,
    padding: Optional[int] = None,
    dilation: Union[int, Tuple[int, int]] = 1,
    use_bias: bool = True,
    kernel_init: Callable = init_kaiming_leaky(0.1),
    bias_init: Callable = nn.initializers.zeros_init(),
    dtype=None,
    name: Optional[str] = None,
) -> nn.Conv:
    """nn.Conv configured with torch geometry: explicit pad=(k-1)//2·dilation."""
    k = _pair(kernel_size)
    d = _pair(dilation)
    if padding is None:
        p = ((k[0] - 1) // 2 * d[0], (k[1] - 1) // 2 * d[1])
    else:
        p = _pair(padding)
    return nn.Conv(
        features=features,
        kernel_size=k,
        strides=_pair(stride),
        padding=((p[0], p[0]), (p[1], p[1])),
        kernel_dilation=d,
        use_bias=use_bias,
        kernel_init=kernel_init,
        bias_init=bias_init,
        dtype=dtype,
        name=name,
    )


def predict_flow(
    use_bias: bool = False,
    kernel_init: Callable = init_kaiming_leaky(0.1),
    bias_init: Callable = nn.initializers.zeros_init(),
    dtype=None,
    name: Optional[str] = None,
) -> nn.Conv:
    """3×3 conv → 2 flow channels (bias per package convention)."""
    return torch_conv(2, 3, 1, use_bias=use_bias, kernel_init=kernel_init,
                      bias_init=bias_init, dtype=dtype, name=name)


class TorchConvTranspose(nn.Module):
    """torch ``ConvTranspose2d(k, s, p)`` as an input-dilated convolution.

    Output spatial size = (in-1)*s - 2p + k (for the reference's k=4, s=2,
    p=1 everywhere: exactly 2× upsampling). The parameter is stored in the
    equivalent-convolution layout (h, w, in, out); checkpoint import flips /
    transposes torch's (in, out, kh, kw) accordingly (compat/torch_import.py).

    Full-resolution instances lower to a *phase decomposition* instead of the
    input-dilated conv: a stride-1 3×3 conv producing the four output phases
    as channels, followed by depth-to-space. Same math (each output pixel
    sums the identical taps; the expanded kernel zero-pads the unused
    phase/tap slots), but XLA's autodiff of ``lhs_dilation`` convs emits
    full-tensor spatial ``reverse`` ops plus input-dilated gradient convs —
    measured 5.0 → 2.6 ms fwd+VJP for the FlowNet2 fusion ``deconv0``
    (162→16ch, 128²→256², b24 bf16) and ~1.2 ms of ``reverse`` eliminated
    per full-res deconv. At ≤128² outputs the dilated form is equal or
    faster (phase pays 2.25× FLOP padding), so the gate is output ≥ 256² —
    which in FlowNet2@256² only the fusion net's top deconvs reach, so the
    full-step effect is small (bf16 step 124.3 → 123.8 ms).
    """

    features: int
    kernel_size: int = 4
    stride: int = 2
    padding: int = 1
    use_bias: bool = False
    kernel_init: Callable = init_kaiming_leaky(0.1)
    bias_init: Callable = nn.initializers.zeros_init()
    dtype: Optional[jnp.dtype] = None
    packed_out: bool = False  # emit space-to-depth packed output (nn/packed.py)

    @nn.compact
    def __call__(self, x):
        k, s, p = self.kernel_size, self.stride, self.padding
        in_feat = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init, (k, k, in_feat, self.features), jnp.float32
        )
        dtype = self.dtype or x.dtype
        if self.packed_out:
            assert (k, s, p) == (4, 2, 1), "packed_out requires the phase form"
            y = self._phase_form(x.astype(dtype), kernel.astype(dtype),
                                 packed=True)
        elif (k, s, p) == (4, 2, 1) and 4 * x.shape[1] * x.shape[2] >= 256 * 256:
            y = self._phase_form(x.astype(dtype), kernel.astype(dtype))
        else:
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
            b = bias.astype(dtype)
            if self.packed_out:
                b = jnp.tile(b[:, None], (1, 4)).reshape(-1)
            y = y + b
        return y

    @staticmethod
    def _phase_form(x, kernel, packed: bool = False):
        """Phase decomposition of ConvTranspose(4, 2, 1).

        With the input-dilated form ``y[o] = Σ_k xd[o+k-2]·w[k]`` and
        ``o = 2Y + p``: the contributing taps have ``k = 2d + 2 - p`` for
        input offset ``d = i - Y ∈ {-1, 0, 1}`` — a 3×3 window over the
        input grid per output phase ``p ∈ {0,1}²``.

        ``packed=True`` skips the final depth-to-space and emits the
        C-major packed layout of nn/packed.py (channel ``c*4 + py*2+px``)
        at the input resolution — the packed fusion tail consumes it
        directly, so the upsampled tensor never materializes in fine NHWC.
        """
        b, h, wd, c = x.shape
        n = kernel.shape[-1]
        wp = jnp.zeros((3, 3, c, n, 2, 2), kernel.dtype)
        for dy in range(-1, 2):
            for py in range(2):
                ky = 2 * dy + 2 - py
                if not 0 <= ky < 4:
                    continue
                for dx in range(-1, 2):
                    for px in range(2):
                        kx = 2 * dx + 2 - px
                        if not 0 <= kx < 4:
                            continue
                        wp = wp.at[dy + 1, dx + 1, :, :, py, px].set(
                            kernel[ky, kx])
        y = jax.lax.conv_general_dilated(
            x, wp.reshape(3, 3, c, 4 * n), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if packed:
            return y  # [b, h, wd, 4n], C-major phases
        y = y.reshape(b, h, wd, n, 2, 2).transpose(0, 1, 4, 2, 5, 3)
        return y.reshape(b, 2 * h, 2 * wd, n)


def _batch_norm(train: bool, dtype) -> nn.BatchNorm:
    """torch-default BatchNorm over NHW (per-channel).

    ``dtype`` must be the *incoming activation's* dtype (callers pass
    ``self.dtype or x.dtype``), never ``None``: flax's ``dtype=None``
    promotion upcasts the normalize output to fp32 whenever the batch
    statistics are fp32 — which is always, since flax accumulates stats in
    fp32 — so under bf16 mixed precision every BN boundary would emit an
    fp32 tensor to HBM (verified in the compiled flagship step: fp32
    256²×64ch normalize outputs at 805 MB *physical* each, both directions).
    Pinning ``dtype`` to the incoming bf16 keeps stats accumulation fp32
    internally but casts mean/var for the normalize math, halving that
    traffic. For fp32 inputs the pin is the identity (reference parity).
    The running stats stay fp32 (their variables are initialized fp32 and
    the train step re-pins them).
    """
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=0.9,
        epsilon=1e-5,
        dtype=dtype,
        param_dtype=jnp.float32,
        name="bn",
    )


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
        y = torch_conv(
            self.features,
            self.kernel_size,
            self.stride,
            self.padding,
            self.dilation,
            use_bias=not self.use_bn,
            kernel_init=self.kernel_init,
            bias_init=self.bias_init,
            dtype=self.dtype,
            name="conv",
        )(x)
        if self.use_bn:
            y = _batch_norm(train, self.dtype or y.dtype)(y)
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
        y = torch_conv(
            self.features,
            self.kernel_size,
            self.stride,
            use_bias=True,
            kernel_init=self.kernel_init,
            bias_init=self.bias_init,
            dtype=self.dtype,
            name="conv",
        )(x)
        if self.use_bn:
            y = _batch_norm(train, self.dtype or y.dtype)(y)
        return y


class Deconv(nn.Module):
    """ConvTranspose(4, 2, 1) + LeakyReLU(0.1)."""

    features: int
    use_bias: bool = False
    kernel_init: Callable = init_kaiming_leaky(0.1)
    bias_init: Callable = nn.initializers.zeros_init()
    dtype: Optional[jnp.dtype] = None
    packed_out: bool = False

    @nn.compact
    def __call__(self, x):
        y = TorchConvTranspose(
            self.features,
            use_bias=self.use_bias,
            kernel_init=self.kernel_init,
            bias_init=self.bias_init,
            dtype=self.dtype,
            packed_out=self.packed_out,
            name="convt",
        )(x)
        return nn.leaky_relu(y, 0.1)
