"""Space-to-depth packed layout for full-resolution skinny-channel convs.

Why: on TPU, NHWC activations put C in the lane dimension, and every tensor
with C < 128 is padded to 128 lanes — so a 16-channel 256² activation pays
8× its logical HBM traffic on every read and write. The FlowNet2 fusion net
(flownet2/networks/FlowNetFusion.py:11-66) runs its whole decoder tail at
256² with C ∈ {2, 11, 16, 64, 82}; measured on a real v5e chip it was
40.6 ms of the 123.8 ms train step at ~12% of the chip's elementwise
bandwidth (tools/trace_ops.py), entirely lane-padding waste.

The fix is the classic TPU packing: keep the full-res stage in a
space-to-depth(2) layout ``[B, H/2, W/2, 4C]`` so channels fill lanes, and
lower each 3×3 conv to an equivalent conv on the packed grid. Kernels stay
in the reference's ``[3,3,Cin,Cout]`` layout (checkpoint import and parity
untouched); the packed kernel is assembled in-graph from zero blocks +
weight blocks, so autodiff routes ``dw`` straight back to the original
parameter and the zero slots stay structurally zero.

Packed channel order is **C-major**: packed channel ``c*4 + (py*2+px)``.
That makes ``concatenate`` commute with packing — ``pack2(concat(a, b)) ==
concat(pack2(a), pack2(b))`` — which the fusion net's skip concats rely on.

Three lowerings (measured b24 256² bf16, fwd, vs the padded NHWC conv):

- **resident** (packed → packed, stride 1): output fine row ``2Y+oy`` with
  tap ``dy`` reads fine row ``2(Y+qy)+py`` where ``qy=(oy+dy)//2``,
  ``py=(oy+dy)%2`` — coarse taps qy ∈ {-1,0,1}, i.e. a 3×3 coarse conv over
  ``4Cin → 4Cout`` with 25% of the slots nonzero (4× the MACs, but they run
  at dense-lane bandwidth/MXU rates): 11→64 1.75→1.11 ms, 16→16 1.01→0.51,
  16→2 1.07→0.43. Loses for wide layers (64→64 1.67→2.52) — gate on skinny.
- **s2-consume** (packed → fine at half res, stride 2): output coarse row Y
  reads fine rows 2Y-1..2Y+1 = packed (Y-1,p1),(Y,p0),(Y,p1) — a 2×2 coarse
  conv over ``4Cin → Cout`` with 9/16 slots nonzero (1.78× MACs). Lets a
  stride-2 encoder conv consume a packed input without unpacking it.
- **packed-out phase deconv**: TorchConvTranspose's ≥256² phase form already
  computes all four output phases as channels at the input resolution; a
  C-major channel order + skipping depth-to-space emits the packed layout
  for free (nn/layers.py::TorchConvTranspose).

Exactness: every lowering computes the identical taps×weights sums as the
fine-layout conv (zero-padded kernel slots contribute exact zeros); measured
max |Δ| ≤ 2e-5 in fp32 — pure accumulation-order noise. ``PackedConvBlock``
and ``PackedIConvBlock`` create parameter/variable trees identical to
``ConvBlock``/``IConvBlock`` (``conv/kernel``, ``bn/{scale,bias}``,
batch_stats ``bn/{mean,var}``), so checkpoints are layout-interchangeable.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = [
    "pack2",
    "unpack2",
    "packed_kernel_resident",
    "packed_kernel_s2",
    "conv_packed_resident",
    "conv_packed_s2",
    "PackedConvBlock",
    "PackedIConvBlock",
]


def pack2(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] → [B, H/2, W/2, 4C], packed channel = c*4 + (py*2+px)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    # → [b, hc, wc, c, py, px] so c is major in the flattened last dim
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def unpack2(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`pack2`."""
    b, hc, wc, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, hc, wc, c, 2, 2)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, hc * 2, wc * 2, c)


def _tile_channel(v: jnp.ndarray) -> jnp.ndarray:
    """Per-channel vector [C] → packed per-channel vector [4C] (C-major)."""
    return jnp.tile(v[:, None], (1, 4)).reshape(-1)


def _phase_block_matrix(k, entries, cin, cout, n_out_phase=4):
    """[4*cin, n_out_phase*cout] block matrix in C-major packed order.

    ``entries``: {(p_in, p_out): (ty, tx)} — which original kernel tap fills
    the (p_in, p_out) block; missing blocks are zero. Built from stacked
    slices (no scatter) so XLA folds the assembly into cheap pads/concats
    and autodiff routes each block's cotangent back to ``k[ty, tx]``.
    """
    zeros = jnp.zeros((cin, cout), k.dtype)
    # phase-major assembly [4, cin, n_out_phase, cout]
    rows = jnp.stack([
        jnp.stack([
            k[entries[(p_in, p_out)]] if (p_in, p_out) in entries else zeros
            for p_out in range(n_out_phase)
        ], axis=1)
        for p_in in range(4)
    ], axis=0)
    # → C-major [cin, 4, cout, n_out_phase] → [4cin, n_out_phase*cout]
    return rows.transpose(1, 0, 3, 2).reshape(4 * cin, n_out_phase * cout)


def packed_kernel_resident(k: jnp.ndarray) -> jnp.ndarray:
    """[3,3,Cin,Cout] → [3,3,4Cin,4Cout] packed→packed stride-1 kernel.

    Coarse tap (qy+1, qx+1), block (p_in, p_out) holds k[dy+1, dx+1] where
    ``oy + dy = 2*qy + py`` (and likewise in x).
    """
    cin, cout = k.shape[2], k.shape[3]
    taps = {}  # (qy, qx) -> {(p_in4, p_out4): (ty, tx)}
    for oy in range(2):
        for ox in range(2):
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    qy, py = (oy + dy) // 2, (oy + dy) % 2
                    qx, px = (ox + dx) // 2, (ox + dx) % 2
                    taps.setdefault((qy, qx), {})[
                        (py * 2 + px, oy * 2 + ox)
                    ] = (dy + 1, dx + 1)
    rows = []
    for qy in (-1, 0, 1):
        row = [_phase_block_matrix(k, taps.get((qy, qx), {}), cin, cout)
               for qx in (-1, 0, 1)]
        rows.append(jnp.stack(row, axis=0))
    return jnp.stack(rows, axis=0)


def packed_kernel_s2(k: jnp.ndarray) -> jnp.ndarray:
    """[K,K,Cin,Cout] (K odd) → packed→fine stride-2 kernel.

    Output coarse (Y, X) = fine (2Y, 2X); tap dy ∈ [-(K-1)/2, (K-1)/2]
    reads fine 2Y+dy = packed (Y + dy//2, phase dy%2). Coarse taps span
    qy ∈ [-(p+1)//2, p//2] for p=(K-1)/2 — e.g. K=3 → 2 taps (pad 1,0),
    K=7 → 4 taps (pad 2,1): the FlowNetS/FlowNetC k7 stems consume their
    packed 256² inputs directly.
    """
    kk = k.shape[0]
    p = (kk - 1) // 2
    cin, cout = k.shape[2], k.shape[3]
    qlo, qhi = (-p) // 2, p // 2
    taps = {}
    for dy in range(-p, p + 1):
        for dx in range(-p, p + 1):
            qy, py = dy // 2, dy % 2
            qx, px = dx // 2, dx % 2
            taps.setdefault((qy, qx), {})[(py * 2 + px, 0)] = (dy + p, dx + p)
    rows = []
    for qy in range(qlo, qhi + 1):
        row = [_phase_block_matrix(k, taps.get((qy, qx), {}), cin, cout,
                                   n_out_phase=1)
               for qx in range(qlo, qhi + 1)]
        rows.append(jnp.stack(row, axis=0))
    return jnp.stack(rows, axis=0)


def _s2_padding(kk: int):
    p = (kk - 1) // 2
    qlo, qhi = (-p) // 2, p // 2
    return ((-qlo, qhi), (-qlo, qhi))


def conv_packed_resident(xp: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """3×3 stride-1 SAME conv on packed input/output.

    ``xp``: [B, Hc, Wc, 4Cin] packed; ``k``: the original [3,3,Cin,Cout].
    Equivalent to ``pack2(conv3x3_same(unpack2(xp), k))``.
    """
    kp = packed_kernel_resident(k)
    return jax.lax.conv_general_dilated(
        xp, kp, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def conv_packed_s2(xp: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """K×K (K odd) stride-2 pad-(K-1)/2 conv consuming packed input,
    emitting fine output.

    Equivalent to ``conv_kxk_s2(unpack2(xp), k)`` — output is at the
    packed (coarse) resolution in plain NHWC.
    """
    kp = packed_kernel_s2(k)
    return jax.lax.conv_general_dilated(
        xp, kp, (1, 1), _s2_padding(k.shape[0]),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


class _PackedConv(nn.Module):
    """Bare packed 3×3 conv holding the reference-layout parameters.

    Named "conv" by its parents so the tree is ``<block>/conv/kernel`` (+
    ``bias``), exactly like ``torch_conv`` inside ``ConvBlock``.
    """

    features: int
    stride: int = 1
    kernel_size: int = 3
    use_bias: bool = False
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros_init()
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, xp):
        cin = xp.shape[-1] // 4
        kk = self.kernel_size
        assert kk % 2 == 1, "packed convs require odd kernels"
        assert kk == 3 or self.stride == 2, \
            "resident lowering is 3x3-only (larger kernels: stride-2 consume)"
        kernel = self.param("kernel", self.kernel_init,
                            (kk, kk, cin, self.features), jnp.float32)
        dtype = self.dtype or xp.dtype
        k = kernel.astype(dtype)
        if self.stride == 1:
            y = conv_packed_resident(xp.astype(dtype), k)
        elif self.stride == 2:
            y = conv_packed_s2(xp.astype(dtype), k)
        else:
            raise ValueError(f"unsupported packed stride {self.stride}")
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,),
                              jnp.float32).astype(dtype)
            y = y + (_tile_channel(bias) if self.stride == 1 else bias)
        return y


class _PackedBatchNorm(nn.Module):
    """BatchNorm over a packed tensor with fine-layout semantics.

    Statistics reduce over (B, Hc, Wc) *and* the 4 phases of each channel,
    reproducing flax ``nn.BatchNorm``'s reduction over (B, H, W) on the fine
    tensor (stats in fp32, normalize in ``dtype`` — nn/layers.py::_batch_norm
    rationale; momentum/eps are the torch defaults used there). Named "bn"
    by its parents; parameter/variable names and shapes match
    ``nn.BatchNorm`` ([C] ``scale``/``bias``, batch_stats ``mean``/``var``).
    """

    features: int
    train: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, xp):
        c = self.features
        scale = self.param("scale", nn.initializers.ones_init(), (c,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), (c,),
                          jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        momentum, eps = 0.9, 1e-5

        if self.train:
            xf = xp.astype(jnp.float32)
            b, hc, wc, c4 = xf.shape
            g = xf.reshape(b, hc, wc, c, 4)
            mean = jnp.mean(g, axis=(0, 1, 2, 4))
            mean2 = jnp.mean(jnp.square(g), axis=(0, 1, 2, 4))
            var = mean2 - jnp.square(mean)
            if not self.is_initializing():
                ra_mean.value = (momentum * ra_mean.value
                                 + (1 - momentum) * mean)
                ra_var.value = momentum * ra_var.value + (1 - momentum) * var
        else:
            mean, var = ra_mean.value, ra_var.value

        dtype = self.dtype or xp.dtype
        inv = jax.lax.rsqrt(var + eps) * scale
        mul = inv.astype(dtype)
        add = (bias - mean * inv).astype(dtype)
        return xp * _tile_channel(mul) + _tile_channel(add)


class PackedConvBlock(nn.Module):
    """conv [+ BN] + LeakyReLU on packed tensors (ConvBlock, packed layout).

    ``stride=1`` keeps the packed layout (resident lowering); ``stride=2``
    consumes packed and emits fine NHWC at the coarse resolution (its BN is
    then the plain fine-layout one). Parameter tree matches ``ConvBlock``.
    """

    features: int
    stride: int = 1
    kernel_size: int = 3
    use_bn: bool = True
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros_init()
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, xp, train: bool = False):
        y = _PackedConv(
            self.features, self.stride, self.kernel_size,
            use_bias=not self.use_bn,
            kernel_init=self.kernel_init, bias_init=self.bias_init,
            dtype=self.dtype, name="conv",
        )(xp)
        if self.use_bn:
            dtype = self.dtype or y.dtype
            if self.stride == 1:
                y = _PackedBatchNorm(self.features, train, dtype,
                                     name="bn")(y)
            else:
                from .layers import _batch_norm

                y = _batch_norm(train, dtype)(y)
        return nn.leaky_relu(y, 0.1)


class PackedIConvBlock(nn.Module):
    """flownet2 ``i_conv`` (conv + bias [+ BN], no activation) on packed
    stride-1 tensors. Parameter tree matches ``IConvBlock``."""

    features: int
    use_bn: bool = True
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros_init()
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, xp, train: bool = False):
        y = _PackedConv(
            self.features, 1, use_bias=True, kernel_init=self.kernel_init,
            bias_init=self.bias_init, dtype=self.dtype, name="conv",
        )(xp)
        if self.use_bn:
            y = _PackedBatchNorm(self.features, train,
                                 self.dtype or y.dtype, name="bn")(y)
        return y
