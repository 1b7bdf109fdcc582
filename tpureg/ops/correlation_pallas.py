"""Fused Pallas TPU kernel for the correlation cost volume.

Replaces the reference's CUDA ``correlation_package`` (SURVEY.md §2.2). The
naive XLA lowering of ``correlation_reference`` materializes K² shifted
slices of ``f2`` — up to 441 HBM round-trips of the feature map. This kernel
keeps ``f1`` and the padded ``f2`` resident in VMEM and emits all K²
displacement channels in a single pass: HBM traffic drops from
O(K² · H·W·C) to O(H·W·C + H·W·K²).

Grid: ``(B, C/CBLK)`` — one program per (batch element, channel slab). The
channel reduction is split across the second grid axis with output-block
accumulation (the out block is revisited for every channel slab, so Pallas
keeps it VMEM-resident); this caps per-step VMEM at ~4 MB even with the
pipeline's double buffering, well under the 16 MB budget. The K² displacement
sweep is fully unrolled inside the kernel (static slice offsets → straight-
line VPU code, no dynamic relayouts).

Backward: the op is algebraically simple (two shifted products), so the VJP
is taken from the jnp reference implementation — XLA fuses it acceptably and
training at reference shapes (≤64², C ≤ 256) is conv-dominated.

Validated against the jnp reference on real TPU hardware by
tools/check_pallas_tpu.py (forward and grad, all three reference configs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .correlation import correlation_reference, displacement_count

__all__ = ["correlation_pallas"]


def _corr_kernel(f1_ref, f2p_ref, out_ref, *, k: int, s2: int, h: int, w: int,
                 inv_c: float):
    j = pl.program_id(1)
    f1v = f1_ref[0].astype(jnp.float32)  # (H, W, CBLK)

    @pl.when(j == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    # Fully unrolled displacement sweep with static slice offsets. The padded
    # f2 slab stays VMEM-resident for all K² displacements.
    for iy in range(k):
        for ix in range(k):
            shifted = f2p_ref[
                0, iy * s2 : iy * s2 + h, ix * s2 : ix * s2 + w, :
            ].astype(jnp.float32)
            part = jnp.sum(f1v * shifted, axis=-1) * inv_c
            d = iy * k + ix
            out_ref[0, :, :, d] = out_ref[0, :, :, d] + part.astype(out_ref.dtype)


def _corr_fwd_pallas(f1, f2, max_displacement: int, stride2: int,
                     interpret: bool = False):
    b, h, w, c = f1.shape
    md, s2 = max_displacement, stride2
    k = displacement_count(md, s2)

    # channel slab size: keeps (f1 + padded f2) blocks ≤ ~3 MB per step
    cblk = 128 if c > 128 else c
    c_pad = -(-c // cblk) * cblk
    if c_pad != c:  # zero channels do not change the sum; inv_c uses true C
        f1 = jnp.pad(f1, ((0, 0), (0, 0), (0, 0), (0, c_pad - c)))
        f2 = jnp.pad(f2, ((0, 0), (0, 0), (0, 0), (0, c_pad - c)))

    f2p = jnp.pad(f2, ((0, 0), (md, md), (md, md), (0, 0)))
    hp, wp = h + 2 * md, w + 2 * md
    n_cblk = c_pad // cblk

    kernel = functools.partial(
        _corr_kernel, k=k, s2=s2, h=h, w=w, inv_c=1.0 / c
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, w, k * k), f1.dtype),
        grid=(b, n_cblk),
        in_specs=[
            pl.BlockSpec((1, h, w, cblk), lambda i, j: (i, 0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hp, wp, cblk), lambda i, j: (i, 0, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, k * k), lambda i, j: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * c_pad * k * k,
            bytes_accessed=4 * b * (h * w * c_pad + hp * wp * c_pad + h * w * k * k),
            transcendentals=0,
        ),
        interpret=interpret,
    )(f1, f2p)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def correlation_pallas(f1, f2, max_displacement: int, stride2: int = 1):
    return _corr_fwd_pallas(f1, f2, max_displacement, stride2)


def _fwd(f1, f2, max_displacement, stride2):
    return _corr_fwd_pallas(f1, f2, max_displacement, stride2), (f1, f2)


def _bwd(max_displacement, stride2, res, g):
    f1, f2 = res
    _, vjp = jax.vjp(
        lambda a, b: correlation_reference(a, b, max_displacement, stride2), f1, f2
    )
    return vjp(g)


correlation_pallas.defvjp(_fwd, _bwd)
