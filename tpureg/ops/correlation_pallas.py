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

Backward: one fused Pallas kernel over a (B, C-slab, dy) grid computing
BOTH cotangents per displacement tap: the lane-broadcast of g_d (the
per-tap cost driver — measured 24 → 13 ms at the FlowNetC b24 config when
the two single-output kernels were fused) is paid once and applied to the
shifted-f2 window (df1, output revisiting across dy) and to f1 (df2,
scatter-free accumulation into a padded VMEM scratch at the displacement's
static offset; the final grid step emits the center crop). Configs whose
block set would not fit VMEM fall back to the split two-kernel path
(df1 with an extra H-rowblock grid axis). The jnp reference VJP remains
the CPU path.

The default backward is the banded-MXU kernel (_bwd_banded_kernel): the
per-tap VPU sweep is reformulated as two banded matmuls per dy row, which
the MXU runs 2.5× faster (bf16 operands, exact) / 1.8× faster (f32 at
HIGHEST, ≤2e-7) than the fused VPU kernel — tools/check_banded_tpu.py. The
fused and split VPU kernels remain the over-VMEM fallback.

Validated against the jnp reference on real TPU hardware by
tools/check_pallas_tpu.py (forward and grad, all three reference configs).
"""

from __future__ import annotations

import functools
import os

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
                     interpret: bool = False, force_vpu: bool = False):
    # banded-MXU forward for bf16 operands whose block set fits VMEM (the
    # mixed-precision train path — see _fwd_banded_kernel); f32/mixed
    # operands and oversized configs keep the unrolled VPU tap sweep below.
    # force_vpu exists for in-CI numerical coverage of the fallback
    # (tests/test_pallas_interpret.py::test_force_vpu_bf16). The
    # TPUREG_BANDED_FWD=0 kill-switch reverts to the VPU forward everywhere
    # (hardware-validation gate: tools/check_pallas_tpu.py --compile-only).
    if (f1.dtype == jnp.bfloat16 and f2.dtype == jnp.bfloat16
            and not force_vpu
            and os.environ.get("TPUREG_BANDED_FWD", "1") != "0"
            and _fwd_banded_fits_vmem(f1.shape, max_displacement, stride2)):
        return _corr_fwd_banded(f1, f2, max_displacement, stride2,
                                interpret=interpret)
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


def _fwd_banded_kernel(s_ref, f1_ref, f2p_ref, out_ref, *, k, s2, h, w,
                       inv_c):
    """Banded-MXU forward (bf16 operands): per (B, dy, C-slab) grid step the
    channel contraction runs on the MXU as one y-batched matmul

        M[y, x, xx] = Σ_c f1[y, x, c] · f2p[y + iy·s2, xx, c]

    and the dy row's K displacement taps are then *extracted* from M's band
    by a second (tiny) x-batched one-hot matmul against the constant
    selection tensor S[x, xx, ix] = [xx == x + ix·s2]:

        out[iy·K + ix, y, x] = (1/C) Σ_xx M[y, x, xx] · S[x, xx, ix]

    This replaces the VPU tap sweep (2·H·W·C·K² elementwise MACs with a
    cross-lane channel reduce per tap — measured ~2.5× its elementwise
    roofline) with 2·H·W·Wp·C·K MXU FLOPs (~Wp/K ≈ 5× algorithmic
    overcompute at dense-MXU rates) plus an extraction matmul ~C/K smaller.
    Output is channel-first (B, K², H, W) — every tap writes a dense (H, W)
    tile instead of the NHWC layout's single-lane strided store; the public
    wrapper transposes back to NHWC once.

    Numerics: M is emitted in bf16 (f32 MXU accumulation, one rounding),
    the one-hot extraction of bf16 values is exact, and the per-slab
    accumulation into the bf16 out block rounds once per C-slab — the same
    rounding structure as the VPU kernel's per-tap ``out += part.astype``.
    bf16-only by design: f32 operands keep the VPU kernel (DEFAULT MXU
    precision would truncate them to bf16).
    """
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    iy = pl.program_id(1)
    f1v = f1_ref[0]                                        # (h, w, cblk) bf16
    f2rows = f2p_ref[0, pl.ds(iy * s2, h), :, :]           # (h, wp, cblk)
    m = jax.lax.dot_general(
        f1v, f2rows, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)  # Mosaic requires a 32-bit matmul accumulator;
    # the bf16 round-trip is the once-per-slab rounding documented above
    # Mosaic requires both operands' batch dims at position 0 ("batch dims
    # pos must be 0" — the round-3 crash put m's batch w at dim 1), so
    # transpose m before the x-batched extraction.
    m_t = jnp.transpose(m, (1, 0, 2))                      # (w, h, wp)
    ext = jax.lax.dot_general(
        m_t, s_ref[...], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                                      # (w, h, k)
    res = jnp.transpose(ext, (2, 1, 0)) * inv_c            # (k, h, w)
    out_ref[0] = out_ref[0] + res.astype(out_ref.dtype)


def _fwd_banded_fits_vmem(shape, max_displacement: int, stride2: int) -> bool:
    """Block set + in-kernel temporaries (f32+bf16 M, bf16 M-transpose, f32
    ext, the output transpose) of the banded forward against the 16 MB VMEM
    budget, with lane padding (wp and k pad to 128 in their lane positions)
    counted explicitly. Every gridded block — including the constant-index-map
    S — is counted double-buffered."""
    _, h, w, c = shape
    k = displacement_count(max_displacement, stride2)
    cblk = 128 if c > 128 else c
    wp = w + 2 * max_displacement
    lane = lambda n: -(-n // 128) * 128
    blocks = 2 * 2 * (h * w * cblk + (h + 2 * max_displacement) * wp * cblk) \
        + 2 * 2 * w * wp * k + 2 * 2 * k * h * w      # f1/f2p, S, out — all ×2
    temps = 8 * h * w * lane(wp) + 4 * w * h * lane(k) + 4 * k * h * lane(w)
    return blocks + temps < 13 * 2**20


def _corr_fwd_banded(f1, f2, max_displacement: int, stride2: int,
                     interpret: bool = False):
    """Channel-first banded-MXU forward dispatch (bf16 operands only)."""
    b, h, w, c = f1.shape
    md, s2 = max_displacement, stride2
    k = displacement_count(md, s2)

    cblk = 128 if c > 128 else c
    c_pad = -(-c // cblk) * cblk
    if c_pad != c:
        f1 = jnp.pad(f1, ((0, 0),) * 3 + ((0, c_pad - c),))
        f2 = jnp.pad(f2, ((0, 0),) * 3 + ((0, c_pad - c),))
    f2p = jnp.pad(f2, ((0, 0), (md, md), (md, md), (0, 0)))
    hp, wp = h + 2 * md, w + 2 * md
    n_cblk = c_pad // cblk

    xs = jnp.arange(w)[:, None, None]
    xxs = jnp.arange(wp)[None, :, None]
    ixs = jnp.arange(k)[None, None, :]
    sel = (xxs == xs + ixs * s2).astype(jnp.bfloat16)      # (w, wp, k)

    slab = lambda hh, ww: pl.BlockSpec(
        (1, hh, ww, cblk), lambda i, l, j: (i, 0, 0, j),
        memory_space=pltpu.VMEM,
    )
    out_cf = pl.pallas_call(
        functools.partial(_fwd_banded_kernel, k=k, s2=s2, h=h, w=w,
                          inv_c=1.0 / c),
        out_shape=jax.ShapeDtypeStruct((b, k * k, h, w), f1.dtype),
        grid=(b, k, n_cblk),
        in_specs=[
            pl.BlockSpec((w, wp, k), lambda i, l, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            slab(h, w), slab(hp, wp),
        ],
        out_specs=pl.BlockSpec((1, k, h, w), lambda i, l, j: (i, l, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * wp * c_pad * k,
            bytes_accessed=2 * b * (h * w * c_pad + hp * wp * c_pad
                                    + k * k * h * w),
            transcendentals=0,
        ),
        interpret=interpret,
    )(sel, f1, f2p)
    return jnp.transpose(out_cf, (0, 2, 3, 1))             # NHWC (b,h,w,k²)


def _df1_kernel(g_ref, f2p_ref, df1_ref, *, k, s2, h, w, inv_c):
    """df1[y,x,c] = (1/C) Σ_d g[y,x,d] · f2p[y+iy·s2, x+ix·s2, c].

    The dy row of the displacement window is a grid axis (output-block
    revisiting) — a fully unrolled K² accumulation makes Mosaic allocate a
    stack slot per intermediate and OOM VMEM.
    """
    iy = pl.program_id(2)
    r = pl.program_id(3)
    hb = df1_ref.shape[1]  # row-block height (H split to bound live temps)

    @pl.when(iy == 0)
    def _():
        df1_ref[...] = jnp.zeros_like(df1_ref)

    row0 = r * hb
    for ix in range(k):
        shifted = f2p_ref[
            0, pl.ds(iy * s2 + row0, hb), ix * s2 : ix * s2 + w, :
        ].astype(jnp.float32)
        # g arrives channel-first (B, K², H, W) and blocked by displacement
        # row (the grid's iy axis), so the in-kernel index is static
        gd = g_ref[0, ix, pl.ds(row0, hb), :].astype(jnp.float32)
        df1_ref[0] = df1_ref[0] + (gd * inv_c)[:, :, None] * shifted


def _df2_kernel(g_ref, f1_ref, df2_ref, buf, *, k, s2, h, w, hp, wp, inv_c):
    """Scatter-free df2: accumulate g_d·f1 into a padded VMEM buffer at the
    displacement's static offset, then emit the center crop. dy rows on the
    grid axis; the scratch buffer persists across the sequential grid."""
    iy = pl.program_id(2)
    md = (k - 1) * s2 // 2

    @pl.when(iy == 0)
    def _():
        buf[...] = jnp.zeros_like(buf)

    f1 = f1_ref[0].astype(jnp.float32)
    y0 = iy * s2
    for ix in range(k):
        x0 = ix * s2
        gd = g_ref[0, ix, :, :].astype(jnp.float32)  # (H, W), static index
        buf[pl.ds(y0, h), x0 : x0 + w, :] = (
            buf[pl.ds(y0, h), x0 : x0 + w, :] + gd[:, :, None] * f1
        )

    @pl.when(iy == k - 1)
    def _():
        df2_ref[0] = buf[md : md + h, md : md + w, :] * inv_c


def _bwd_fused_kernel(g_ref, f1_ref, f2p_ref, df1_ref, df2_ref, buf,
                      *, k, s2, h, w, inv_c):
    """df1 and df2 in one pass over the shared (B, C-slab, dy) grid.

    Each displacement tap needs the same lane-broadcast of g_d against both
    the shifted-f2 window (df1) and f1 (df2's scatter into the padded
    buffer); fusing the two sweeps pays that broadcast — and the grid's
    pipeline overhead — once instead of twice.
    """
    iy = pl.program_id(2)
    md = (k - 1) * s2 // 2

    @pl.when(iy == 0)
    def _():
        df1_ref[...] = jnp.zeros_like(df1_ref)
        buf[...] = jnp.zeros_like(buf)

    f1 = f1_ref[0].astype(jnp.float32)
    y0 = iy * s2
    for ix in range(k):
        x0 = ix * s2
        gb = (g_ref[0, ix, :, :].astype(jnp.float32) * inv_c)[:, :, None]
        shifted = f2p_ref[
            0, pl.ds(y0, h), x0 : x0 + w, :
        ].astype(jnp.float32)
        df1_ref[0] = df1_ref[0] + gb * shifted
        buf[pl.ds(y0, h), x0 : x0 + w, :] = (
            buf[pl.ds(y0, h), x0 : x0 + w, :] + gb * f1
        )

    @pl.when(iy == k - 1)
    def _():
        df2_ref[0] = buf[md : md + h, md : md + w, :]


def _bwd_banded_kernel(g_ref, f1_ref, f2p_ref, df1_ref, df2_ref, buf,
                       *, k, s2, h, w, wp, inv_c, precision):
    """Banded-MXU backward: per (B, C-slab, dy) grid step, the dy row's K
    displacement taps are folded into per-y banded matrices T_y (stored
    transposed, (wp, w), so the g values broadcast along sublanes — no
    relayout), then BOTH cotangents become batched matmuls on the MXU:

        df1[y]  = T_yᵀ-contracted @ f2p_rows[y]   (contract xx)
        df2p[y+dy·s2] += T_y @ f1[y]              (contract x)

    replacing the per-tap VPU multiply sweep (2·H·W·C·K² elementwise MACs)
    with a K-tap band build (2·H·W·K·Wp, ~100× smaller) + 2·2·H·W·Wp·C MXU
    FLOPs. The band offsets are static per ix; the only dynamic sublane
    offset is the same ``iy·s2`` row slide the shipped fused kernel already
    compiles.

    Numerics: the ``inv_c`` scale is applied AFTER the dots, so the band
    matrix holds raw ``g`` values. With bf16 operands (the mixed-precision
    training path) the MXU's one-pass bf16 truncation of each operand is
    then the identity — products are exact and accumulate in f32, matching
    the VPU fused kernel bit-for-bit up to summation order. With f32
    operands the default one-pass truncation loses ~8 mantissa bits
    (measured ~6e-4 abs at the cascade config), so the f32 path either
    keeps the fused VPU kernel or requests ``precision=HIGHEST`` here.
    """
    iy = pl.program_id(2)
    md = (k - 1) * s2 // 2

    @pl.when(iy == 0)
    def _():
        df1_ref[...] = jnp.zeros_like(df1_ref)
        buf[...] = jnp.zeros_like(buf)

    # T_t[y, xx, x] = Σ_ix g[y, x, d_ix] · [xx == x + ix·s2]
    # ((xx, x) entries collide for at most one ix, so every entry is exactly
    # one g value — no additive rounding in the build)
    rows_xx = jax.lax.broadcasted_iota(jnp.int32, (wp, w), 0)
    cols_x = jax.lax.broadcasted_iota(jnp.int32, (wp, w), 1)
    tt = jnp.zeros((h, wp, w), jnp.float32)
    for ix in range(k):
        m = (rows_xx == cols_x + ix * s2).astype(jnp.float32)
        gsl = g_ref[0, ix].astype(jnp.float32)                # (h, w)
        tt = tt + gsl[:, None, :] * m[None]

    f2rows = f2p_ref[0, pl.ds(iy * s2, h), :, :].astype(jnp.float32)
    f1v = f1_ref[0].astype(jnp.float32)                       # (h, w, c)

    # df1[y, x, c] = (1/C) Σ_xx T_t[y, xx, x] · f2rows[y, xx, c]
    d1 = jax.lax.dot_general(
        tt, f2rows, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=precision,
    )                                                         # (h, w, c)
    df1_ref[0] = df1_ref[0] + d1 * inv_c

    # df2p[y + iy·s2, xx, c] += (1/C) Σ_x T_t[y, xx, x] · f1[y, x, c]
    d2 = jax.lax.dot_general(
        tt, f1v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=precision,
    )                                                         # (h, wp, c)
    buf[pl.ds(iy * s2, h), :, :] = (
        buf[pl.ds(iy * s2, h), :, :] + d2 * inv_c
    )

    @pl.when(iy == k - 1)
    def _():
        df2_ref[0] = buf[md : md + h, md : md + w, :]


def _fused_bwd_bytes(h, w, hp, wp, cblk, k):
    """Per-grid-step VMEM footprint of the fused/banded backward block set
    (gridded blocks double-buffered, scratch single-buffered)."""
    return 4 * (
        2 * (hp * wp * cblk          # f2p slab (double-buffered)
             + 3 * h * w * cblk     # f1 + df1 + df2 blocks
             + k * h * w)           # g block (one dy row)
        + hp * wp * cblk            # accumulation scratch (single-buffered)
    )


def _banded_fits_vmem(shape, max_displacement: int, stride2: int) -> bool:
    """Whether the banded backward's block set + in-kernel temporaries
    (band matrix T_t (h, wp, w) and the pre-scale dot outputs) fit VMEM."""
    _, h, w, c = shape
    md = max_displacement
    k = displacement_count(md, stride2)
    cblk = 128 if c > 128 else c
    hp, wp = h + 2 * md, w + 2 * md
    temps = 4 * (h * wp * w + h * wp * cblk)
    return _fused_bwd_bytes(h, w, hp, wp, cblk, k) + temps < 13 * 2**20


def _corr_bwd_banded(f1, f2, g, max_displacement: int, stride2: int,
                     interpret: bool = False, precision=None):
    """Banded-MXU backward dispatch (same contract as _corr_bwd_pallas).

    ``precision`` is forwarded to the in-kernel dots: leave ``None``
    (DEFAULT, one bf16 pass — exact for bf16 operands) on the bf16 training
    path; pass ``jax.lax.Precision.HIGHEST`` for f32 operands.
    """
    b, h, w, c = f1.shape
    md, s2 = max_displacement, stride2
    k = displacement_count(md, s2)

    cblk = 128 if c > 128 else c
    c_pad = -(-c // cblk) * cblk
    f1p_ch, f2p_ch = f1, f2
    if c_pad != c:
        f1p_ch = jnp.pad(f1, ((0, 0),) * 3 + ((0, c_pad - c),))
        f2p_ch = jnp.pad(f2, ((0, 0),) * 3 + ((0, c_pad - c),))
    f2p = jnp.pad(f2p_ch, ((0, 0), (md, md), (md, md), (0, 0)))
    hp, wp = h + 2 * md, w + 2 * md
    n_cblk = c_pad // cblk

    # keep g in its native dtype (bf16 halves the blocked VMEM traffic; the
    # kernel upcasts to f32 losslessly)
    g_cf = jnp.transpose(g, (0, 3, 1, 2))
    g_spec = pl.BlockSpec((1, k, h, w), lambda i, j, l: (i, l, 0, 0),
                          memory_space=pltpu.VMEM)
    slab = lambda hh, ww: pl.BlockSpec(
        (1, hh, ww, cblk), lambda i, j, l: (i, 0, 0, j),
        memory_space=pltpu.VMEM,
    )
    df1, df2 = pl.pallas_call(
        functools.partial(_bwd_banded_kernel, k=k, s2=s2, h=h, w=w, wp=wp,
                          inv_c=1.0 / c, precision=precision),
        out_shape=(jax.ShapeDtypeStruct((b, h, w, c_pad), jnp.float32),) * 2,
        grid=(b, n_cblk, k),
        in_specs=[g_spec, slab(h, w), slab(hp, wp)],
        out_specs=(slab(h, w),) * 2,
        scratch_shapes=[pltpu.VMEM((hp, wp, cblk), jnp.float32)],
        interpret=interpret,
    )(g_cf, f1p_ch, f2p)
    if c_pad != c:
        df1 = df1[..., :c]
        df2 = df2[..., :c]
    return df1.astype(f1.dtype), df2.astype(f2.dtype)


def _corr_bwd_pallas(f1, f2, g, max_displacement: int, stride2: int,
                     interpret: bool = False, force_split: bool = False):
    """``interpret``/``force_split`` exist for in-CI numerical coverage on
    CPU: interpret mode runs the kernels under the pure-JAX emulator, and
    force_split exercises the split df1/df2 path even when the fused kernel
    would fit VMEM (tests/test_pallas_interpret.py)."""
    b, h, w, c = f1.shape
    md, s2 = max_displacement, stride2
    k = displacement_count(md, s2)

    cblk = 128 if c > 128 else c
    c_pad = -(-c // cblk) * cblk
    f1p_ch = f1
    f2p_ch = f2
    if c_pad != c:
        f1p_ch = jnp.pad(f1, ((0, 0),) * 3 + ((0, c_pad - c),))
        f2p_ch = jnp.pad(f2, ((0, 0),) * 3 + ((0, c_pad - c),))
    f2p = jnp.pad(f2p_ch, ((0, 0), (md, md), (md, md), (0, 0)))
    hp, wp = h + 2 * md, w + 2 * md
    n_cblk = c_pad // cblk
    inv_c = 1.0 / c

    g_cf = jnp.transpose(g.astype(jnp.float32), (0, 3, 1, 2))  # (B, K², H, W)
    # block g by displacement row: the grid's iy step sees only its K dx
    # channels (86 KB instead of the full 1.8 MB cost volume)
    g_spec = pl.BlockSpec((1, k, h, w), lambda i, j, l: (i, l, 0, 0),
                          memory_space=pltpu.VMEM)
    slab = lambda hh, ww: pl.BlockSpec(
        (1, hh, ww, cblk), lambda i, j, l: (i, 0, 0, j),
        memory_space=pltpu.VMEM,
    )

    # fused single-pass backward when the block set fits VMEM. Pallas
    # double-buffers every gridded in/out block (scratch is single-buffered),
    # so count those 2× — the shipped FlowNetC cascade config (32², C=256→2
    # slabs) lands at ~11.3 MB actual and takes this path; anything the
    # estimate puts past 13 MB falls back to the split kernels instead of
    # failing the 16 MB budget at Mosaic compile time.
    fused_bytes = _fused_bwd_bytes(h, w, hp, wp, cblk, k)
    if fused_bytes < 13 * 2**20 and not force_split:
        df1, df2 = pl.pallas_call(
            functools.partial(_bwd_fused_kernel, k=k, s2=s2, h=h, w=w,
                              inv_c=inv_c),
            out_shape=(jax.ShapeDtypeStruct((b, h, w, c_pad), jnp.float32),) * 2,
            grid=(b, n_cblk, k),
            in_specs=[g_spec, slab(h, w), slab(hp, wp)],
            out_specs=(slab(h, w),) * 2,
            scratch_shapes=[pltpu.VMEM((hp, wp, cblk), jnp.float32)],
            interpret=interpret,
        )(g_cf, f1p_ch, f2p)
        if c_pad != c:
            df1 = df1[..., :c]
            df2 = df2[..., :c]
        return df1.astype(f1.dtype), df2.astype(f2.dtype)

    n_rowblk = 2 if h >= 16 else 1
    hb = h // n_rowblk
    df1 = pl.pallas_call(
        functools.partial(_df1_kernel, k=k, s2=s2, h=h, w=w, inv_c=inv_c),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c_pad), jnp.float32),
        grid=(b, n_cblk, k, n_rowblk),
        in_specs=[
            pl.BlockSpec((1, k, h, w), lambda i, j, l, r: (i, l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hp, wp, cblk), lambda i, j, l, r: (i, 0, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hb, w, cblk),
                               lambda i, j, l, r: (i, r, 0, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(g_cf, f2p)

    df2 = pl.pallas_call(
        functools.partial(_df2_kernel, k=k, s2=s2, h=h, w=w, hp=hp, wp=wp,
                          inv_c=inv_c),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c_pad), jnp.float32),
        grid=(b, n_cblk, k),
        in_specs=[g_spec, slab(h, w)],
        out_specs=slab(h, w),
        scratch_shapes=[pltpu.VMEM((hp, wp, cblk), jnp.float32)],
        interpret=interpret,
    )(g_cf, f1p_ch)

    if c_pad != c:
        df1 = df1[..., :c]
        df2 = df2[..., :c]
    return df1.astype(f1.dtype), df2.astype(f2.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def correlation_pallas(f1, f2, max_displacement: int, stride2: int = 1):
    return _corr_fwd_pallas(f1, f2, max_displacement, stride2)


def _fwd(f1, f2, max_displacement, stride2):
    return _corr_fwd_pallas(f1, f2, max_displacement, stride2), (f1, f2)


def _bwd(max_displacement, stride2, res, g):
    f1, f2 = res
    if jax.default_backend() == "tpu":
        # banded-MXU backward wherever its block set fits VMEM: bf16
        # operands run at DEFAULT matmul precision (exact — see
        # _bwd_banded_kernel docstring) at 2.5× the fused VPU kernel;
        # f32 operands request HIGHEST (bf16x6 passes, ≤2e-7 vs the jnp
        # reference on hardware) and still beat fused 1.8×. Oversized
        # configs fall back to the fused/split VPU path.
        if _banded_fits_vmem(f1.shape, max_displacement, stride2):
            precision = (None if f1.dtype == jnp.bfloat16
                         else jax.lax.Precision.HIGHEST)
            return _corr_bwd_banded(f1, f2, g, max_displacement, stride2,
                                    precision=precision)
        return _corr_bwd_pallas(f1, f2, g, max_displacement, stride2)
    _, vjp = jax.vjp(
        lambda a, b: correlation_reference(a, b, max_displacement, stride2), f1, f2
    )
    return vjp(g)


correlation_pallas.defvjp(_fwd, _bwd)
