"""Fused Pallas TPU kernel for bilinear backward warping (gather-free).

Why: XLA lowers per-pixel gathers to a scalar loop (~9 cycles/element). The
profiled FlowNet2 train step spent 270 ms/step — 56% — in warp-gather
fusions (5 full-resolution warps × 4 taps). This kernel reformulates the
warp as MXU work instead:

    out[p] = Σ_r  Wr[r, p] · [ wx0·(img @ C0) + wx1·(img @ C1) ][r, p]

where C0/C1 are one-hot column-selection matrices (built on the VPU from
integer compares — exact in bf16) and Wr holds the fused vertical bilinear
weights + bounds masks. The column-select matmuls run on the MXU; the
whole per-block pipeline (one-hot build → 2 matmuls → weighting → reduce)
stays in VMEM, so HBM traffic is O(img + flow + out) instead of either the
O(P·W) row-matrix round-trip a pure-XLA einsum pays or the scalar-loop
latency of the gather lowering.

Orientation matters (round-2 finding): every per-block tensor keeps the
position block P in *lanes* so the final per-position reductions run along
*sublanes* — plain strided adds — instead of across lanes, which Mosaic
lowers to log-depth lane shuffles. The shuffle reductions, not the MXU
selects, dominated the original (P, W) kernel: measured at b24 256² bf16,
fwd 8.1 → 3.3 ms and fwd+taps 13.5 → 3.8 ms from the transposition alone.

Round-3 restructure: the kernel selects **columns first** — the image block
(or its BAND-row window) right-multiplies the two (W, P) one-hot column
matrices, so every epilogue tensor is (rows, P) with rows = BAND (banded
path, the production case) instead of the former row-select layout's
(W, P). Same MXU MACs, but the one-hot builds, bilinear weighting, and
sublane reduces run on half the elements when BAND < W, and both the
banded and full variants consume the image in its natural (B, H, W)
layout, deleting the (B, W, H) pre-transpose relayout (and with it the
double materialization XLA paid to feed the band/full `lax.cond` branches
two different layouts).

Layouts also explain the (B, P) position planes: a trailing size-1 channel
dim would be padded 128× by TPU tiling. The public entry takes C=1 images
as (B, H, W); multi-channel cases fall back to the gather path (feature-map
warps in PWC/RAFT are at small resolutions where gathers are cheap).

fp32 exactness: the one-hot matmul is exact for bf16-representable values;
img is split hi/lo (``img = hi + lo`` with bf16 hi) and both passes
accumulate in fp32, so results match the reference gather warp to ~1e-6.

Backward: custom VJP — d/dimg is a Pallas kernel (the transposed one-hot
matmul accumulated across output blocks via grid revisiting); d/dposition
is a pure elementwise multiply of the output cotangent with the two
analytic derivative bases the forward-with-taps kernel already produces.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["warp2d_pallas", "supported"]


def _bounds(pi, lo, hi):
    return (pi >= lo) & (pi <= hi)


def _tap_weights(px, py, h, w):
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    fx = px - x0
    fy = py - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    wy0 = (1.0 - fy) * _bounds(y0i, 0, h - 1).astype(jnp.float32)
    wy1 = fy * _bounds(y0i + 1, 0, h - 1).astype(jnp.float32)
    wx0 = (1.0 - fx) * _bounds(x0i, 0, w - 1).astype(jnp.float32)
    wx1 = fx * _bounds(x0i + 1, 0, w - 1).astype(jnp.float32)
    return x0i, y0i, wx0, wx1, wy0, wy1


def _row_onehot(yi, h, dtype=jnp.bfloat16):
    """(P, H) one-hot — the d/dimg kernel's orientation."""
    p = yi.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (p, h), 1)
    return (jnp.clip(yi, 0, h - 1)[:, None] == rows).astype(dtype)


def _col_weight(x0i, wx0, wx1, w):
    """(P, W) fused horizontal weights — the d/dimg kernel's orientation."""
    p = x0i.shape[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (p, w), 1)
    c0 = (jnp.clip(x0i, 0, w - 1)[:, None] == cols).astype(jnp.float32)
    c1 = (jnp.clip(x0i + 1, 0, w - 1)[:, None] == cols).astype(jnp.float32)
    return c0 * wx0[:, None] + c1 * wx1[:, None]


def _onehot_t(idx, n, dtype):
    """(N, P) transposed one-hot: rows iota along sublanes."""
    p = idx.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, p), 0)
    return (jnp.clip(idx, 0, n - 1)[None, :] == rows).astype(dtype)


def _split(img, with_lo: bool = True):
    """bf16 hi/lo decomposition of an fp32 image (``img == hi + lo``).

    ``with_lo=False`` statically drops the residual: used when the incoming
    image is already bf16 (the mixed-precision cascade), where ``hi`` is an
    exact round-trip and the lo matmuls would multiply exact zeros — halving
    the kernel's MXU work with no precision change.
    """
    hi = img.astype(jnp.bfloat16)
    if not with_lo:
        return hi, None
    lo = (img - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


_DN = (((1,), (0,)), ((), ()))  # (R, W) @ (W, P) → (R, P)


def _colsel(img_hi, img_lo, c):
    """(R, W) split image @ (W, P) bf16 one-hot → (R, P) fp32-exact."""
    a = jax.lax.dot_general(img_hi, c, _DN,
                            preferred_element_type=jnp.float32)
    if img_lo is None:
        return a
    b = jax.lax.dot_general(img_lo, c, _DN,
                            preferred_element_type=jnp.float32)
    return a + b


def _sel_cols(img, x0i, w, lo):
    """Column selections b0/b1: (R, P) samples of columns x0, x0+1 across
    every image row R (the full height, or the BAND-row window).

    Out-of-bounds taps clip; their bilinear weights are zero
    (``_tap_weights`` bounds masks), so the clipped column's value never
    lands in the output.
    """
    img_hi, img_lo = _split(img, lo)
    b0 = _colsel(img_hi, img_lo, _onehot_t(x0i, w, jnp.bfloat16))
    b1 = _colsel(img_hi, img_lo, _onehot_t(x0i + 1, w, jnp.bfloat16))
    return b0, b1


def _y0_eff(y0i, h, w):
    """Row taps with the weight-zero (out-of-bounds) ones replaced by the
    block's raster base row, so fully-OOB positions never widen the window.
    Identical masking on the kernel and guard sides."""
    neutral = pl.program_id(1) * (PBLK // w)
    zero_w = (y0i < -1) | (y0i > h - 1)  # both taps y0, y0+1 out of bounds
    return jnp.where(zero_w, neutral, y0i)


def _band_start(y0i, h, w):
    """Data-adaptive window start: the block's own min row tap (clamped,
    8-aligned down). Exact whenever the block's row-tap SPREAD fits the
    window — the guard condition — regardless of absolute displacement."""
    lo = jnp.min(_y0_eff(y0i, h, w))
    s = jnp.clip(lo, 0, h - BAND)
    return (s // 8) * 8  # sublane-aligned dynamic slice


def _img_rows(img_ref, y0i, h, w, band):
    """The kernel's image rows in natural (R, W) layout + the row-tap base.

    Banded: a BAND-row window sliced along sublanes at the block's own
    data-adaptive 8-aligned start (``_band_start``); row taps rebase to the
    window. Exactness: rows outside the window are only ever addressed by
    taps whose bilinear weight is zero (the wrapper's guard dispatched
    here), and the clipped one-hot index then selects an arbitrary
    in-window row that the zero weight cancels.
    """
    if band:
        s = _band_start(y0i, h, w)
        return img_ref[0, pl.ds(s, BAND), :].astype(jnp.float32), \
            BAND, y0i - s
    return img_ref[0].astype(jnp.float32), h, y0i


def _fwd_kernel(img_ref, px_ref, py_ref, out_ref, *, h, w, pblk, lo=True,
                band=False):
    px = px_ref[0].reshape(pblk)
    py = py_ref[0].reshape(pblk)
    x0i, y0i, wx0, wx1, wy0, wy1 = _tap_weights(px, py, h, w)
    img, rows, yb = _img_rows(img_ref, y0i, h, w, band)
    b0, b1 = _sel_cols(img, x0i, w, lo)                     # (rows, P)
    acol = b0 * wx0[None, :] + b1 * wx1[None, :]            # (rows, P)
    r0 = _onehot_t(yb, rows, jnp.float32)
    r1 = _onehot_t(yb + 1, rows, jnp.float32)
    wr = r0 * wy0[None, :] + r1 * wy1[None, :]              # (rows, P)
    out_ref[0] = jnp.sum(acol * wr, axis=0).reshape(out_ref.shape[1:])


def _fwd_taps_kernel(img_ref, px_ref, py_ref, out_ref, dpx_ref, dpy_ref,
                     *, h, w, pblk, lo=True, band=False):
    """Forward + the two analytic position-derivative bases.

    The bilinear derivative collapses onto the tensors the forward already
    builds:  ∂out/∂px = Σ_r (b1·mx1 − b0·mx0)·wr  and
             ∂out/∂py = Σ_r acol·(r1·my1 − r0·my0),
    so d/dposition costs two extra sublane reduces here and the backward is
    a pure elementwise multiply by the output cotangent.
    """
    px = px_ref[0].reshape(pblk)
    py = py_ref[0].reshape(pblk)
    x0i, y0i, wx0, wx1, wy0, wy1 = _tap_weights(px, py, h, w)
    my0 = _bounds(y0i, 0, h - 1).astype(jnp.float32)
    my1 = _bounds(y0i + 1, 0, h - 1).astype(jnp.float32)
    mx0 = _bounds(x0i, 0, w - 1).astype(jnp.float32)
    mx1 = _bounds(x0i + 1, 0, w - 1).astype(jnp.float32)

    img, rows, yb = _img_rows(img_ref, y0i, h, w, band)
    b0, b1 = _sel_cols(img, x0i, w, lo)                     # (rows, P)
    acol = b0 * wx0[None, :] + b1 * wx1[None, :]            # (rows, P)
    r0 = _onehot_t(yb, rows, jnp.float32)
    r1 = _onehot_t(yb + 1, rows, jnp.float32)
    wr = r0 * wy0[None, :] + r1 * wy1[None, :]              # (rows, P)

    shp = out_ref.shape[1:]
    out_ref[0] = jnp.sum(acol * wr, axis=0).reshape(shp)
    dcol = b1 * mx1[None, :] - b0 * mx0[None, :]
    dpx_ref[0] = jnp.sum(dcol * wr, axis=0).reshape(shp)
    drow = r1 * my1[None, :] - r0 * my0[None, :]
    dpy_ref[0] = jnp.sum(acol * drow, axis=0).reshape(shp)


def _dimg_kernel(px_ref, py_ref, g_ref, dimg_ref, *, h, w, pblk):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        dimg_ref[...] = jnp.zeros_like(dimg_ref)

    px = px_ref[0].reshape(pblk)
    py = py_ref[0].reshape(pblk)
    x0i, y0i, wx0, wx1, wy0, wy1 = _tap_weights(px, py, h, w)
    # `+ 0.0 * px` joins g's vector layout with the position pipeline —
    # without it Mosaic's layout inference dies on an unsupported shape cast
    # when this reshaped vector feeds a dot operand
    g = g_ref[0].reshape(pblk).astype(jnp.float32) + 0.0 * px
    darow = (_col_weight(x0i, wx0, wx1, w) * g[:, None]).astype(jnp.bfloat16)
    dn = (((1,), (0,)), ((), ()))  # standard (H,P)@(P,W); explicit transpose
    r0t = jnp.transpose(
        (_row_onehot(y0i, h, jnp.float32) * wy0[:, None]).astype(jnp.bfloat16)
    )
    r1t = jnp.transpose(
        (_row_onehot(y0i + 1, h, jnp.float32) * wy1[:, None]).astype(jnp.bfloat16)
    )
    d0 = jax.lax.dot_general(r0t, darow, dn,
                             preferred_element_type=jnp.float32)
    d1 = jax.lax.dot_general(r1t, darow, dn,
                             preferred_element_type=jnp.float32)
    dimg_ref[0] = dimg_ref[0] + d0 + d1


PBLK = 1024  # 8 lane tiles of positions per block
# banded row window: BAND MXU K rows instead of H. Env-overridable for
# hardware A/B sweeps (tools/check_warp_tpu.py) — exactness is guard-checked
# per call either way, so any multiple of 8 is safe.
BAND = int(os.environ.get("TPUREG_WARP_BAND", "128"))

# Interpret-mode switch (tests monkeypatch this True): runs every pallas_call
# in this module under the pure-JAX emulator so the kernels' numerics are
# CI-checkable on CPU against the gather oracle. Never set in production.
_INTERPRET = False


def supported(img_shape, p_total) -> bool:
    """Whether the Pallas warp handles this case (else: gather fallback)."""
    _, h, w, c = img_shape
    return (
        c == 1
        and p_total % PBLK == 0
        and p_total >= 4096
        and h >= 8
        and w >= 128
        and h * w * 4 <= 4 * 2**20
    )


def _vec_spec():
    return pl.BlockSpec((1, PBLK // 128, 128), lambda i, j: (i, j, 0),
                        memory_space=pltpu.VMEM)


def _as_blocks(v, b, p_total):
    return v.reshape(b, p_total // 128, 128)


def _needs_lo(img2d) -> bool:
    """The lo-residual matmuls are only needed when bf16 can't represent the
    image exactly (trace-time static — bf16 inputs skip half the MXU work)."""
    return img2d.dtype != jnp.bfloat16


def _grid_call(kernel, img2d, px, py, n_out, band=False):
    b, h, w = img2d.shape
    p_total = px.shape[1]
    nblk = p_total // PBLK
    vec_spec = _vec_spec()
    # both variants consume the image in natural (B, H, W) layout — the
    # band/full lax.cond branches share one operand materialization
    img_spec = pl.BlockSpec((1, h, w), lambda i, j: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    shp = jax.ShapeDtypeStruct((b, p_total // 128, 128), jnp.float32)
    kdim = BAND if band else h
    return pl.pallas_call(
        kernel,
        out_shape=shp if n_out == 1 else (shp,) * n_out,
        grid=(b, nblk),
        in_specs=[img_spec, vec_spec, vec_spec],
        out_specs=vec_spec if n_out == 1 else (vec_spec,) * n_out,
        cost_estimate=pl.CostEstimate(
            flops=8 * b * p_total * kdim * w,
            bytes_accessed=4 * b * (h * w + (3 + n_out) * p_total),
            transcendentals=0,
        ),
        interpret=_INTERPRET,
    )(img2d, _as_blocks(px, b, p_total), _as_blocks(py, b, p_total))


def _band_ok(h, w, p_total) -> bool:
    """Static legality of the banded window for this geometry."""
    return (
        h > BAND
        and h % 8 == 0
        and (h - BAND) % 8 == 0
        and PBLK % w == 0
        and not os.environ.get("TPUREG_NO_BAND_WARP")
    )


def _band_guard(py, h, w):
    """Traced scalar: every block's row-tap SPREAD fits the window.

    The kernel picks each block's window start from its own min row tap
    (``_band_start``), so absolute displacement is irrelevant — only the
    within-block spread matters. Margin: the 8-alignment can lower the
    start by ≤7 and every position also taps row y0+1, so the spread must
    leave 9 rows of slack (see the case analysis in ``_band_start``'s
    callers: s ≥ min−7 ⇒ s+BAND−1 ≥ min+BAND−8 ≥ max+1)."""
    b, p_total = py.shape
    rpb = PBLK // w
    nblk = p_total // PBLK
    y0 = jnp.floor(py).astype(jnp.int32)
    j = jax.lax.broadcasted_iota(jnp.int32, (1, p_total), 1) // PBLK
    zero_w = (y0 < -1) | (y0 > h - 1)
    eff = jnp.where(zero_w, j * rpb, y0).reshape(b, nblk, PBLK)
    spread = jnp.max(eff, axis=2) - jnp.min(eff, axis=2)
    return jnp.all(spread <= BAND - 9)


def _fwd(img2d, px, py):
    """img2d [B,H,W]; px/py [B,P] absolute positions → [B,P] fp32.

    When the geometry allows it and a cheap traced guard shows every row
    tap fits its block's BAND-row window (true for registration flows —
    displacements ≪ image height), the banded kernel runs with H/BAND×
    fewer row-select MACs; otherwise the full-H kernel runs. Both are
    exact: out-of-window rows only back zero-weight taps.
    """
    b, h, w = img2d.shape
    p_total = px.shape[1]
    lo = _needs_lo(img2d)

    def full(img2d, px, py):
        return _grid_call(
            functools.partial(_fwd_kernel, h=h, w=w, pblk=PBLK, lo=lo),
            img2d, px, py, 1,
        )

    if not _band_ok(h, w, p_total):
        return full(img2d, px, py).reshape(b, p_total)

    def banded(img2d, px, py):
        return _grid_call(
            functools.partial(_fwd_kernel, h=h, w=w, pblk=PBLK, lo=lo,
                              band=True),
            img2d, px, py, 1, band=True,
        )

    out = jax.lax.cond(_band_guard(py, h, w), banded, full, img2d, px, py)
    return out.reshape(b, p_total)


@jax.custom_vjp
def warp2d_pallas(img2d, px, py):
    """Bilinear sample of [B,H,W] ``img2d`` at positions px/py [B,P].

    Zero contribution from out-of-bounds taps (matches ops.warp.sample2d).
    Returns [B, P] fp32.
    """
    return _fwd(img2d, px, py)


def _fwd_with_taps(img2d, px, py):
    b, h, w = img2d.shape
    p_total = px.shape[1]
    lo = _needs_lo(img2d)

    def full(img2d, px, py):
        return _grid_call(
            functools.partial(_fwd_taps_kernel, h=h, w=w, pblk=PBLK, lo=lo),
            img2d, px, py, 3,
        )

    if not _band_ok(h, w, p_total):
        outs = full(img2d, px, py)
    else:
        def banded(img2d, px, py):
            return _grid_call(
                functools.partial(_fwd_taps_kernel, h=h, w=w, pblk=PBLK,
                                  lo=lo, band=True),
                img2d, px, py, 3, band=True,
            )

        outs = jax.lax.cond(_band_guard(py, h, w), banded, full,
                            img2d, px, py)
    return tuple(o.reshape(b, p_total) for o in outs)


def _vjp_fwd(img2d, px, py):
    out, dpx_base, dpy_base = _fwd_with_taps(img2d, px, py)
    return out, (img2d, px, py, dpx_base, dpy_base)


def _vjp_bwd(res, g):
    img2d, px, py, dpx_base, dpy_base = res
    b, h, w = img2d.shape
    p_total = px.shape[1]
    nblk = p_total // PBLK
    vec_spec = _vec_spec()
    img_spec = pl.BlockSpec((1, h, w), lambda i, j: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    # d/dimg: kernel (DCE'd entirely when the image is a non-differentiated
    # input, the common case — warps of the raw moving image)
    dimg = pl.pallas_call(
        functools.partial(_dimg_kernel, h=h, w=w, pblk=PBLK),
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        grid=(b, nblk),
        in_specs=[vec_spec, vec_spec, vec_spec],
        out_specs=img_spec,
        interpret=_INTERPRET,
    )(_as_blocks(px, b, p_total), _as_blocks(py, b, p_total),
      _as_blocks(g, b, p_total))

    # d/dposition: pure elementwise on the saved derivative bases
    dpx = g * dpx_base
    dpy = g * dpy_base

    return (dimg.astype(img2d.dtype), dpx.astype(px.dtype),
            dpy.astype(py.dtype))


warp2d_pallas.defvjp(_vjp_fwd, _vjp_bwd)
