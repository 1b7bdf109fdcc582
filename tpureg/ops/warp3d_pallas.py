"""Fused Pallas TPU kernel for trilinear 3-D backward warping (gather-free).

Why: the volumetric path's dominant cost is the 8-tap trilinear gather —
``take_along_axis`` over an 11.5M-voxel (256,256,176) volume lowers to a
memory-latency-bound XLA gather measured at 804.6 ms forward / 1799 ms
fwd+grad per volume (BASELINE.md round-5 3-D notes), ~70% of the whole
VoxelMorph3D train step. This kernel generalizes the 2-D banded warp
(ops/warp_pallas.py) to 3-D with the same reformulation-as-MXU-work:

    out[p] = Σ_r  Wr[r, p] · [ wx0·(slab @ C0) + wx1·(slab @ C1) ][r, p]

where C0/C1 are (W, P) one-hot column selectors (MXU matmuls) and Wr now
holds FOUR fused row taps — the (z0,y0), (z0,y0+1), (z0+1,y0), (z0+1,y0+1)
corners with their bilinear-in-(y,z) weights and bounds masks — over a
small flattened (z, y) row window, instead of the 2-D kernel's two y taps.

The volume cannot live in VMEM (a 256³ fp32 volume is 46 MB), so the
kernel stages it in two levels:

1. **Slab**: the grid iterates (batch, z-chunk, position-block) with the
   position block innermost. Each z-chunk program covers ``ZB`` output
   slices; at its first position block, the kernel DMAs a contiguous
   ``S = 3·ZB``-slice slab centered on the chunk from HBM into a VMEM
   scratch that persists across the chunk's position blocks (TPU grids
   execute sequentially, so j==0 initialization is the established
   revisiting pattern — see _dimg_kernel in warp_pallas.py).
2. **Fine window**: per position block, a data-adaptive (ZW, YW) window is
   dynamically sliced from the slab at the block's own min z/y row taps
   (the 2-D kernel's ``_band_start`` trick, once per axis) and flattened
   to R = ZW·YW rows. With ZW=4 and YW=32 this keeps R at 128 — the same
   row-select cost the 2-D banded kernel pays — despite the 3-D domain.

Exactness mirrors the 2-D kernel: the one-hot matmuls are exact for
bf16-representable values and the volume is split hi/lo (``vol = hi+lo``
with bf16 halves, both accumulated in fp32), so results match the
reference trilinear gather (ops/warp.py::warp3d semantics — zero
contribution from out-of-bounds taps, reference models.py:156-191 /
dataset.py:100-167 volumetric protocol) to ~1e-6. Out-of-window aliasing
cannot corrupt the output: every row-tap weight carries its per-axis
bounds mask, and the wrapper's traced guard (``_guard3``) dispatches to
the gather fallback via ``lax.cond`` whenever any block's row taps do not
provably fit its windows (large or non-smooth flows, e.g. strong affine
rotations).

Backward: custom VJP. d/dposition is an elementwise multiply of the
output cotangent with three analytic derivative bases the forward-with-
taps kernel emits alongside the output (the trilinear derivative collapses
onto tensors the forward already builds). d/dvol transposes the gather
formulation in plain XLA (a scatter-add) — it is DCE'd in the training
step, where the warped volume is input data, and only materializes in
the rare vol-differentiated cases, which are off the hot path.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["warp3d_pallas", "supported"]

ZB = 8           # output z-slices per grid chunk
S = 3 * ZB       # slab slices resident in VMEM per chunk
ZW = 8           # fine-window slices per position block

# Interpret-mode switch (tests monkeypatch this True): every pallas_call in
# this module runs under the pure-JAX emulator so the kernel numerics are
# CI-checkable on CPU against the gather oracle. Never set in production.
_INTERPRET = False


def _geometry(h: int, w: int):
    """(positions-per-block, y-window) for a (H, W) slice.

    Position blocks are a fixed 1024 voxels — 8 fp32 sublane tiles, the
    same flat-plane shape the 2-D kernel uses (Mosaic can only flatten
    vectors whose sublane count is a tile multiple). A block is a raster
    run inside one z-slice (``supported`` requires 1024 | H·W), spanning
    ceil(1024/W)+1 partial rows; the y window is the smallest 16-multiple
    covering that span plus the alignment margin (16) and ≥7 rows of
    smooth-flow variation budget (see ``_guard3``).
    """
    pblk = 1024
    span = -(-pblk // w) + 1
    yw = ((span + 23 + 15) // 16) * 16
    return pblk, yw


def supported(vol_shape) -> bool:
    """Whether the Pallas 3-D warp handles this geometry (else: gather).

    Requirements: single-channel (B, D, H, W) volumes, whole z-chunks,
    z-slice-aligned position blocks (1024 | H·W), sublane-tileable H, and
    a hi+lo bf16 slab that fits the VMEM budget alongside the kernel's
    working set (lane-padded W).
    """
    _, d, h, w = vol_shape
    if d % ZB or d < S or h % 16 or h < 64 or w < 64:
        return False
    pblk, yw = _geometry(h, w)
    if (h * w) % pblk or yw > h:
        return False
    w_pad = -(-w // 128) * 128
    return S * h * w_pad * 2 * 2 <= 7 * 2**20


def _bounds(i, lo, hi):
    return (i >= lo) & (i <= hi)


def _tap_data(px, py, pz, d, h, w):
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    z0 = jnp.floor(pz)
    fx = px - x0
    fy = py - y0
    fz = pz - z0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    z0i = z0.astype(jnp.int32)
    f32 = jnp.float32
    m = dict(
        mx0=_bounds(x0i, 0, w - 1).astype(f32),
        mx1=_bounds(x0i + 1, 0, w - 1).astype(f32),
        my0=_bounds(y0i, 0, h - 1).astype(f32),
        my1=_bounds(y0i + 1, 0, h - 1).astype(f32),
        mz0=_bounds(z0i, 0, d - 1).astype(f32),
        mz1=_bounds(z0i + 1, 0, d - 1).astype(f32),
    )
    w_ = dict(
        wx0=(1.0 - fx) * m["mx0"], wx1=fx * m["mx1"],
        wy0=(1.0 - fy) * m["my0"], wy1=fy * m["my1"],
        wz0=(1.0 - fz) * m["mz0"], wz1=fz * m["mz1"],
    )
    return x0i, y0i, z0i, w_, m


def _onehot_t(idx, n, dtype):
    """(N, P) transposed one-hot, clipped index (zero-weight taps cancel)."""
    p = idx.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, p), 0)
    return (jnp.clip(idx, 0, n - 1)[None, :] == rows).astype(dtype)


def _colsel(hi, lo, c):
    dn = (((1,), (0,)), ((), ()))
    a = jax.lax.dot_general(hi, c, dn, preferred_element_type=jnp.float32)
    if lo is None:
        return a
    return a + jax.lax.dot_general(lo, c, dn,
                                   preferred_element_type=jnp.float32)


def _windows(y0i, z0i, k, j, d, h, w, pblk, yw):
    """Neutralized row taps + the block's data-adaptive window starts.

    Fully-out-of-bounds taps (both corners outside the volume, weight zero
    on both) rebase to the position's own raster coordinates so they never
    widen the window; partially-valid taps (y0 or z0 == -1 / == size-1)
    keep their value — the invalid corner's weight is zero and its row
    equality simply misses (or aliases a row whose fused weight is zero),
    while the valid corner maps correctly. The y start is 16-aligned for
    bf16 sublane tiling; z slices need no alignment (leading dim, whole-
    tile strides).
    """
    base = j * pblk
    ras = base + jax.lax.broadcasted_iota(jnp.int32, (1, pblk), 1)[0]
    y_neutral = (ras // w) % h
    z_neutral = k * ZB + base // (h * w)
    y0e = jnp.where((y0i < -1) | (y0i > h - 1), y_neutral, y0i)
    z0e = jnp.where((z0i < -1) | (z0i > d - 1), z_neutral, z0i)
    zbase = jnp.clip((k - 1) * ZB, 0, d - S)
    zrel = z0e - zbase
    zs = jnp.clip(jnp.min(jnp.clip(zrel, 0, S - 1)), 0, S - ZW)
    ys = (jnp.clip(jnp.min(jnp.clip(y0e, 0, h - 1)), 0, h - yw) // 16) * 16
    return y0e, zrel, ys, zs, zbase


def _row_weights(f00, w_, m, yw, r, pblk, with_taps: bool):
    """Fused four-tap row tensors over the flattened (ZW, YW) window.

    f00 is the (z0, y0) corner's flat row; the other corners sit at +1,
    +YW, +YW+1. Returns wr (the fused bilinear-in-(y,z) row weights) and,
    for the taps variant, the analytic d/dpy and d/dpz row bases.
    """
    rows = jax.lax.broadcasted_iota(jnp.int32, (r, pblk), 0)

    def oh(f):
        return (rows == f[None, :]).astype(jnp.float32)

    r00, r01 = oh(f00), oh(f00 + 1)
    r10, r11 = oh(f00 + yw), oh(f00 + yw + 1)
    a0 = r00 * w_["wy0"][None] + r01 * w_["wy1"][None]   # z0 plane
    a1 = r10 * w_["wy0"][None] + r11 * w_["wy1"][None]   # z0+1 plane
    wr = a0 * w_["wz0"][None] + a1 * w_["wz1"][None]
    if not with_taps:
        return wr, None, None
    dwz = a1 * m["mz1"][None] - a0 * m["mz0"][None]
    dwy = (
        (r01 * m["my1"][None] - r00 * m["my0"][None]) * w_["wz0"][None]
        + (r11 * m["my1"][None] - r10 * m["my0"][None]) * w_["wz1"][None]
    )
    return wr, dwy, dwz


def _kernel3(vol_refs, px_ref, py_ref, pz_ref, outs, hi_scr, lo_scr, sem,
             *, d, h, w, pblk, yw, lo, with_taps):
    b = pl.program_id(0)
    k = pl.program_id(1)
    j = pl.program_id(2)
    zbase_dma = jnp.clip((k - 1) * ZB, 0, d - S)

    @pl.when(j == 0)
    def _():
        cp = pltpu.make_async_copy(
            vol_refs[0].at[b, pl.ds(zbase_dma, S)], hi_scr, sem.at[0])
        cp.start()
        if lo:
            cp2 = pltpu.make_async_copy(
                vol_refs[1].at[b, pl.ds(zbase_dma, S)], lo_scr, sem.at[1])
            cp2.start()
            cp2.wait()
        cp.wait()

    px = px_ref[0].reshape(pblk)
    py = py_ref[0].reshape(pblk)
    pz = pz_ref[0].reshape(pblk)
    x0i, y0i, z0i, w_, m = _tap_data(px, py, pz, d, h, w)
    y0e, zrel, ys, zs, _ = _windows(y0i, z0i, k, j, d, h, w, pblk, yw)

    wp = hi_scr.shape[-1]  # lane-padded W (padded cols are zero, see below)
    fine_hi = hi_scr[pl.ds(zs, ZW), pl.ds(ys, yw), :].reshape(ZW * yw, wp)
    fine_lo = (lo_scr[pl.ds(zs, ZW), pl.ds(ys, yw), :].reshape(ZW * yw, wp)
               if lo else None)
    b0 = _colsel(fine_hi, fine_lo, _onehot_t(x0i, wp, jnp.bfloat16))
    b1 = _colsel(fine_hi, fine_lo, _onehot_t(x0i + 1, wp, jnp.bfloat16))
    acol = b0 * w_["wx0"][None] + b1 * w_["wx1"][None]        # (R, P)

    f00 = (zrel - zs) * yw + (y0e - ys)
    r = ZW * yw
    wr, dwy, dwz = _row_weights(f00, w_, m, yw, r, pblk, with_taps)

    shp = outs[0].shape[1:]
    outs[0][0] = jnp.sum(acol * wr, axis=0).reshape(shp)
    if with_taps:
        dcol = b1 * m["mx1"][None] - b0 * m["mx0"][None]
        outs[1][0] = jnp.sum(dcol * wr, axis=0).reshape(shp)
        outs[2][0] = jnp.sum(acol * dwy, axis=0).reshape(shp)
        outs[3][0] = jnp.sum(acol * dwz, axis=0).reshape(shp)


def _kernel_entry(*refs, n_vol, n_out, **kw):
    vol_refs = refs[:n_vol]
    px_ref, py_ref, pz_ref = refs[n_vol:n_vol + 3]
    outs = refs[n_vol + 3:n_vol + 3 + n_out]
    scr = refs[n_vol + 3 + n_out:]
    hi_scr, lo_scr, sem = (scr[0], scr[1], scr[2]) if len(scr) == 3 else \
        (scr[0], None, scr[1])
    _kernel3(vol_refs, px_ref, py_ref, pz_ref, outs, hi_scr, lo_scr, sem,
             **kw)


def _split(vol, wpad):
    """bf16 hi/lo decomposition (``vol == hi + lo``); lo statically dropped
    for bf16 inputs (exact round-trip — halves the DMA and MXU work).

    W is zero-padded to a lane multiple: the HBM buffer is lane-padded by
    the tiled layout anyway, and Mosaic rejects DMA slices whose minor dim
    is not 128-aligned — padding explicitly makes the slab slice whole.
    Padded columns hold zeros and are only ever selected by clipped
    zero-weight taps.
    """
    pad = ((0, 0), (0, 0), (0, 0), (0, wpad - vol.shape[-1]))
    if vol.dtype == jnp.bfloat16:
        return (jnp.pad(vol, pad),), False
    # reduce_precision, NOT a bf16 round-trip: this split runs in XLA-land
    # (the 2-D kernel splits inside Mosaic), and under the fleet-default
    # --xla_allow_excess_precision=true XLA elides f32→bf16→f32 convert
    # pairs, silently zeroing the residual (round-5 hardware finding).
    v32 = vol.astype(jnp.float32)
    hi32 = jax.lax.reduce_precision(v32, exponent_bits=8, mantissa_bits=7)
    hi = hi32.astype(jnp.bfloat16)
    lo = (v32 - hi32).astype(jnp.bfloat16)
    return (jnp.pad(hi, pad), jnp.pad(lo, pad)), True


def _grid_call(vol, px, py, pz, with_taps: bool):
    b, d, h, w = vol.shape
    pblk, yw = _geometry(h, w)
    p_total = d * h * w
    nblk = (ZB * h * w) // pblk
    wpad = -(-w // 128) * 128
    vols, lo = _split(vol, wpad)
    n_out = 4 if with_taps else 1

    vec_spec = pl.BlockSpec((1, pblk // 128, 128),
                            lambda bi, k, j: (bi, k * nblk + j, 0),
                            memory_space=pltpu.VMEM)
    vol_spec = pl.BlockSpec(memory_space=pl.ANY)
    shp = jax.ShapeDtypeStruct((b, p_total // 128, 128), jnp.float32)
    scratch = [pltpu.VMEM((S, h, wpad), jnp.bfloat16)]
    if lo:
        scratch.append(pltpu.VMEM((S, h, wpad), jnp.bfloat16))
    scratch.append(pltpu.SemaphoreType.DMA((2,)))

    kern = functools.partial(
        _kernel_entry, n_vol=len(vols), n_out=n_out,
        d=d, h=h, w=w, pblk=pblk, yw=yw, lo=lo,
        with_taps=with_taps)
    blocks = lambda v: v.reshape(b, p_total // 128, 128)
    outs = pl.pallas_call(
        kern,
        out_shape=shp if n_out == 1 else (shp,) * n_out,
        grid=(b, d // ZB, nblk),
        in_specs=[vol_spec] * len(vols) + [vec_spec] * 3,
        out_specs=vec_spec if n_out == 1 else (vec_spec,) * n_out,
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * (2 if lo else 1) * b * p_total * ZW * yw * wpad,
            bytes_accessed=2 * (2 if lo else 1) * b * d * h * wpad
            + 4 * b * (3 + n_out) * p_total,
            transcendentals=0,
        ),
        interpret=_INTERPRET,
    )(*vols, blocks(px), blocks(py), blocks(pz))
    if n_out == 1:
        return outs.reshape(b, p_total)
    return tuple(o.reshape(b, p_total) for o in outs)


def _guard3(py, pz, d, h, w):
    """Traced scalar: every position block's row taps fit its windows.

    Mirrors the kernel's neutralization and window-start arithmetic. Only
    VALID taps constrain the windows: a tap at -1 or at size has zero
    weight, so each position's highest valid row is min(t0+1, size-1) and
    its lowest is max(t0, 0). Per block: (a) all valid z rows lie inside
    the chunk's S-slice slab; (b) they fit the ZW fine window whose start
    is clip(min,0)-derived; (c) the valid y rows fit the YW window with
    the 16-alignment margin (top <= max(min,0) + YW - 16, the 3-D
    analogue of the 2-D kernel's BAND - 9 for its 8-aligned fp32 band)."""
    bsz, p_total = pz.shape
    pblk, yw = _geometry(h, w)
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, p_total), 1)
    outz = pos // (h * w)
    outy = (pos // w) % h
    y0 = jnp.floor(py).astype(jnp.int32)
    z0 = jnp.floor(pz).astype(jnp.int32)
    y0e = jnp.where((y0 < -1) | (y0 > h - 1), outy, y0)
    z0e = jnp.where((z0 < -1) | (z0 > d - 1), outz, z0)
    zbase = jnp.clip((outz // ZB - 1) * ZB, 0, d - S)

    def blk(v):
        return v.reshape(bsz, p_total // pblk, pblk)

    zrel = blk(z0e - zbase)
    ztop = blk(jnp.minimum(z0e + 1, d - 1) - zbase)
    zmin = jnp.min(zrel, axis=-1)
    zmax = jnp.max(zrel, axis=-1)
    zt = jnp.max(ztop, axis=-1)
    ymin = jnp.min(blk(y0e), axis=-1)
    yt = jnp.max(blk(jnp.minimum(y0e + 1, h - 1)), axis=-1)
    ok = (
        (zmin >= -1) & (zmax <= S - 1) & (zt <= S - 1)
        & (zt - jnp.maximum(zmin, 0) <= ZW - 1)
        & (yt - jnp.maximum(ymin, 0) <= yw - 16)
    )
    return jnp.all(ok)


def _gather_taps(vol, px, py, pz, with_taps: bool):
    """8-tap trilinear gather over flat positions — the oracle/fallback.

    Shares the masked-value formulation with the kernel: each corner's
    gathered value is zeroed when out of bounds, so the weight factors and
    their derivatives need no separate masks.
    """
    b, d, h, w = vol.shape
    f32 = jnp.float32
    px, py, pz = (v.astype(f32) for v in (px, py, pz))
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    z0 = jnp.floor(pz)
    fx, fy, fz = px - x0, py - y0, pz - z0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    z0i = z0.astype(jnp.int32)
    flat = vol.reshape(b, d * h * w).astype(f32)

    def tapval(dz, dy, dx):
        xi, yi, zi = x0i + dx, y0i + dy, z0i + dz
        inb = (_bounds(xi, 0, w - 1) & _bounds(yi, 0, h - 1)
               & _bounds(zi, 0, d - 1))
        idx = ((jnp.clip(zi, 0, d - 1) * h + jnp.clip(yi, 0, h - 1)) * w
               + jnp.clip(xi, 0, w - 1))
        return jnp.take_along_axis(flat, idx, axis=1) * inb.astype(f32)

    out = jnp.zeros_like(px)
    dpx = jnp.zeros_like(px)
    dpy = jnp.zeros_like(px)
    dpz = jnp.zeros_like(px)
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                g = tapval(dz, dy, dx)
                cx = fx if dx else 1.0 - fx
                cy = fy if dy else 1.0 - fy
                cz = fz if dz else 1.0 - fz
                out = out + g * cx * cy * cz
                if with_taps:
                    sx = 1.0 if dx else -1.0
                    sy = 1.0 if dy else -1.0
                    sz = 1.0 if dz else -1.0
                    dpx = dpx + g * sx * cy * cz
                    dpy = dpy + g * cx * sy * cz
                    dpz = dpz + g * cx * cy * sz
    if with_taps:
        return out, dpx, dpy, dpz
    return out


def _dispatch(vol, px, py, pz, with_taps: bool):
    guard = _guard3(py, pz, *vol.shape[1:])

    def fast(vol, px, py, pz):
        return _grid_call(vol, px, py, pz, with_taps)

    def slow(vol, px, py, pz):
        return _gather_taps(vol, px, py, pz, with_taps)

    return jax.lax.cond(guard, fast, slow, vol, px, py, pz)


@jax.custom_vjp
def warp3d_pallas(vol, px, py, pz):
    """Trilinear sample of [B, D, H, W] ``vol`` at positions px/py/pz [B, P]
    (flat raster order over (D, H, W)). Zero contribution from
    out-of-bounds taps (matches ops.warp.warp3d). Returns [B, P] fp32.

    Dispatches to the banded Pallas kernel when the traced guard holds
    (registration flows — smooth, displacements ≪ window sizes), else to
    the gather fallback, inside one ``lax.cond``.
    """
    return _dispatch(vol, px, py, pz, with_taps=False)


def _vjp_fwd(vol, px, py, pz):
    out, bx, by, bz = _dispatch(vol, px, py, pz, with_taps=True)
    return out, (vol, px, py, pz, bx, by, bz)


def _vjp_bwd(res, g):
    vol, px, py, pz, bx, by, bz = res
    # d/dvol: transpose of the gather form (scatter-add). DCE'd whenever the
    # volume is a non-differentiated input — the training hot path.
    _, pull = jax.vjp(lambda v: _gather_taps(v, px, py, pz, False), vol)
    dvol = pull(g)[0]
    return (dvol.astype(vol.dtype), (g * bx).astype(px.dtype),
            (g * by).astype(py.dtype), (g * bz).astype(pz.dtype))


warp3d_pallas.defvjp(_vjp_fwd, _vjp_bwd)
