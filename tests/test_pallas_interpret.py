"""In-CI numerical coverage of the Pallas kernels (interpret mode, CPU).

Round 1 validated the compiled kernels only by manual hardware scripts
(tools/check_pallas_tpu.py / check_warp_tpu.py); a kernel regression would
sail through the CPU suite. These tests run every kernel body under the
Pallas interpreter at tiny-but-tile-shaped sizes against the jnp oracles
(correlation_reference, sample2d_gather), in the default suite — no
TPUREG_RUN_SLOW gate (VERDICT r1 item 3).

Semantics anchors: correlation config flownet2/networks/FlowNetC.py:28-31;
warp = Resample2d / grid_sample zeros-padding (flownet2/models.py:139).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpureg.ops import correlation_pallas as cp
from tpureg.ops import warp_pallas as wp
from tpureg.ops.correlation import correlation_reference
from tpureg.ops.warp import sample2d_gather

KEY = jax.random.key(7)


def _feats(b=1, h=8, w=128, c=8, n=2):
    keys = jax.random.split(KEY, n)
    return [jax.random.normal(k, (b, h, w, c), jnp.float32) for k in keys]


# ---------------------------------------------------------------------------
# correlation forward

@pytest.mark.parametrize("md,s2", [(2, 1), (4, 2)])
def test_corr_forward_interpret(md, s2):
    f1, f2 = _feats()
    got = cp._corr_fwd_pallas(f1, f2, md, s2, interpret=True)
    want = correlation_reference(f1, f2, md, s2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("md,s2", [(2, 1), (4, 2)])
@pytest.mark.parametrize("c", [8, 160], ids=["1slab", "multislab"])
def test_corr_forward_banded_interpret(md, s2, c):
    """Banded-MXU forward (bf16 operands, channel-first out) matches the
    bf16 reference at bf16 rounding tolerance."""
    f1, f2 = (x.astype(jnp.bfloat16) for x in _feats(c=c))
    got = cp._corr_fwd_banded(f1, f2, md, s2, interpret=True)
    assert got.dtype == jnp.bfloat16
    want = correlation_reference(f1.astype(jnp.float32),
                                 f2.astype(jnp.float32), md, s2)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), atol=3e-2, rtol=2e-2)


def test_corr_forward_dispatch_banded():
    """bf16 operands route through the banded forward; f32 keeps VPU."""
    f1, f2 = _feats()
    assert cp._fwd_banded_fits_vmem(f1.shape, 2, 1)
    got16 = cp._corr_fwd_pallas(f1.astype(jnp.bfloat16),
                                f2.astype(jnp.bfloat16), 2, 1,
                                interpret=True)
    want = cp._corr_fwd_pallas(f1, f2, 2, 1, interpret=True)
    np.testing.assert_allclose(np.asarray(got16, np.float32),
                               np.asarray(want), atol=3e-2, rtol=2e-2)


def test_force_vpu_bf16():
    """bf16 operands through the VPU tap-sweep kernel (the over-VMEM /
    kill-switch fallback of the banded forward) stay numerically sane."""
    f1, f2 = (x.astype(jnp.bfloat16) for x in _feats())
    got = cp._corr_fwd_pallas(f1, f2, 2, 1, interpret=True, force_vpu=True)
    assert got.dtype == jnp.bfloat16
    want = correlation_reference(f1.astype(jnp.float32),
                                 f2.astype(jnp.float32), 2, 1)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), atol=3e-2, rtol=2e-2)


def test_corr_forward_dispatch_mixed_dtype_falls_back_to_vpu(monkeypatch):
    """Mixed operands (f1 bf16, f2 f32) must NOT enter the bf16-only banded
    kernel — they take the VPU path (which upcasts internally)."""
    f1, f2 = _feats()
    called = {}
    orig = cp._corr_fwd_banded

    def spy(*a, **k):
        called["banded"] = True
        return orig(*a, **k)

    monkeypatch.setattr(cp, "_corr_fwd_banded", spy)
    got = cp._corr_fwd_pallas(f1.astype(jnp.bfloat16), f2, 2, 1,
                              interpret=True)
    assert "banded" not in called
    want = correlation_reference(f1, f2, 2, 1)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), atol=3e-2, rtol=2e-2)


# ---------------------------------------------------------------------------
# correlation backward — fused kernel and split df1/df2 kernels

def _ref_grads(f1, f2, g, md, s2):
    _, vjp = jax.vjp(lambda a, b: correlation_reference(a, b, md, s2), f1, f2)
    return vjp(g)


@pytest.mark.parametrize("force_split", [False, True],
                         ids=["fused", "split"])
@pytest.mark.parametrize("md,s2", [(2, 1), (4, 2)])
def test_corr_backward_interpret(md, s2, force_split):
    f1, f2 = _feats()
    k = 2 * (md // s2) + 1
    g = jax.random.normal(jax.random.key(3),
                          (*f1.shape[:3], k * k), jnp.float32)
    df1, df2 = cp._corr_bwd_pallas(f1, f2, g, md, s2, interpret=True,
                                   force_split=force_split)
    rdf1, rdf2 = _ref_grads(f1, f2, g, md, s2)
    np.testing.assert_allclose(np.asarray(df1), np.asarray(rdf1),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(df2), np.asarray(rdf2),
                               atol=1e-5, rtol=1e-5)


def test_corr_backward_interpret_multislab():
    """C > 128 exercises the channel-slab grid axis (n_cblk > 1)."""
    f1, f2 = _feats(c=160)
    md, s2 = 2, 1
    g = jax.random.normal(jax.random.key(4), (*f1.shape[:3], 25), jnp.float32)
    df1, df2 = cp._corr_bwd_pallas(f1, f2, g, md, s2, interpret=True)
    rdf1, rdf2 = _ref_grads(f1, f2, g, md, s2)
    np.testing.assert_allclose(np.asarray(df1), np.asarray(rdf1),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(df2), np.asarray(rdf2),
                               atol=1e-5, rtol=1e-5)


# ---------------------------------------------------------------------------
# warp kernels

H, W = 8, 128
P = wp.PBLK  # one position block


def _positions(b=1, p=P, scale=1.3, key=11):
    """Positions spanning in-bounds and out-of-bounds (zeros-padding) taps."""
    k1, k2 = jax.random.split(jax.random.key(key))
    px = jax.random.uniform(k1, (b, p), minval=-2.0, maxval=(W - 1) * scale)
    py = jax.random.uniform(k2, (b, p), minval=-2.0, maxval=(H - 1) * scale)
    return px, py


def _gather_oracle(img2d, px, py):
    b, p = px.shape
    out = sample2d_gather(img2d[..., None], px.reshape(b, 1, p),
                          py.reshape(b, 1, p))
    return out.reshape(b, p)


@pytest.fixture(autouse=True)
def _interpret_warp(monkeypatch):
    monkeypatch.setattr(wp, "_INTERPRET", True)


def test_warp_forward_interpret():
    img = jax.random.normal(jax.random.key(1), (2, H, W), jnp.float32)
    px, py = _positions(b=2)
    got = wp._fwd(img, px, py)
    want = _gather_oracle(img, px, py)
    # hi/lo-split rounding: ≤1.5e-5 vs gather (hardware check tolerance)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


def test_warp_forward_interpret_bf16_fast_path():
    """bf16 images statically skip the lo-residual matmuls — exact."""
    img = jax.random.normal(jax.random.key(2), (1, H, W)).astype(jnp.bfloat16)
    px, py = _positions()
    got = wp._fwd(img, px, py)
    want = _gather_oracle(img.astype(jnp.float32), px, py)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-6, rtol=1e-5)


def test_warp_taps_kernel_interpret():
    """_fwd_taps_kernel: forward + the analytic d/dposition bases match the
    gather warp's autodiff (the backward is g × base elementwise)."""
    img = jax.random.normal(jax.random.key(5), (1, H, W), jnp.float32)
    px, py = _positions(key=13)
    out, dpx_base, dpy_base = wp._fwd_with_taps(img, px, py)
    want, vjp = jax.vjp(lambda a, b: _gather_oracle(img, a, b), px, py)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=2e-5, rtol=1e-5)
    g = jax.random.normal(jax.random.key(6), out.shape, jnp.float32)
    rdpx, rdpy = vjp(g)
    np.testing.assert_allclose(np.asarray(g * dpx_base), np.asarray(rdpx),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g * dpy_base), np.asarray(rdpy),
                               atol=1e-4, rtol=1e-4)


def test_warp_dimg_kernel_interpret():
    """_dimg_kernel (transposed one-hot matmul) vs gather-warp autodiff.

    The image cotangent is bf16-precision by design (images are
    non-differentiated leaves in the reference's training; ROUND1_NOTES) —
    tolerance reflects that."""
    img = jax.random.normal(jax.random.key(8), (1, H, W), jnp.float32)
    px, py = _positions(key=17)
    out, vjp = jax.vjp(lambda im: _gather_oracle(im, px, py), img)
    g = jax.random.normal(jax.random.key(9), out.shape, jnp.float32)
    (rdimg,) = vjp(g)

    _, res = wp._vjp_fwd(img, px, py)
    dimg, _, _ = wp._vjp_bwd(res, g)
    np.testing.assert_allclose(np.asarray(dimg), np.asarray(rdimg),
                               atol=5e-2, rtol=5e-2)


def test_warp_full_vjp_interpret():
    """End-to-end custom_vjp: grad of a scalar loss through warp2d_pallas
    w.r.t. positions matches the gather path."""
    img = jax.random.normal(jax.random.key(10), (1, H, W), jnp.float32)
    px, py = _positions(key=19)

    def loss_pallas(a, b):
        return jnp.sum(jnp.sin(wp.warp2d_pallas(img, a, b)))

    def loss_ref(a, b):
        return jnp.sum(jnp.sin(_gather_oracle(img, a, b)))

    gp = jax.grad(loss_pallas, argnums=(0, 1))(px, py)
    gr = jax.grad(loss_ref, argnums=(0, 1))(px, py)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_warp_tall_image_interpret():
    """Taller-than-wide image (H > lane tile) through the transposed
    kernels: one tight block clipping past the bottom edge, one block
    spread across the whole height — exercises the sublane-axis reductions
    and clip handling at production-like aspect ratios."""
    hb = 144
    img = jax.random.normal(jax.random.key(21), (1, hb, W), jnp.float32)
    k1, k2 = jax.random.split(jax.random.key(23))
    px = jax.random.uniform(k1, (1, 2 * P), minval=-2.0, maxval=(W - 1) * 1.3)
    # block 0: tight band near the bottom edge (banded branch, clipping);
    # block 1: spread across the whole height (fallback branch)
    py_tight = jax.random.uniform(k2, (1, P), minval=hb - 30.0, maxval=hb + 2.0)
    py_wide = jax.random.uniform(k2, (1, P), minval=-2.0, maxval=hb * 1.2)
    py = jnp.concatenate([py_tight, py_wide], axis=1)
    got = wp._fwd(img, px, py)
    want = _gather_oracle(img, px, py)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)
    # taps kernel under banding: forward + d/dposition bases
    out, dpx_base, dpy_base = wp._fwd_with_taps(img, px, py)
    want2, vjp = jax.vjp(lambda a, b: _gather_oracle(img, a, b), px, py)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want2),
                               atol=2e-5, rtol=1e-5)
    g = jax.random.normal(jax.random.key(24), out.shape, jnp.float32)
    rdpx, rdpy = vjp(g)
    np.testing.assert_allclose(np.asarray(g * dpx_base), np.asarray(rdpx),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g * dpy_base), np.asarray(rdpy),
                               atol=1e-4, rtol=1e-4)


def test_corr_backward_banded_interpret():
    """Banded-MXU backward variant matches the reference VJP (cascade-style
    s2=2 config at tiny shape)."""
    f1, f2 = _feats()
    md, s2 = 4, 2
    k = 2 * (md // s2) + 1
    g = jax.random.normal(jax.random.key(21),
                          (*f1.shape[:3], k * k), jnp.float32)
    df1, df2 = cp._corr_bwd_banded(f1, f2, g, md, s2, interpret=True)
    rdf1, rdf2 = _ref_grads(f1, f2, g, md, s2)
    np.testing.assert_allclose(np.asarray(df1), np.asarray(rdf1),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(df2), np.asarray(rdf2),
                               atol=1e-5, rtol=1e-5)


def _raster_positions(h_img, w, flow_scale, key=31, b=1, n_rows=None):
    """Raster-grid positions + bounded random flow — the warp wrapper's
    layout, where each PBLK position block covers contiguous output rows
    (the precondition for the banded row window). ``n_rows=h_img`` sweeps
    every window start: clamped-at-0, mid-image, clamped-at-(H-BAND)."""
    if n_rows is None:
        n_rows = 2 * wp.PBLK // w  # two position blocks
    yy, xx = jnp.meshgrid(jnp.arange(n_rows, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    k1, k2 = jax.random.split(jax.random.key(key))
    p = n_rows * w
    fx = jax.random.uniform(k1, (b, p), minval=-flow_scale, maxval=flow_scale)
    fy = jax.random.uniform(k2, (b, p), minval=-flow_scale, maxval=flow_scale)
    return xx.reshape(1, p) + fx, yy.reshape(1, p) + fy


def test_warp_banded_branch_interpret():
    """h > BAND with registration-scale flows: the banded window kernel is
    the taken cond branch (guard asserted) and matches the gather oracle,
    including zero-weight out-of-bounds taps at the top edge."""
    h_img = wp.BAND + 16
    img = jax.random.normal(jax.random.key(29), (1, h_img, W), jnp.float32)
    px, py = _raster_positions(h_img, W, flow_scale=5.0, n_rows=h_img)
    assert wp._band_ok(h_img, W, px.shape[1])
    assert bool(wp._band_guard(py, h_img, W))  # banded branch taken
    got = wp._fwd(img, px, py)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(_gather_oracle(img, px, py)),
                               atol=2e-5, rtol=1e-5)

    out, dpx_base, dpy_base = wp._fwd_with_taps(img, px, py)
    want, vjp = jax.vjp(lambda a, b: _gather_oracle(img, a, b), px, py)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=2e-5, rtol=1e-5)
    g = jax.random.normal(jax.random.key(30), out.shape, jnp.float32)
    rdpx, rdpy = vjp(g)
    np.testing.assert_allclose(np.asarray(g * dpx_base), np.asarray(rdpx),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g * dpy_base), np.asarray(rdpy),
                               atol=1e-4, rtol=1e-4)


def test_warp_banded_bf16_branch_interpret():
    """bf16 image through the banded window (lo-residual statically
    dropped) stays exact vs the fp32 gather oracle."""
    h_img = wp.BAND + 16
    img = jax.random.normal(
        jax.random.key(33), (1, h_img, W)).astype(jnp.bfloat16)
    px, py = _raster_positions(h_img, W, flow_scale=3.0, key=35)
    assert bool(wp._band_guard(py, h_img, W))
    got = wp._fwd(img, px, py)
    want = _gather_oracle(img.astype(jnp.float32), px, py)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-6, rtol=1e-5)


def test_warp_banded_guard_rejects_big_flow():
    """Flows larger than the window margin flip the guard off and the
    full-H fallback still produces oracle-exact output."""
    h_img = wp.BAND + 16
    img = jax.random.normal(jax.random.key(37), (1, h_img, W), jnp.float32)
    px, py = _raster_positions(h_img, W, flow_scale=float(h_img), key=39)
    assert not bool(wp._band_guard(py, h_img, W))
    got = wp._fwd(img, px, py)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(_gather_oracle(img, px, py)),
                               atol=2e-5, rtol=1e-5)


# ---------------------------------------------------------------------------
# 3-D trilinear warp kernel (warp3d_pallas)

from tpureg.ops import warp3d_pallas as wp3  # noqa: E402
from tpureg.ops.warp import sample3d_gather  # noqa: E402

D3, H3, W3 = 24, 64, 64  # smallest supported geometry (D == S)


@pytest.fixture(autouse=True)
def _interpret_warp3d(monkeypatch):
    monkeypatch.setattr(wp3, "_INTERPRET", True)


def _vol_positions(key=0, amp=1.7, wavelen=4.0):
    """Volume + smooth sinusoidal positions (identity + bounded smooth
    displacement — the registration-flow regime the banded windows target),
    with extra out-of-bounds pushes at every face to exercise the partial-
    and fully-OOB tap handling."""
    vol = jax.random.normal(jax.random.key(key), (1, D3, H3, W3), jnp.float32)
    zz, yy, xx = jnp.meshgrid(jnp.arange(D3), jnp.arange(H3),
                              jnp.arange(W3), indexing="ij")

    def disp(phase):
        arg = xx / (wavelen * W3) + yy / (wavelen * H3) + zz / (wavelen * D3)
        return amp * jnp.sin(2 * jnp.pi * arg + phase)

    p = D3 * H3 * W3
    px = (xx + disp(0.1)).reshape(1, p).astype(jnp.float32)
    py = (yy + disp(1.2)).reshape(1, p).astype(jnp.float32)
    pz = (zz + disp(2.3)).reshape(1, p).astype(jnp.float32)
    xf = xx.reshape(1, p)
    yf = yy.reshape(1, p)
    zf = zz.reshape(1, p)
    px = px + jnp.where(xf < 2, -3.0, 0.0) + jnp.where(xf > W3 - 3, 3.0, 0.0)
    py = py + jnp.where(yf < 2, -3.0, 0.0)
    pz = pz + jnp.where(zf < 2, -3.0, 0.0) + jnp.where(zf > D3 - 3, 3.0, 0.0)
    return vol, px, py, pz


def _oracle3(vol, px, py, pz):
    b = vol.shape[0]
    shp = vol.shape[1:]
    out = sample3d_gather(vol[..., None], px.reshape(b, *shp),
                          py.reshape(b, *shp), pz.reshape(b, *shp))
    return out.reshape(b, -1)


def test_warp3d_forward_and_taps_interpret():
    """Banded kernel forward + analytic d/dposition bases vs the gather
    oracle's autodiff, at smooth flows with OOB pushes at every face."""
    vol, px, py, pz = _vol_positions()
    assert wp3.supported(vol.shape)
    assert bool(wp3._guard3(py, pz, D3, H3, W3))
    got = wp3._grid_call(vol, px, py, pz, with_taps=False)
    want, vjp = jax.vjp(lambda a, b, c: _oracle3(vol, a, b, c), px, py, pz)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=1e-5)
    out, bx, by, bz = wp3._grid_call(vol, px, py, pz, with_taps=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=3e-5, rtol=1e-5)
    g = jax.random.normal(jax.random.key(3), out.shape, jnp.float32)
    rdx, rdy, rdz = vjp(g)
    for base, ref in ((bx, rdx), (by, rdy), (bz, rdz)):
        np.testing.assert_allclose(np.asarray(g * base), np.asarray(ref),
                                   atol=1e-4, rtol=1e-4)


def test_warp3d_bf16_fast_path_interpret():
    """bf16 volumes statically skip the lo slab (half the DMA + MXU) and
    stay exact vs the fp32 gather of the same bf16 values."""
    vol, px, py, pz = _vol_positions(key=4)
    vol16 = vol.astype(jnp.bfloat16)
    got = wp3._grid_call(vol16, px, py, pz, with_taps=False)
    want = _oracle3(vol16.astype(jnp.float32), px, py, pz)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-6, rtol=1e-5)


def test_warp3d_guard_fallback_interpret():
    """Flows too spread for the fine windows flip the traced guard and the
    lax.cond dispatch returns the gather branch (float-ordering-level
    agreement with the oracle — the branch factors the tap weights
    differently)."""
    vol, px, py, pz = _vol_positions(amp=6.0, wavelen=0.5)
    assert not bool(wp3._guard3(py, pz, D3, H3, W3))
    got = wp3.warp3d_pallas(vol, px, py, pz)
    want = _oracle3(vol, px, py, pz)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-6, rtol=1e-6)


def test_warp3d_full_vjp_interpret():
    """End-to-end custom_vjp through warp3d_pallas: position grads via the
    taps bases, volume grad via the XLA scatter transpose."""
    vol, px, py, pz = _vol_positions(key=7)

    def loss_pallas(v, a, b, c):
        return jnp.sum(jnp.sin(wp3.warp3d_pallas(v, a, b, c)))

    def loss_ref(v, a, b, c):
        return jnp.sum(jnp.sin(_oracle3(v, a, b, c)))

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(vol, px, py, pz)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(vol, px, py, pz)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_warp3d_sample3d_dispatch_cpu_is_gather():
    """On the CPU test backend sample3d stays on the gather path (no
    interpret-mode pallas in production code), bit-identical to the oracle."""
    from tpureg.ops.warp import sample3d

    vol, px, py, pz = _vol_positions(key=9)
    shp = vol.shape[1:]
    got = sample3d(vol[..., None], px.reshape(1, *shp),
                   py.reshape(1, *shp), pz.reshape(1, *shp))
    want = sample3d_gather(vol[..., None], px.reshape(1, *shp),
                           py.reshape(1, *shp), pz.reshape(1, *shp))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=0, rtol=0)
