"""Metric suite: invariants + cross-checks against independent formulas."""

import numpy as np
import pytest

from tpureg.metrics import (
    CORR,
    MI,
    MSE,
    PSNR,
    dice_average,
    dice_coefficient,
    dist_hausdorff,
    flow_mag,
    grid_generator,
    seg_trans,
    ssim,
)


def test_mse_psnr(rng):
    a = rng.random((32, 32))
    assert MSE(a, a) == 0.0
    assert PSNR(a, a) == 100.0
    b = a + 0.1
    assert MSE(a, b) == pytest.approx(0.01, rel=1e-6)
    assert PSNR(a, b) == pytest.approx(20.0, rel=1e-6)


def test_corr_bounds(rng):
    a = rng.random((64, 64))
    assert CORR(a, a) == pytest.approx(1.0, abs=1e-12)
    assert CORR(a, 1.0 - a) == pytest.approx(-1.0, abs=1e-12)


def test_mi_properties(rng):
    a = rng.random((64, 64))
    b = rng.random((64, 64))
    self_mi = MI(a, a)
    cross_mi = MI(a, b)
    assert self_mi > cross_mi >= 0.0
    # MI(a,a) equals the entropy of the quantized image
    q = np.rint(a * 1500).astype(int).ravel()
    _, counts = np.unique(q, return_counts=True)
    p = counts / counts.sum()
    assert self_mi == pytest.approx(float(-(p * np.log(p)).sum()), rel=1e-9)


def test_ssim_invariants(rng):
    a = rng.random((64, 64))
    assert ssim(a, a) == pytest.approx(1.0, abs=1e-9)
    noisy = np.clip(a + rng.normal(0, 0.2, a.shape), 0, 1)
    s = ssim(a, noisy)
    assert 0.0 < s < 0.9
    assert ssim(a, noisy) == pytest.approx(ssim(noisy, a), abs=1e-12)


def test_dice(rng):
    seg = rng.integers(0, 4, (64, 64)).astype(float)
    assert dice_average(seg, seg) == pytest.approx(1.0)
    mask = seg_trans(seg, 2)
    assert set(np.unique(mask).tolist()) <= {0.0, 1.0}
    a = np.zeros((8, 8)); a[:4] = 1
    b = np.zeros((8, 8)); b[2:6] = 1
    assert dice_coefficient(a, b) == pytest.approx(0.5)


def test_hausdorff(rng):
    seg = np.zeros((32, 32))
    seg[8:16, 8:16] = 1
    seg[20:28, 4:12] = 2
    seg[2:6, 20:30] = 3
    assert dist_hausdorff(seg, seg) == pytest.approx(0.0)
    shifted = np.roll(seg, 2, axis=0)
    d = dist_hausdorff(seg, shifted)
    assert 0.5 < d <= 4.0  # ~2 px shift


def test_flow_mag(rng):
    flow = rng.standard_normal((1, 32, 32, 2)).astype(np.float32)
    total, img = flow_mag(flow)
    assert img.shape == (1, 3, 32, 32) and img.dtype == np.uint8
    assert total == pytest.approx(
        float(np.sqrt((flow[0] ** 2).sum(-1)).sum()), rel=1e-5
    )


def test_grid_generator():
    g = grid_generator()
    assert g.shape == (256, 256)
    assert g[7, 0] == 1.0 and g[0, 7] == 1.0 and g[0, 0] == 0.0
    assert g.sum() == pytest.approx(
        16 * 256 * 2 - 16 * 16, rel=0.01
    )  # rows + cols - intersections
