"""Classical SyN-style registration: recovers a known deformation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpureg.classical import apply_flow, register_syn
from tpureg.classical.syn import exp_velocity, gaussian_blur, local_ncc
from tpureg.ops.elastic import rand_elastic_2d


def _phantom(size=64):
    """Smooth synthetic 'brain': nested blobs with distinct intensities."""
    ys, xs = np.mgrid[0:size, 0:size].astype(np.float32)
    cy = cx = size / 2
    r = np.sqrt((ys - cy) ** 2 + (xs - cx) ** 2)
    img = np.zeros((size, size), np.float32)
    img += (r < size * 0.42) * 0.3
    img += (r < size * 0.3) * 0.3
    img += (np.sqrt((ys - cy * 0.8) ** 2 + (xs - cx) ** 2) < size * 0.12) * 0.4
    return img[None, ..., None]


def test_gaussian_blur_preserves_mean(rng):
    x = jnp.asarray(rng.random((1, 32, 32, 2)).astype(np.float32))
    y = gaussian_blur(x, 2.0)
    np.testing.assert_allclose(float(y.mean()), float(x.mean()), rtol=1e-3)
    assert float(jnp.var(y)) < float(jnp.var(x))


def test_exp_velocity_zero_is_identity():
    v = jnp.zeros((1, 16, 16, 2))
    np.testing.assert_allclose(np.asarray(exp_velocity(v)), 0.0, atol=0)


def test_exp_velocity_small_field_near_linear():
    v = jnp.full((1, 32, 32, 2), 0.01)
    flow = exp_velocity(v)
    np.testing.assert_allclose(np.asarray(flow)[0, 8:-8, 8:-8], 0.01,
                               rtol=0.05)


def test_register_recovers_elastic_deformation():
    fixed = jnp.asarray(_phantom(64))
    key = jax.random.key(3)
    moving, _ = rand_elastic_2d(key, fixed, magnitude_range=(0.8, 0.8),
                                spacing=(16, 16))
    before = float(local_ncc(fixed, moving, sigma=4.0))
    flow, warped = register_syn(fixed, moving, reg_iterations=(50, 50, 50))
    after = float(local_ncc(fixed, warped, sigma=4.0))
    assert after > before + 0.05, (before, after)
    mse_before = float(jnp.mean((fixed - moving) ** 2))
    mse_after = float(jnp.mean((fixed - warped) ** 2))
    assert mse_after < mse_before * 0.2


def test_apply_flow_nearest_preserves_labels(rng):
    seg = jnp.asarray(
        rng.integers(0, 4, (1, 32, 32, 1)).astype(np.float32)
    )
    flow = jnp.asarray(rng.standard_normal((1, 32, 32, 2)).astype(np.float32))
    out = np.asarray(apply_flow(seg, flow, mode="nearest"))
    assert set(np.unique(out)) <= {0.0, 1.0, 2.0, 3.0}


def test_jacobian_metrics():
    from tpureg.metrics import (
        jacobian_determinant,
        log_jacobian_std,
        neg_jacobian_fraction,
    )

    # identity flow → J = 1 everywhere
    flow = np.zeros((16, 16, 2), np.float32)
    np.testing.assert_allclose(jacobian_determinant(flow), 1.0, atol=0)
    assert neg_jacobian_fraction(flow) == 0.0
    assert log_jacobian_std(flow) == pytest.approx(0.0, abs=1e-9)
    # uniform contraction u = -0.5x → J = 0.5 in x
    xs = np.arange(16, dtype=np.float32)
    flow[..., 0] = -0.5 * xs[None, :]
    j = jacobian_determinant(flow)
    np.testing.assert_allclose(j[:, :-1], 0.5, atol=1e-6)
    # folding: u_x = -2x → 1 + du/dx = -1 < 0
    flow[..., 0] = -2.0 * xs[None, :]
    assert neg_jacobian_fraction(flow) > 0.9
    # 3-D identity
    f3 = np.zeros((4, 6, 8, 3), np.float32)
    np.testing.assert_allclose(jacobian_determinant(f3), 1.0, atol=0)


def test_register_syn3d_recovers_shift():
    from tpureg.classical import register_syn3d
    from tpureg.classical.syn3d import local_ncc3d
    from tpureg.ops.warp import warp3d

    size = 24
    zz, yy, xx = np.mgrid[0:size, 0:size, 0:size].astype(np.float32)
    c = size / 2
    r = np.sqrt((zz - c) ** 2 + (yy - c) ** 2 + (xx - c) ** 2)
    fixed = ((r < size * 0.35) * 0.5 + (r < size * 0.2) * 0.5).astype(
        np.float32
    )[None, ..., None]
    # moving = fixed shifted by 2 voxels in x
    shift = np.zeros((1, size, size, size, 3), np.float32)
    shift[..., 0] = 2.0
    moving = np.asarray(warp3d(jnp.asarray(fixed), jnp.asarray(shift)))

    before = float(jnp.mean((jnp.asarray(fixed) - jnp.asarray(moving)) ** 2))
    flow, warped = register_syn3d(
        jnp.asarray(fixed), jnp.asarray(moving),
        reg_iterations=(20, 20), sigma_metric=3.0,
    )
    after = float(jnp.mean((jnp.asarray(fixed) - warped) ** 2))
    assert after < before * 0.5, (before, after)
