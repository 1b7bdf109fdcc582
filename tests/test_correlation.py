"""Correlation cost-volume: semantics, golden vs torch unfold, Pallas parity."""

import numpy as np
import pytest

from tpureg.ops import correlation_reference, displacement_count


def _numpy_corr(f1, f2, md, s2):
    """Independent numpy implementation — the semantic oracle.

    Loops over displacements only; per-displacement uses explicit index
    ranges (no padding trick, unlike the jnp implementation under test).
    """
    b, h, w, c = f1.shape
    k = 2 * (md // s2) + 1
    out = np.zeros((b, h, w, k * k), np.float32)
    for iy in range(k):
        for ix in range(k):
            dy, dx = iy * s2 - md, ix * s2 - md
            y0, y1 = max(0, -dy), min(h, h - dy)
            x0, x1 = max(0, -dx), min(w, w - dx)
            if y0 >= y1 or x0 >= x1:
                continue
            prod = (
                f1[:, y0:y1, x0:x1, :] * f2[:, y0 + dy : y1 + dy, x0 + dx : x1 + dx, :]
            ).sum(-1)
            out[:, y0:y1, x0:x1, iy * k + ix] = prod / c
    return out


@pytest.mark.parametrize("md,s2", [(4, 1), (4, 2), (20, 2)])
def test_reference_matches_oracle(rng, md, s2):
    h = w = 8 if md <= 4 else 24
    f1 = rng.standard_normal((2, h, w, 4)).astype(np.float32)
    f2 = rng.standard_normal((2, h, w, 4)).astype(np.float32)
    got = np.asarray(correlation_reference(f1, f2, md, s2))
    want = _numpy_corr(f1, f2, md, s2)
    assert got.shape == (2, h, w, displacement_count(md, s2) ** 2)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_zero_displacement_channel_is_center(rng):
    """d=(0,0) channel equals the plain per-pixel inner product / C."""
    f1 = rng.standard_normal((1, 6, 6, 8)).astype(np.float32)
    f2 = rng.standard_normal((1, 6, 6, 8)).astype(np.float32)
    out = np.asarray(correlation_reference(f1, f2, 4, 2))
    k = displacement_count(4, 2)
    center = out[..., (k // 2) * k + k // 2]
    np.testing.assert_allclose(center, (f1 * f2).sum(-1) / 8, atol=1e-5)


def test_differentiable(rng):
    import jax
    import jax.numpy as jnp

    f1 = jnp.asarray(rng.standard_normal((1, 6, 6, 4)).astype(np.float32))
    f2 = jnp.asarray(rng.standard_normal((1, 6, 6, 4)).astype(np.float32))
    g1, g2 = jax.grad(
        lambda a, b: jnp.sum(correlation_reference(a, b, 2, 1) ** 2), argnums=(0, 1)
    )(f1, f2)
    assert np.isfinite(np.asarray(g1)).all() and np.isfinite(np.asarray(g2)).all()


def test_pallas_interpret_matches_reference(rng):
    """Run the Pallas kernel in interpreter mode on CPU against the reference.

    Formerly gated behind TPUREG_RUN_SLOW (the round-1 suite's one skip) —
    interpret coverage now runs by default here and, comprehensively for
    every kernel incl. backwards, in tests/test_pallas_interpret.py."""
    from tpureg.ops.correlation_pallas import _corr_fwd_pallas

    f1 = rng.standard_normal((2, 8, 8, 16)).astype(np.float32)
    f2 = rng.standard_normal((2, 8, 8, 16)).astype(np.float32)
    got = np.asarray(_corr_fwd_pallas(f1, f2, 4, 2, interpret=True))
    want = np.asarray(correlation_reference(f1, f2, 4, 2))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_channelnorm_grad_finite_at_zero():
    """Regression: sqrt backward at exact-zero pixels must stay finite.

    Exact zeros occur wherever an OOB warp tap meets a zero fixed pixel
    (masked-MRI background); the unguarded d sqrt(sum x^2) = x/||x|| NaN'd
    FlowNet2 training within 3 steps on TPU.
    """
    import jax
    import jax.numpy as jnp

    from tpureg.ops import channelnorm

    x = jnp.zeros((1, 4, 4, 3)).at[0, 0, 0, 0].set(1.0)
    g = jax.grad(lambda v: jnp.sum(channelnorm(v)))(x)
    assert np.isfinite(np.asarray(g)).all()
