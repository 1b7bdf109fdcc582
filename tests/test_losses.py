"""Loss regression tests: numerics locked against reference loss.py formulas.

The torch oracles below re-state the reference's published formulas
(loss.py:9-94) independently; tolerances are tight so any drift in the jnp
implementations fails loudly.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tpureg.losses import (
    Affloss,
    OFEloss,
    charbonnier,
    correlation_loss,
    photometric_loss,
    smoothness_loss,
)

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _t(x_nhwc):  # NHWC → NCHW torch tensor
    return torch.from_numpy(np.moveaxis(x_nhwc, -1, 1))


def _charb_t(x, a=0.25, eps=1e-9):
    return torch.pow(torch.pow(x, 2) + eps**2, a)


def _photo_t(fixed, warped):
    h, w = warped.shape[2:]
    fixed = F.interpolate(fixed, (h, w), mode="bilinear", align_corners=False)
    return (torch.sum(_charb_t(fixed - warped)) / fixed.size(0)).item()


def _smooth_t(flow):
    b, c, h, w = flow.size()
    v = torch.cat((flow[:, :, 1:, :], torch.zeros(b, c, 1, w)), dim=-2)
    hh = torch.cat((flow[:, :, :, 1:], torch.zeros(b, c, h, 1)), dim=-1)
    s = _charb_t(flow - v) + _charb_t(flow - hh)
    return (torch.sum(torch.sum(s, dim=1) / 2) / b).item()


def _corr_t(fixed, warped):
    b = warped.size(0)
    h, w = warped.shape[2:]
    fixed = F.interpolate(fixed, (h, w), mode="bilinear", align_corners=False)
    vx = warped - torch.mean(warped)
    vy = fixed - torch.mean(fixed)
    corr = (
        1 / b * torch.sum(vx * vy)
        / (torch.sqrt(torch.sum(vx**2)) * torch.sqrt(torch.sum(vy**2)))
    )
    return (1.0 - corr).item()


def test_charbonnier_formula(rng):
    x = rng.standard_normal((4, 4)).astype(np.float32)
    got = np.asarray(charbonnier(x))
    want = (x.astype(np.float64) ** 2 + 1e-18) ** 0.25
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_photometric_matches_torch(rng):
    fixed = rng.random((3, 32, 32, 1)).astype(np.float32)
    warped = rng.random((3, 16, 16, 1)).astype(np.float32)
    got = float(photometric_loss(fixed, warped))
    want = _photo_t(_t(fixed), _t(warped))
    assert got == pytest.approx(want, rel=1e-4)


def test_smoothness_matches_torch(rng):
    flow = rng.standard_normal((2, 16, 16, 2)).astype(np.float32)
    got = float(smoothness_loss(flow))
    want = _smooth_t(_t(flow))
    assert got == pytest.approx(want, rel=1e-4)


def test_correlation_matches_torch(rng):
    fixed = rng.random((2, 32, 32, 1)).astype(np.float32)
    warped = rng.random((2, 32, 32, 1)).astype(np.float32)
    got = float(correlation_loss(fixed, warped))
    want = _corr_t(_t(fixed), _t(warped))
    assert got == pytest.approx(want, rel=1e-4)


def test_correlation_constant_input_guard():
    # all-zero warped → vx exactly 0 → reference guard sets corr := 1 → loss 0
    fixed = np.random.rand(2, 8, 8, 1).astype(np.float32)
    warped = np.zeros((2, 8, 8, 1), np.float32)
    assert float(correlation_loss(fixed, warped)) == pytest.approx(0.0, abs=1e-6)


def test_ofe_loss_composition(rng):
    """Total = γ/n Σwᵢpᵢ + ζ/n Σwᵢcᵢ + λ/n Σwᵢsᵢ with wᵢ=0.05(i+1)."""
    fixed = rng.random((2, 32, 32, 1)).astype(np.float32)
    flows = [rng.standard_normal((2, s, s, 2)).astype(np.float32) for s in (32, 16)]
    warpeds = [rng.random((2, s, s, 1)).astype(np.float32) for s in (32, 16)]
    p, c, s, total = OFEloss(flows, warpeds, fixed)
    assert float(total) == pytest.approx(float(p) + float(c) + float(s), rel=1e-6)

    n, w = 2, [0.05, 0.10]
    want_p = 100.0 / n * sum(
        wi * _photo_t(_t(fixed), _t(wp)) for wi, wp in zip(w, warpeds)
    )
    want_s = 0.5 / n * sum(wi * _smooth_t(_t(f)) for wi, f in zip(w, flows))
    want_c = 100.0 / n * sum(
        wi * _corr_t(_t(fixed), _t(wp)) for wi, wp in zip(w, warpeds)
    )
    assert float(p) == pytest.approx(want_p, rel=1e-4)
    assert float(s) == pytest.approx(want_s, rel=1e-4)
    assert float(c) == pytest.approx(want_c, rel=1e-3)


def test_ofe_loss_weight_order_descending(rng):
    """weight_order='descending' reverses the per-scale weights: with 2
    scales, OFEloss(descending) on (a, b) == OFEloss(ascending) on (b, a)
    up to the per-scale resize (same-resolution entries here, so exact).
    Used for RAFT's most-refined-first iteration tuples (losses/ofe.py)."""
    fixed = rng.random((2, 16, 16, 1)).astype(np.float32)
    flows = [rng.standard_normal((2, 16, 16, 2)).astype(np.float32)
             for _ in range(2)]
    warpeds = [rng.random((2, 16, 16, 1)).astype(np.float32)
               for _ in range(2)]
    got = OFEloss(flows, warpeds, fixed, weight_order="descending")
    want = OFEloss(flows[::-1], warpeds[::-1], fixed)
    for g, w in zip(got, want):
        assert float(g) == pytest.approx(float(w), rel=1e-5)
    with pytest.raises(ValueError):
        OFEloss(flows, warpeds, fixed, weight_order="nope")


def test_default_loss_kwargs_families():
    from tpureg.train import default_loss_kwargs

    assert default_loss_kwargs("pwc") == {"num_scales": 2}
    assert default_loss_kwargs("pwc-reg") == {"num_scales": 2}
    # RAFT keeps reference ascending weights: the descending order (RAFT's
    # supervised latest-heaviest convention) measured SLOWER Dice
    # convergence under the self-supervised OFE loss (round-5 hardware A/B,
    # BASELINE.md)
    assert default_loss_kwargs("raft") is None
    assert default_loss_kwargs("raft-reg") is None
    assert default_loss_kwargs("flownet2") is None
    assert default_loss_kwargs("flownets") is None


def test_stn_inverse_target_nonsquare_axis_scaling(rng):
    """x displacement scales by w/W, y by h/H (ADVICE r4 item 3) — at a
    half-width scale of a non-square input the two ratios differ."""
    import jax

    from tpureg.train.steps import stn_inverse_target

    disp = jnp.asarray(rng.standard_normal((1, 32, 64, 2)).astype(np.float32))
    h, w = 16, 16  # h/H = 1/2, w/W = 1/4
    tgt = stn_inverse_target(disp, h, w, 32)
    from tpureg.ops.warp import base_grid

    d = np.asarray(jax.image.resize(disp, (1, h, w, 2), "bilinear"))
    g = np.asarray(base_grid(h, w))[None]
    want_x = -(d[..., 0] * (w / 64)) * (w / (w - 1)) + g[..., 0] / (w - 1)
    want_y = -(d[..., 1] * (h / 32)) * (h / (h - 1)) + g[..., 1] / (h - 1)
    np.testing.assert_allclose(np.asarray(tgt[..., 0]), want_x, atol=1e-5)
    np.testing.assert_allclose(np.asarray(tgt[..., 1]), want_y, atol=1e-5)


def test_flat_adam_matches_optax_adam(rng):
    """flat_adam is element-wise EXACTLY optax.adam: same moments, same
    bias correction, same update — only the execution shape differs (flat
    fp32 buffers + one ravel/unravel). Multi-step, ragged leaf shapes."""
    import jax
    import optax

    from tpureg.train.state import flat_adam

    params = {
        "a": jnp.asarray(rng.standard_normal((3, 5, 7)).astype(np.float32)),
        "b": {"w": jnp.asarray(rng.standard_normal((11,)).astype(np.float32)),
              "k": jnp.asarray(rng.standard_normal((2, 2, 4, 6)).astype(np.float32))},
    }
    lr, eps = 1e-3, 1e-4
    t_flat = flat_adam(lr, eps=eps)
    t_tree = optax.adam(lr, eps=eps)
    s_flat, s_tree = t_flat.init(params), t_tree.init(params)
    p_flat = p_tree = params
    for i in range(4):
        grads = jax.tree.map(
            lambda p: jnp.asarray(
                rng.standard_normal(p.shape).astype(np.float32)), params)
        u_f, s_flat = t_flat.update(grads, s_flat)
        u_t, s_tree = t_tree.update(grads, s_tree)
        p_flat = optax.apply_updates(p_flat, u_f)
        p_tree = optax.apply_updates(p_tree, u_t)
    for lf, lt in zip(jax.tree.leaves(p_flat), jax.tree.leaves(p_tree)):
        np.testing.assert_allclose(np.asarray(lf), np.asarray(lt),
                                   rtol=1e-6, atol=1e-7)


def test_flat_adam_schedule_lr():
    """Callable learning rates follow optax's pre-increment count exactly."""
    import optax

    from tpureg.train.state import flat_adam

    params = {"w": jnp.ones((4,), jnp.float32)}
    sched = lambda count: jnp.where(count < 2, 1e-2, 1e-3)
    t = flat_adam(sched)
    t_ref = optax.adam(sched)
    s, s_ref = t.init(params), t_ref.init(params)
    g = {"w": jnp.full((4,), 0.5, jnp.float32)}
    p, p_ref = params, params
    for _ in range(4):
        u, s = t.update(g, s)
        p = optax.apply_updates(p, u)
        u_r, s_ref = t_ref.update(g, s_ref)
        p_ref = optax.apply_updates(p_ref, u_r)
    np.testing.assert_allclose(np.asarray(p["w"]), np.asarray(p_ref["w"]),
                               rtol=1e-6, atol=1e-8)


def test_ofe_loss_grad_finite(rng):
    import jax
    import jax.numpy as jnp

    fixed = jnp.asarray(rng.random((1, 16, 16, 1)).astype(np.float32))
    flow = jnp.asarray(rng.standard_normal((1, 16, 16, 2)).astype(np.float32))
    warped = jnp.asarray(rng.random((1, 16, 16, 1)).astype(np.float32))

    def f(fl, wp):
        return OFEloss([fl], [wp], fixed)[3]

    g1, g2 = jax.grad(f, argnums=(0, 1))(flow, warped)
    assert np.isfinite(np.asarray(g1)).all() and np.isfinite(np.asarray(g2)).all()


def test_affloss_3d(rng):
    fixed = rng.random((1, 8, 8, 8, 1)).astype(np.float32)
    warped = rng.random((1, 8, 8, 8, 1)).astype(np.float32)
    p, c, total = Affloss(warped, fixed)
    assert float(total) == pytest.approx(float(p) + float(c), rel=1e-6)
    assert 0.0 <= float(c) <= 2.0


def test_smoothness_loss_3d_matches_manual():
    """Volumetric smoothness: charbonnier of zero-padded forward diffs."""
    from tpureg.losses import charbonnier, smoothness_loss_3d

    rng = np.random.default_rng(7)
    flow = rng.standard_normal((2, 3, 4, 5, 3)).astype(np.float32)

    want = 0.0
    for axis in (1, 2, 3):
        shifted = np.zeros_like(flow)
        idx = [slice(None)] * 5
        idx[axis] = slice(1, None)
        src = [slice(None)] * 5
        src[axis] = slice(0, flow.shape[axis] - 1)
        shifted[tuple(src)] = flow[tuple(idx)]
        want = want + np.asarray(charbonnier(jnp.asarray(flow - shifted)))
    want = want.sum(-1) / 3.0
    want = want.sum() / flow.shape[0]

    got = float(smoothness_loss_3d(jnp.asarray(flow)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_defloss3d_components():
    from tpureg.losses import DEFloss3D

    rng = np.random.default_rng(8)
    fixed = jnp.asarray(rng.random((1, 4, 8, 8, 1)), jnp.float32)
    warped = jnp.asarray(rng.random((1, 4, 8, 8, 1)), jnp.float32)
    flow = jnp.asarray(rng.standard_normal((1, 4, 8, 8, 3)), jnp.float32)
    p, c, s, total = DEFloss3D(flow, warped, fixed)
    np.testing.assert_allclose(float(total), float(p + c + s), rtol=1e-6)
    assert float(p) > 0 and float(s) > 0
    # perfect alignment zeroes the Pearson term
    _, c0, _, _ = DEFloss3D(flow, fixed, fixed)
    assert abs(float(c0)) < 1e-5
