"""Golden tests: warp2d conventions vs torch grid_sample reproductions."""

import numpy as np
import pytest

from tpureg.ops import base_grid, warp2d, warp3d

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _stn_torch(frame_nchw, flow_nchw):
    """Reference models.py:256-268 semantics (frame already at flow's size)."""
    b, _, h, w = flow_nchw.shape
    flow = flow_nchw.permute(0, 2, 3, 1)
    xx = torch.arange(w).view(1, -1).repeat(h, 1)
    yy = torch.arange(h).view(-1, 1).repeat(1, w)
    grid = torch.stack([xx, yy], dim=-1).float()[None].repeat(b, 1, 1, 1)
    grid = flow + grid
    factor = torch.tensor([2.0 / w, 2.0 / h]).view(1, 1, 1, 2)
    grid = grid * factor - 1
    return F.grid_sample(frame_nchw, grid, align_corners=True)


def _pwc_warp_torch(x_nchw, flo_nchw):
    """PWC/models/PWCNet.py:143-179 semantics (CPU version)."""
    B, C, H, W = x_nchw.size()
    xx = torch.arange(0, W).view(1, -1).repeat(H, 1)
    yy = torch.arange(0, H).view(-1, 1).repeat(1, W)
    xx = xx.view(1, 1, H, W).repeat(B, 1, 1, 1)
    yy = yy.view(1, 1, H, W).repeat(B, 1, 1, 1)
    grid = torch.cat((xx, yy), 1).float()
    vgrid = grid + flo_nchw
    vgrid[:, 0, :, :] = 2.0 * vgrid[:, 0, :, :].clone() / max(W - 1, 1) - 1.0
    vgrid[:, 1, :, :] = 2.0 * vgrid[:, 1, :, :].clone() / max(H - 1, 1) - 1.0
    vgrid = vgrid.permute(0, 2, 3, 1)
    output = F.grid_sample(x_nchw, vgrid, align_corners=False)
    mask = torch.ones(x_nchw.size())
    mask = F.grid_sample(mask, vgrid, align_corners=False)
    mask[mask < 0.9999] = 0
    mask[mask > 0] = 1
    return output * mask


def _nhwc(t):
    return np.transpose(t.numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize("shape", [(2, 16, 16, 1), (1, 32, 24, 3)])
def test_stn_matches_reference(rng, shape):
    b, h, w, c = shape
    img = rng.standard_normal(shape).astype(np.float32)
    flow = (rng.standard_normal((b, h, w, 2)) * 3).astype(np.float32)
    got = np.asarray(warp2d(img, flow, convention="stn"))
    want = _nhwc(
        _stn_torch(
            torch.from_numpy(np.transpose(img, (0, 3, 1, 2))),
            torch.from_numpy(np.transpose(flow, (0, 3, 1, 2))),
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("shape", [(2, 16, 16, 2), (1, 24, 32, 4)])
def test_pwc_matches_reference(rng, shape):
    b, h, w, c = shape
    img = rng.standard_normal(shape).astype(np.float32)
    flow = (rng.standard_normal((b, h, w, 2)) * 2).astype(np.float32)
    got = np.asarray(warp2d(img, flow, convention="pwc"))
    want = _nhwc(
        _pwc_warp_torch(
            torch.from_numpy(np.transpose(img, (0, 3, 1, 2))),
            torch.from_numpy(np.transpose(flow, (0, 3, 1, 2))),
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_pixel_zero_flow_is_identity(rng):
    img = rng.standard_normal((1, 8, 8, 2)).astype(np.float32)
    flow = np.zeros((1, 8, 8, 2), np.float32)
    np.testing.assert_allclose(np.asarray(warp2d(img, flow, "pixel")), img, atol=0)


def test_pixel_integer_shift(rng):
    img = rng.standard_normal((1, 8, 8, 1)).astype(np.float32)
    flow = np.full((1, 8, 8, 2), 0.0, np.float32)
    flow[..., 0] = 2.0  # sample from x+2
    out = np.asarray(warp2d(img, flow, "pixel"))
    np.testing.assert_allclose(out[0, :, :6, 0], img[0, :, 2:, 0], atol=0)
    np.testing.assert_allclose(out[0, :, 6:, 0], 0.0, atol=0)  # OOB taps → 0


def test_base_grid_values():
    g = np.asarray(base_grid(3, 4))
    assert g.shape == (3, 4, 2)
    np.testing.assert_allclose(g[1, 2], [2.0, 1.0])  # (x, y)


def test_warp3d_identity_and_shift(rng):
    vol = rng.standard_normal((1, 4, 6, 8, 2)).astype(np.float32)
    flow = np.zeros((1, 4, 6, 8, 3), np.float32)
    np.testing.assert_allclose(np.asarray(warp3d(vol, flow)), vol, atol=0)
    flow[..., 2] = 1.0  # z shift
    out = np.asarray(warp3d(vol, flow))
    np.testing.assert_allclose(out[0, :3], vol[0, 1:], atol=0)
    np.testing.assert_allclose(out[0, 3], 0.0, atol=0)


def test_warp2d_differentiable(rng):
    import jax
    import jax.numpy as jnp

    img = jnp.asarray(rng.standard_normal((1, 8, 8, 1)).astype(np.float32))
    flow = jnp.asarray(rng.standard_normal((1, 8, 8, 2)).astype(np.float32))
    g = jax.grad(lambda f: jnp.sum(warp2d(img, f, "stn") ** 2))(flow)
    assert np.isfinite(np.asarray(g)).all()


def test_pallas_warp_gating():
    """supported() admits full-res C=1 warps, rejects the rest (CPU-safe)."""
    from tpureg.ops.warp_pallas import supported

    assert supported((24, 256, 256, 1), 256 * 256)
    assert supported((8, 64, 128, 1), 64 * 128)
    assert not supported((8, 64, 64, 32), 64 * 64)   # multi-channel
    assert not supported((1, 16, 16, 1), 81)          # RAFT lookup grids
    assert not supported((1, 96, 96, 1), 96 * 96)     # W < 128
