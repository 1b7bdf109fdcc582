"""Golden tests: tpureg resize vs torch.nn.functional.interpolate."""

import numpy as np
import pytest

from tpureg.ops import resize2d, resize_nd

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _torch_resize(x_nhwc, size, mode, align_corners):
    t = torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))
    kwargs = {} if mode == "nearest" else {"align_corners": align_corners}
    y = F.interpolate(t, size=size, mode=mode, **kwargs)
    return np.transpose(y.numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize(
    "in_size,out_size",
    [((32, 48), (64, 96)), ((64, 64), (16, 16)), ((17, 31), (23, 57)), ((8, 8), (256, 256))],
)
def test_bilinear_matches_torch(rng, align_corners, in_size, out_size):
    x = rng.standard_normal((2, *in_size, 3)).astype(np.float32)
    got = np.asarray(resize2d(x, out_size, "bilinear", align_corners))
    want = _torch_resize(x, out_size, "bilinear", align_corners)
    np.testing.assert_allclose(got, want, atol=1e-4)


@pytest.mark.parametrize(
    "in_size,out_size", [((32, 32), (64, 64)), ((64, 64), (16, 16)), ((20, 52), (256, 256))]
)
def test_nearest_matches_torch(rng, in_size, out_size):
    x = rng.standard_normal((2, *in_size, 2)).astype(np.float32)
    got = np.asarray(resize2d(x, out_size, "nearest"))
    want = _torch_resize(x, out_size, "nearest", None)
    np.testing.assert_allclose(got, want, atol=0)


def test_identity_passthrough(rng):
    x = rng.standard_normal((1, 16, 16, 1)).astype(np.float32)
    assert resize2d(x, (16, 16)) is x


def test_resize_nd_matches_2d(rng):
    x = rng.standard_normal((2, 16, 24, 3)).astype(np.float32)
    got = np.asarray(resize_nd(x, (32, 48), "linear", align_corners=False))
    want = np.asarray(resize2d(x, (32, 48), "bilinear", align_corners=False))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_resize_nd_3d_matches_torch_trilinear(rng):
    x = rng.standard_normal((1, 8, 10, 12, 2)).astype(np.float32)
    got = np.asarray(resize_nd(x, (16, 20, 24), "linear", align_corners=False))
    t = torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3)))
    want = F.interpolate(t, size=(16, 20, 24), mode="trilinear", align_corners=False)
    want = np.transpose(want.numpy(), (0, 2, 3, 4, 1))
    np.testing.assert_allclose(got, want, atol=1e-4)
