"""Space-to-depth packed conv layout (nn/packed.py) vs the fine layout.

Every lowering must compute the identical taps×weights sums as the plain
NHWC conv — the packed kernels are zero-filled rearrangements of the same
parameters — so equivalence is asserted to fp32 accumulation-order noise,
and parameter trees are asserted interchangeable (the packed fusion path
must load unpacked checkpoints bit-for-bit and vice versa).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpureg.nn.layers import ConvBlock, IConvBlock, TorchConvTranspose
from tpureg.nn.packed import (
    PackedConvBlock,
    PackedIConvBlock,
    conv_packed_resident,
    conv_packed_s2,
    pack2,
    unpack2,
)

RNG = np.random.default_rng(7)


def _rand(*shape):
    return jnp.asarray(RNG.standard_normal(shape), jnp.float32)


def test_pack_roundtrip_and_concat_commute():
    x = _rand(2, 8, 12, 5)
    assert jnp.array_equal(unpack2(pack2(x)), x)
    a, b = _rand(2, 8, 8, 3), _rand(2, 8, 8, 4)
    lhs = pack2(jnp.concatenate([a, b], axis=-1))
    rhs = jnp.concatenate([pack2(a), pack2(b)], axis=-1)
    assert jnp.array_equal(lhs, rhs)


def _fine_conv(x, k, stride):
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("cin,cout", [(11, 64), (82, 16), (16, 2), (3, 5)])
def test_conv_packed_resident_matches_fine(cin, cout):
    x = _rand(2, 16, 24, cin)
    k = _rand(3, 3, cin, cout) * 0.2
    got = unpack2(conv_packed_resident(pack2(x), k))
    want = _fine_conv(x, k, 1)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("cin,cout", [(11, 64), (64, 64), (5, 3)])
def test_conv_packed_s2_matches_fine(cin, cout):
    x = _rand(2, 16, 24, cin)
    k = _rand(3, 3, cin, cout) * 0.2
    got = conv_packed_s2(pack2(x), k)
    want = _fine_conv(x, k, 2)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_resident_gradients_match_fine():
    """dw must land on the original [3,3,Cin,Cout] parameter, dx on x."""
    x = _rand(1, 8, 8, 6)
    k = _rand(3, 3, 6, 4) * 0.2
    g_fine = jax.grad(lambda x, k: jnp.sum(_fine_conv(x, k, 1) ** 2),
                      argnums=(0, 1))(x, k)
    g_pack = jax.grad(
        lambda x, k: jnp.sum(unpack2(conv_packed_resident(pack2(x), k)) ** 2),
        argnums=(0, 1))(x, k)
    for a, b in zip(g_fine, g_pack):
        np.testing.assert_allclose(a, b, atol=5e-5, rtol=1e-4)


@pytest.mark.parametrize("use_bn", [True, False])
@pytest.mark.parametrize("train", [True, False])
def test_packed_convblock_matches_convblock(use_bn, train):
    """Same variables → same outputs and same batch_stats updates."""
    x = _rand(3, 16, 16, 11)
    fine = ConvBlock(8, 3, 1, use_bn=use_bn)
    packed = PackedConvBlock(8, 1, use_bn=use_bn)
    variables = fine.init(jax.random.key(0), x, train=False)
    # identical parameter trees — checkpoint interchangeability
    vp = packed.init(jax.random.key(0), pack2(x), train=False)
    assert jax.tree_util.tree_structure(vp) == jax.tree_util.tree_structure(
        variables)
    assert all(
        a.shape == b.shape
        for a, b in zip(jax.tree_util.tree_leaves(vp),
                        jax.tree_util.tree_leaves(variables)))

    kw = dict(mutable=["batch_stats"]) if (use_bn and train) else {}
    yf = fine.apply(variables, x, train=train, **kw)
    yp = packed.apply(variables, pack2(x), train=train, **kw)
    if kw:
        yf, statsf = yf
        yp, statsp = yp
        for a, b in zip(jax.tree_util.tree_leaves(statsf),
                        jax.tree_util.tree_leaves(statsp)):
            np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(unpack2(yp), yf, atol=1e-5, rtol=1e-4)


@pytest.mark.parametrize("train", [True, False])
def test_packed_convblock_s2_matches(train):
    x = _rand(3, 16, 16, 6)
    fine = ConvBlock(8, 3, 2, use_bn=True)
    packed = PackedConvBlock(8, 2, use_bn=True)
    variables = fine.init(jax.random.key(0), x, train=False)
    kw = dict(mutable=["batch_stats"]) if train else {}
    yf = fine.apply(variables, x, train=train, **kw)
    yp = packed.apply(variables, pack2(x), train=train, **kw)
    if kw:
        yf, yp = yf[0], yp[0]
    np.testing.assert_allclose(yp, yf, atol=1e-5, rtol=1e-4)


@pytest.mark.parametrize("train", [True, False])
def test_packed_iconvblock_matches(train):
    x = _rand(2, 16, 16, 10)
    fine = IConvBlock(4, use_bn=True)
    packed = PackedIConvBlock(4, use_bn=True)
    variables = fine.init(jax.random.key(0), x, train=False)
    kw = dict(mutable=["batch_stats"]) if train else {}
    yf = fine.apply(variables, x, train=train, **kw)
    yp = packed.apply(variables, pack2(x), train=train, **kw)
    if kw:
        yf, yp = yf[0], yp[0]
    np.testing.assert_allclose(unpack2(yp), yf, atol=1e-5, rtol=1e-4)


def test_convtranspose_packed_out_matches():
    x = _rand(2, 8, 8, 6)
    m_fine = TorchConvTranspose(4, use_bias=True)
    m_packed = TorchConvTranspose(4, use_bias=True, packed_out=True)
    variables = m_fine.init(jax.random.key(1), x)
    yf = m_fine.apply(variables, x)
    yp = m_packed.apply(variables, x)
    np.testing.assert_allclose(unpack2(yp), yf, atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("use_bn", [True, False])
@pytest.mark.parametrize("train", [True, False])
def test_fusion_packed_matches_unpacked(use_bn, train):
    """Full FlowNetFusion: forced-packed forward == unpacked forward with
    the same variables (the auto gate picks packed only at ≥256²)."""
    from tpureg.models import FlowNetFusion

    x = _rand(2, 32, 32, 11) * 0.5
    fine = FlowNetFusion(use_bn=use_bn, packed=False)
    packed = FlowNetFusion(use_bn=use_bn, packed=True)
    variables = fine.init(jax.random.key(2), x, train=False)
    vp = packed.init(jax.random.key(2), x, train=False)
    assert jax.tree_util.tree_structure(vp) == jax.tree_util.tree_structure(
        variables)

    kw = dict(mutable=["batch_stats"]) if (use_bn and train) else {}
    yf = fine.apply(variables, x, train=train, **kw)
    yp = packed.apply(variables, x, train=train, **kw)
    if kw:
        (yf, statsf), (yp, statsp) = yf, yp
        for a, b in zip(jax.tree_util.tree_leaves(statsf),
                        jax.tree_util.tree_leaves(statsp)):
            np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(yp, yf, atol=5e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# plane glue + packed stems (FlowNet2 cascade path)

from tpureg.ops.planes import (  # noqa: E402
    channelnorm_planes,
    pack_planes,
    resize_plane,
    warp_plane,
)


@pytest.mark.parametrize("k", [3, 5, 7])
def test_conv_packed_s2_larger_kernels(k):
    from tpureg.nn.packed import _s2_padding, packed_kernel_s2

    x = _rand(2, 16, 24, 5)
    kern = _rand(k, k, 5, 8) * 0.1
    p = (k - 1) // 2
    want = jax.lax.conv_general_dilated(
        x, kern, (2, 2), ((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = jax.lax.conv_general_dilated(
        pack2(x), packed_kernel_s2(kern), (1, 1), _s2_padding(k),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("method", ["bilinear", "nearest"])
@pytest.mark.parametrize("size", [(32, 32), (7, 13)])
def test_resize_plane_matches_resize2d(method, size):
    from tpureg.ops.resize import resize2d

    x = _rand(3, 8, 8, 1)
    want = resize2d(x, size, method, align_corners=False)[..., 0]
    got = resize_plane(x[..., 0], size, method, align_corners=False)
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-6)


def test_warp_plane_matches_warp2d_pixel():
    from tpureg.ops.warp import warp2d

    img = _rand(2, 16, 16, 1)
    flow = _rand(2, 16, 16, 2) * 3.0
    want = warp2d(img, flow, convention="pixel")[..., 0]
    got = warp_plane(img[..., 0], flow[..., 0], flow[..., 1])
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_channelnorm_planes_matches():
    from tpureg.ops.channelnorm import channelnorm

    x = _rand(2, 8, 8, 2)
    want = channelnorm(x)[..., 0]
    got = channelnorm_planes([x[..., 0], x[..., 1]])
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-6)


def test_pack_planes_matches_pack2():
    planes = [_rand(2, 8, 8) for _ in range(3)]
    want = pack2(jnp.stack(planes, axis=-1))
    got = pack_planes(planes)
    assert jnp.array_equal(got, want)


@pytest.mark.parametrize("train", [True, False])
def test_flownet2_packed_matches_unpacked(train):
    """The flagship cascade: forced plane/packed glue == NHWC glue with the
    same variables (auto gate engages only at ≥256²)."""
    from tpureg.models import FlowNet2

    x = jnp.asarray(RNG.standard_normal((2, 64, 64, 2)), jnp.float32) * 0.5
    fine = FlowNet2(use_bn=True, packed=False)
    packed = FlowNet2(use_bn=True, packed=True)
    variables = fine.init(jax.random.key(3), x, train=False)
    vp = packed.init(jax.random.key(3), x, train=False)
    assert jax.tree_util.tree_structure(vp) == jax.tree_util.tree_structure(
        variables)

    kw = dict(mutable=["batch_stats"]) if train else {}
    yf = fine.apply(variables, x, train=train, **kw)
    yp = packed.apply(variables, x, train=train, **kw)
    # Tolerance: both paths are JAX but reduce/contract in different orders
    # (plane-matmul resize, phase-split BN stats, packed conv accumulation);
    # through 5 chained subnets with ×div_flow(20) amplification the fp32
    # noise reaches ~1e-4 relative (same mechanism as the torch cascade
    # parity goldens, test_parity_torch.py). Structural bugs give O(1).
    # Variance stats are compared through sqrt(var+eps) — the quantity BN
    # actually uses — because var = E[x²]-E[x]² cancels catastrophically
    # when |mean| >> std, amplifying reorder noise into large *relative*
    # var deltas with negligible effect on the normalization.
    if kw:
        (yf, statsf), (yp, statsp) = yf, yp
        fl = jax.tree_util.tree_leaves_with_path(statsf)
        pl = jax.tree_util.tree_leaves_with_path(statsp)
        for (path, a), (_, b) in zip(fl, pl):
            if "var" in jax.tree_util.keystr(path):
                a = np.sqrt(np.asarray(a) + 1e-5)
                b = np.sqrt(np.asarray(b) + 1e-5)
            # Absolute tolerance: stats live on the normalized-activation
            # scale (var O(1), means near 0); at 64² the deepest levels are
            # 1×1 spatial × batch-2 statistics, so upstream noise shows
            # undamped. 1e-3 abs ≪ any structural error, which is O(1).
            np.testing.assert_allclose(
                a, b, atol=1e-3, rtol=0,
                err_msg=jax.tree_util.keystr(path))
    # Train mode pays the same noise amplification as the torch cascade
    # parity golden (test_parity_torch.py::test_parity_flownet2_cascade:
    # ~50 freshly-normalizing BN layers across 5 chained ×20-amplified
    # subnets, measured max |Δ| ≈ 7e-3 there and here); eval (fixed running
    # stats) stays tight. Structural mismatches are O(1) either way.
    atol = 2e-2 if train else 5e-4
    for a, b in zip(yf, yp):
        np.testing.assert_allclose(b, a, atol=atol, rtol=0)
