"""Model zoo: shape/dtype contracts mirroring the reference __main__ blocks.

Small inputs (64²/128²) keep XLA:CPU compiles tractable; channel widths are
resolution-independent so the contracts carry to 256².
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpureg.models import (
    AffineNet3D,
    FlowNetC,
    FlowNetFusion,
    FlowNetS,
    FlowNetSD,
    FlowNetSFull,
    PWCDCNet,
    RAFT,
    build_predictor,
)

KEY = jax.random.key(0)


def _run(mod, x, train):
    variables = mod.init(KEY, x, train=train)
    kwargs = dict(mutable=["batch_stats"]) if "batch_stats" in variables else {}
    out = mod.apply(variables, x, train=train, **kwargs)
    if kwargs:
        out = out[0]
    return out, variables


def test_flownets_pinard_scales():
    x = jnp.zeros((2, 64, 64, 2))
    out, _ = _run(FlowNetS(), x, train=True)
    assert [o.shape for o in out] == [
        (2, 64, 64, 2), (2, 16, 16, 2), (2, 8, 8, 2),
        (2, 4, 4, 2), (2, 2, 2, 2), (2, 1, 1, 2),
    ]
    out_eval, _ = _run(FlowNetS(), x, train=False)
    assert len(out_eval) == 2  # (flow0, flow2)


def test_flownets_nvidia_6ch():
    x = jnp.zeros((1, 64, 64, 6))
    out, variables = _run(FlowNetS(input_channels=6, style="nvidia"), x, train=True)
    assert len(out) == 5 and out[0].shape == (1, 16, 16, 2)
    n = sum(p.size for p in jax.tree.leaves(variables["params"]))
    # reference count 38,676,504 (flownet2/networks/FlowNetS.py:13) is the
    # bias variant; BN variant trades conv biases (4800) for BN affine (9600)
    assert abs(n - 38_676_504) < 10_000


def test_flownets_full_res():
    out, _ = _run(FlowNetSFull(), jnp.zeros((1, 64, 64, 2)), train=True)
    assert len(out) == 7 and out[0].shape == (1, 64, 64, 2)


def test_flownet_sd():
    out, _ = _run(FlowNetSD(), jnp.zeros((1, 64, 64, 2)), train=True)
    assert len(out) == 5 and out[0].shape == (1, 16, 16, 2)


def test_flownet_fusion_full_res():
    out, _ = _run(FlowNetFusion(), jnp.zeros((1, 64, 64, 9)), train=True)
    assert out.shape == (1, 64, 64, 2)


def test_flownet_c():
    x = jnp.zeros((1, 128, 128, 2))
    out, variables = _run(FlowNetC(), x, train=True)
    assert len(out) == 5 and out[0].shape == (1, 32, 32, 2)
    n = sum(p.size for p in jax.tree.leaves(variables["params"]))
    assert abs(n - 39_175_298) < 10_000  # flownet2/networks/FlowNetC.py:11


def test_pwc_seven_flows():
    out, _ = _run(PWCDCNet(), jnp.zeros((1, 64, 64, 2)), train=False)
    assert len(out) == 7
    assert out[0].shape == (1, 64, 64, 2)  # flow0 at full res
    assert out[2].shape == (1, 16, 16, 2)  # flow2 at 1/4


def test_pwc_reg_variant():
    """pwc-reg: same 7-flow contract; bilinear-init flow upsamplers start
    as exact 2×-value 2× upsampling (value-consistent for px-at-resolution
    flows); the decoder consumes warped moving features."""
    mod = build_predictor("pwc-reg")
    assert mod.feed_warped and mod.flow_up_init == "bilinear"
    out, variables = _run(mod, jnp.zeros((1, 64, 64, 2)), train=False)
    assert len(out) == 7
    assert out[0].shape == (1, 64, 64, 2)
    # deconv1 init = gain-2 bilinear tent, identity over channels
    k = variables["params"]["deconv1"]["kernel"]
    f = np.asarray([0.25, 0.75, 0.75, 0.25]) * np.sqrt(2.0)
    np.testing.assert_allclose(np.asarray(k[:, :, 0, 0]),
                               np.outer(f, f), atol=1e-6)
    np.testing.assert_allclose(np.asarray(k[:, :, 0, 1]), 0.0, atol=0)
    # pwc-reg has wider dense-conv inputs than reference pwc
    ref = build_predictor("pwc")
    _, ref_vars = _run(ref, jnp.zeros((1, 64, 64, 2)), train=False)
    w_reg = variables["params"]["conv2_0"]["conv"]["kernel"].shape[2]
    w_ref = ref_vars["params"]["conv2_0"]["conv"]["kernel"].shape[2]
    assert w_reg == w_ref + 32  # + level-2 warped features


def test_raft_iterative():
    out, _ = _run(RAFT(iters=3), jnp.zeros((1, 64, 64, 2)), train=False)
    assert len(out) == 3
    assert all(o.shape == (1, 64, 64, 2) for o in out)


def test_raft_reg_variant():
    """raft-reg: same 5-iteration full-res contract; motion encoder widened
    by the warped-moving + fixed feature streams."""
    mod = build_predictor("raft-reg")
    assert mod.feed_warped
    out, variables = _run(mod, jnp.zeros((1, 64, 64, 2)), train=False)
    assert len(out) == 5
    assert all(o.shape == (1, 64, 64, 2) for o in out)
    ref = build_predictor("raft")
    _, ref_vars = _run(ref, jnp.zeros((1, 64, 64, 2)), train=False)
    w_reg = variables["params"]["menc1"]["kernel"].shape[2]
    w_ref = ref_vars["params"]["menc1"]["kernel"].shape[2]
    assert w_reg == w_ref + 256  # + warped f2 (128) + f1 (128)


def test_affine3d_identity_at_init():
    x = jnp.broadcast_to(
        jnp.arange(16 * 32 * 32, dtype=jnp.float32).reshape(1, 16, 32, 32, 1)
        / (16 * 32 * 32),
        (1, 16, 32, 32, 2),
    )
    mod = AffineNet3D()
    variables = mod.init(KEY, x)
    theta, warped = mod.apply(variables, x)
    assert theta.shape == (1, 3, 4)
    # identity-initialized head → warp is a no-op at init
    np.testing.assert_allclose(
        np.asarray(warped), np.asarray(x[..., 1:2]), atol=1e-5
    )


@pytest.mark.parametrize(
    "name,cls",
    [("flownets", FlowNetS), ("pwc", PWCDCNet), ("raft", RAFT)],
)
def test_registry_dispatch(name, cls):
    assert isinstance(build_predictor(name), cls)


def test_registry_flownet2_is_cascade():
    from tpureg.models import FlowNet2

    assert isinstance(build_predictor("flownet2"), FlowNet2)


def test_flownets_non_pow2_input():
    """crop_like parity: decoders crop upsampled tensors for non-2^k sizes
    (reference FlowNetS/util.py:75-79)."""
    out, _ = _run(FlowNetS(), jnp.zeros((1, 96, 96, 2)), train=True)
    assert out[0].shape == (1, 96, 96, 2)
    assert out[1].shape == (1, 24, 24, 2)


def test_flownet_sd_non_pow2_input():
    out, _ = _run(FlowNetSD(), jnp.zeros((1, 96, 96, 2)), train=True)
    assert out[0].shape == (1, 24, 24, 2)


def test_voxelmorph3d_identity_at_init():
    """Tiny-variance velocity head → the initial map is ~the identity."""
    from tpureg.models import VoxelMorph3D

    key = jax.random.key(3)
    x = jax.random.uniform(key, (1, 16, 32, 32, 2), jnp.float32)
    mod = VoxelMorph3D()
    variables = mod.init(KEY, x)
    flow, warped, vel = mod.apply(variables, x)
    assert flow.shape == (1, 16, 32, 32, 3)
    assert warped.shape == (1, 16, 32, 32, 1)
    assert vel.shape == (1, 8, 16, 16, 3)  # int_downsize=2
    assert float(np.max(np.abs(np.asarray(flow)))) < 1e-2
    np.testing.assert_allclose(
        np.asarray(warped), np.asarray(x[..., 1:2]), atol=1e-2
    )


def test_voxelmorph3d_fullres_velocity():
    from tpureg.models import VoxelMorph3D

    x = jnp.zeros((1, 16, 16, 16, 2))
    mod = VoxelMorph3D(int_downsize=1)
    variables = mod.init(KEY, x)
    flow, warped, vel = mod.apply(variables, x)
    assert vel.shape == (1, 16, 16, 16, 3)
    assert flow.shape == (1, 16, 16, 16, 3)


def test_raft_lookup_windows_matches_gather():
    """Gather-free one-hot window lookup == 4-tap gather oracle."""
    from tpureg.models.raft import _corr_pyramid, _lookup

    key = jax.random.key(5)
    k1, k2, k3 = jax.random.split(key, 3)
    f1 = jax.random.normal(k1, (2, 8, 8, 16))
    f2 = jax.random.normal(k2, (2, 8, 8, 16))
    pyr = _corr_pyramid(f1, f2, levels=3)
    # centers spread beyond the borders to exercise zero-padding taps
    coords = jax.random.uniform(k3, (2, 8, 8, 2), minval=-3.0, maxval=11.0)
    want = _lookup(pyr, coords, radius=4, use_windows=False)
    got = _lookup(pyr, coords, radius=4, use_windows=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_pwc_old_contract():
    # Legacy RGB variant (reference PWCNet.py:282-496): 6-ch input,
    # train -> (flow2..flow6), eval -> bare flow2 at 1/4 res.
    from tpureg.models import PWCDCNetOld

    x = jnp.zeros((1, 64, 64, 6))
    out, variables = _run(PWCDCNetOld(), x, train=True)
    assert [o.shape for o in out] == [
        (1, 16, 16, 2), (1, 8, 8, 2), (1, 4, 4, 2), (1, 2, 2, 2),
        (1, 1, 1, 2),
    ]
    out_eval, _ = _run(PWCDCNetOld(), x, train=False)
    assert out_eval.shape == (1, 16, 16, 2)

    # Param count vs the reference constructor arithmetic
    # (PWCNet.py:294-368), computed independently of the flax module tree.
    convs = [(3, 16), (16, 16), (16, 32), (32, 32), (32, 64), (64, 64),
             (64, 96), (96, 96), (96, 128), (128, 128), (128, 196),
             (196, 196)]
    deconvs = []
    dd = [128, 256, 352, 416, 448]
    for c1_feat, has_upfeat in [(0, True), (128, True), (96, True),
                                (64, True), (32, False)]:
        od = 81 + (c1_feat + 4 if c1_feat else 0)
        widths = [128, 128, 96, 64, 32]
        cin = od
        for w in widths:
            convs.append((cin, w))
            cin += w
        convs.append((cin, 2))          # predict_flow
        deconvs.append((2, 2))          # deconv
        if has_upfeat:
            deconvs.append((cin, 2))    # upfeat
    for io in [(565, 128), (128, 128), (128, 128), (128, 96), (96, 64),
               (64, 32), (32, 2)]:      # context net + dc_conv7
        convs.append(io)
    expected = sum(9 * i * o + o for i, o in convs) + sum(
        16 * i * o + o for i, o in deconvs)
    n_params = sum(p.size for p in jax.tree.leaves(variables["params"]))
    assert n_params == expected
