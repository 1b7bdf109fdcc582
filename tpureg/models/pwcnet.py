"""PWC-Net (PWC-DC): pyramid, warping and cost volume with dense decoders.

Reference: PWC/models/PWCNet.py:38-279 (grayscale-adapted, 1-ch stems :50).
Per level 6→2: warp the moving pyramid feature by the upsampled flow
(× per-level scale 0.625/1.25/2.5/5.0, :214/:228/:242/:258; 'pwc' warp
convention incl. validity mask :143-179), correlate (md=4 → 81 ch, :69),
decode with a DenseNet-connected block, predict flow + upsampled features.
A dilated context network refines flow2 (:128-134, :269-270); two stride-2
deconvs produce flow1/flow0 (:272-273). Returns 7 flows finest-first (:276).

No BatchNorm anywhere; kaiming(fan_in) init, zero bias (:136-140).
TPU-native: correlations run the fused Pallas kernel; the coarse-to-fine
loop is unrolled at trace time (5 static levels) so XLA sees one program.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..nn.layers import ConvBlock, TorchConvTranspose, predict_flow
from ..ops.correlation import correlation
from ..ops.warp import warp2d

__all__ = ["PWCDCNet", "PWCDCNetOld"]

_kaiming = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


def _bilinear_up_init(key, shape, dtype=jnp.float32, gain=2.0):
    """k=4 s=2 ConvTranspose kernel = 2× bilinear upsampling × ``gain``,
    identity over channels. Tent [1/4, 3/4, 3/4, 1/4] per axis
    (flip-symmetric, so the equivalent-convolution layout is identical).

    Default gain 2: a *flow* upsampler doubles values as it doubles
    resolution, because a fixed physical displacement measures twice as
    many pixels at the finer scale — so the init is value-consistent for
    flows carried in px-at-their-own-resolution units (the units the
    self-supervised photometric loss drives every scale toward)."""
    k, k2, cin, cout = shape
    assert k == 4 and k2 == 4, "bilinear init is defined for k=4 s=2"
    f = jnp.asarray([0.25, 0.75, 0.75, 0.25], dtype)
    tent = f[:, None] * f[None, :] * gain
    eye = jnp.eye(cin, cout, dtype=dtype)
    return tent[:, :, None, None] * eye[None, None, :, :]


class PWCDCNet(nn.Module):
    """
    ``flow_up_init``: initializer for the 2-channel flow upsamplers
    (deconv6..2 and the output deconv2/deconv1 chain). "kaiming" is the
    reference's init (PWCNet.py:138-143); "bilinear" starts them as exact
    2× bilinear upsampling — from-scratch self-supervised training never
    has to *discover* that flow0/flow1 should be upsamplings of flow2,
    which the reference sidesteps by loading FlyingChairs weights
    (models.py:243-248). Checkpoint import overwrites either init.

    ``feed_warped``: registration-tuned variant ("pwc-reg" in the
    registry). In reference PWC the moving image reaches the decoder
    ONLY through the integer-offset cost volume (corr(c1, warped) —
    PWCNet.py:214-262), which is nearly flat under sub-pixel motion; on
    the sub-pixel elastic fields of medical registration the supervised
    bootstrap measurably plateaus at identity-level Dice (BASELINE.md
    round-4 PWC section). With ``feed_warped=True`` the decoder at each
    level also sees the warped moving features themselves, whose bilinear
    interpolation is continuous in the flow — the direct sub-pixel
    evidence FlowNetS gets from its stacked image pair. Extra channels
    change the dense-conv input widths, so this variant has its own
    parameter shapes (no reference checkpoint import).
    """

    md: int = 4
    flow_up_init: str = "kaiming"
    feed_warped: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        im1 = x[..., 0:1]
        im2 = x[..., 1:2]

        def conv(feat, name, k=3, s=1, d=1):
            return ConvBlock(feat, k, s, dilation=d, use_bn=False,
                             kernel_init=_kaiming, name=name)

        # --- siamese feature pyramid (levels 1..6)
        # Levels 1-5 apply convNa (stride 2) then convNaa (PWCNet.py:186-195);
        # level 6 is the reference's naming quirk: conv6aa is the stride-2
        # conv applied FIRST, then conv6a (:65-66, :196) — preserved so torch
        # checkpoints map name-for-name.
        feats = (16, 32, 64, 96, 128, 196)
        stages = []
        for lvl, f in enumerate(feats, start=1):
            first, second = (("a", "aa") if lvl < 6 else ("aa", "a"))
            stages.append(
                (conv(f, f"conv{lvl}{first}", s=2), conv(f, f"conv{lvl}{second}"),
                 conv(f, f"conv{lvl}b"))
            )

        def pyramid(im):
            outs = []
            y = im
            for (a, aa, bb) in stages:
                y = bb(aa(a(y, train), train), train)
                outs.append(y)
            return outs  # levels 1..6

        p1 = pyramid(im1)
        p2 = pyramid(im2)

        def corr(a, b):
            return nn.leaky_relu(correlation(a, b, self.md, 1), 0.1)

        dense_feats = (128, 128, 96, 64, 32)

        def dense_decoder(y, lvl):
            for i, f in enumerate(dense_feats):
                y = jnp.concatenate(
                    [conv(f, f"conv{lvl}_{i}")(y, train), y], axis=-1
                )
            flow = predict_flow(use_bias=True, kernel_init=_kaiming,
                               name=f"predict_flow{lvl}")(y)
            return y, flow

        flow_up = (_bilinear_up_init if self.flow_up_init == "bilinear"
                   else _kaiming)

        def up2(y, feat, name):
            init = (flow_up if feat == 2 and name.startswith("deconv")
                    else _kaiming)
            return TorchConvTranspose(feat, 4, 2, 1, use_bias=True,
                                      kernel_init=init, name=name)(y)

        # --- level 6 (no warp)
        lvl6_in = [corr(p1[5], p2[5])]
        if self.feed_warped:
            lvl6_in += [p1[5], p2[5]]
        y, flow6 = dense_decoder(jnp.concatenate(lvl6_in, axis=-1)
                                 if len(lvl6_in) > 1 else lvl6_in[0], 6)
        up_flow = up2(flow6, 2, "deconv6")
        up_feat = up2(y, 2, "upfeat6")

        scales = {5: 0.625, 4: 1.25, 3: 2.5, 2: 5.0}
        flows = {6: flow6}
        for lvl in (5, 4, 3, 2):
            c1, c2 = p1[lvl - 1], p2[lvl - 1]
            warped = warp2d(c2, up_flow * scales[lvl], convention="pwc")
            parts = [corr(c1, warped), c1, up_flow, up_feat]
            if self.feed_warped:
                parts.insert(2, warped)
            y = jnp.concatenate(parts, axis=-1)
            y, flow = dense_decoder(y, lvl)
            flows[lvl] = flow
            if lvl > 2:
                up_flow = up2(flow, 2, f"deconv{lvl}")
                up_feat = up2(y, 2, f"upfeat{lvl}")

        # --- dilated context network refines flow2 (PWCNet.py:128-134)
        ctx = y
        for i, (f, d) in enumerate(
            [(128, 1), (128, 2), (128, 4), (96, 8), (64, 16), (32, 1)], start=1
        ):
            ctx = conv(f, f"dc_conv{i}", d=d)(ctx, train)
        flow2 = flows[2] + predict_flow(use_bias=True, kernel_init=_kaiming,
                                       name="dc_conv7")(ctx)

        flow1 = up2(flow2, 2, "deconv2")
        flow0 = up2(flow1, 2, "deconv1")
        # The reference also constructs self.deconv0 — ConvTranspose(2, 2,
        # k=4, s=4, p=0) — whose only use is commented out (:126, :274).
        # Materialized (and discarded) so torch checkpoint layouts import
        # without unmatched keys, same treatment as PWCDCNetOld's dead
        # deconv2 (:360).
        _ = TorchConvTranspose(2, 4, 4, 0, use_bias=True,
                               kernel_init=_kaiming, name="deconv0")(flow2)
        return (flow0, flow1, flow2, flows[3], flows[4], flows[5], flows[6])


class PWCDCNetOld(nn.Module):
    """Legacy PWC-DC net (reference PWC/models/PWCNet.py:282-496).

    The original RGB PWC-DC variant that predates the grayscale-adapted
    :class:`PWCDCNet`. Differences, all reproduced exactly:

    - 6-channel input: ``im1 = x[..., :3]``, ``im2 = x[..., 3:]`` (:413-414);
    - two convs per pyramid level (``a`` stride-2, ``b`` stride-1, :294-305)
      instead of three;
    - quirky per-level dense-concat ordering — step 0 ``cat(x, conv(x))``,
      step 1 ``cat(conv(x), x)``, steps 2-4 ``cat(x, conv(x))``
      (:431-435, :444-448) — unlike the new net's uniform ``cat(conv(x), x)``;
    - no flow1/flow0 output deconvs: training returns
      ``(flow2, flow3, flow4, flow5, flow6)`` (:494), eval returns the bare
      ``flow2`` tensor (:496);
    - in-model warp with validity mask (:377-409): shared 'pwc' convention
      with the old net's mask threshold 0.999 (:405) instead of the new
      net's 0.9999.

    Dead code in the reference (never constructed by any driver; loader
    ``pwc_dc_net_old`` :511-519 exists but is uncalled) — ported for full
    component-inventory parity.
    """

    md: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        im1 = x[..., 0:3]
        im2 = x[..., 3:6]

        def conv(feat, name, k=3, s=1, d=1):
            return ConvBlock(feat, k, s, dilation=d, use_bn=False,
                             kernel_init=_kaiming, name=name)

        # --- siamese two-conv pyramid (levels 1..6, PWCNet.py:294-305)
        feats = (16, 32, 64, 96, 128, 196)
        stages = [
            (conv(f, f"conv{lvl}a", s=2), conv(f, f"conv{lvl}b"))
            for lvl, f in enumerate(feats, start=1)
        ]

        def pyramid(im):
            outs = []
            y = im
            for (a, bb) in stages:
                y = bb(a(y, train), train)
                outs.append(y)
            return outs

        p1 = pyramid(im1)
        p2 = pyramid(im2)

        def corr(a, b):
            return nn.leaky_relu(correlation(a, b, self.md, 1), 0.1)

        dense_feats = (128, 128, 96, 64, 32)

        def dense_decoder(y, lvl):
            # concat order per step: 0 -> (x, conv), 1 -> (conv, x),
            # 2..4 -> (x, conv)  (PWCNet.py:431-435)
            for i, f in enumerate(dense_feats):
                c = conv(f, f"conv{lvl}_{i}")(y, train)
                y = (jnp.concatenate([c, y], axis=-1) if i == 1
                     else jnp.concatenate([y, c], axis=-1))
            flow = predict_flow(use_bias=True, kernel_init=_kaiming,
                               name=f"predict_flow{lvl}")(y)
            return y, flow

        def up2(y, feat, name):
            return TorchConvTranspose(feat, 4, 2, 1, use_bias=True,
                                      kernel_init=_kaiming, name=name)(y)

        # --- level 6 (no warp)
        y, flow6 = dense_decoder(corr(p1[5], p2[5]), 6)
        up_flow = up2(flow6, 2, "deconv6")
        up_feat = up2(y, 2, "upfeat6")

        scales = {5: 0.625, 4: 1.25, 3: 2.5, 2: 5.0}
        flows = {6: flow6}
        for lvl in (5, 4, 3, 2):
            c1, c2 = p1[lvl - 1], p2[lvl - 1]
            warped = warp2d(c2, up_flow * scales[lvl], convention="pwc",
                            mask_threshold=0.999)
            y = jnp.concatenate([corr(c1, warped), c1, up_flow, up_feat],
                                axis=-1)
            y, flow = dense_decoder(y, lvl)
            flows[lvl] = flow
            if lvl > 2:
                up_flow = up2(flow, 2, f"deconv{lvl}")
                up_feat = up2(y, 2, f"upfeat{lvl}")

        # The reference constructs self.deconv2 (:360) but never calls it in
        # the old forward; materialize it (output discarded, XLA DCEs the
        # compute) so the param tree matches for checkpoint import.
        _ = up2(flows[2], 2, "deconv2")

        # --- dilated context network refines flow2 (PWCNet.py:490-491)
        ctx = y
        for i, (f, d) in enumerate(
            [(128, 1), (128, 2), (128, 4), (96, 8), (64, 16), (32, 1)], start=1
        ):
            ctx = conv(f, f"dc_conv{i}", d=d)(ctx, train)
        flow2 = flows[2] + predict_flow(use_bias=True, kernel_init=_kaiming,
                                       name="dc_conv7")(ctx)

        if train:
            return (flow2, flows[3], flows[4], flows[5], flows[6])
        return flow2
