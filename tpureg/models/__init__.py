"""Flow-estimator model zoo + name registry.

Registry parity with the reference's predictor selection
(``opticalFlowReg.__init__``, models.py:208-252): substring matching on the
model name — 'flownet2' → the full cascade, 'pwc' → PWC-DC Net, 'raft' →
RAFT (iterative refinement), anything else → FlowNetS. Extra explicit names
expose the cascade sub-variants and the local full-resolution FlowNetS.
"""

from __future__ import annotations

from .affine3d import AffineNet3D, affine_warp3d
from .flownet2 import (
    FlowNet2,
    FlowNet2C,
    FlowNet2CS,
    FlowNet2CSS,
    FlowNet2S,
    FlowNet2SD,
)
from .flownet_c import FlowNetC, FlowNetCPinard
from .flownet_fusion import FlowNetFusion
from .flownet_s import FlowNetS, FlowNetSFull
from .flownet_sd import FlowNetSD
from .pwcnet import PWCDCNet, PWCDCNetOld
from .raft import RAFT
from .voxelmorph3d import VoxelMorph3D

__all__ = [
    "AffineNet3D",
    "affine_warp3d",
    "FlowNet2",
    "FlowNet2C",
    "FlowNet2CS",
    "FlowNet2CSS",
    "FlowNet2S",
    "FlowNet2SD",
    "FlowNetC",
    "FlowNetCPinard",
    "FlowNetFusion",
    "FlowNetS",
    "FlowNetSFull",
    "FlowNetSD",
    "PWCDCNet",
    "PWCDCNetOld",
    "RAFT",
    "VoxelMorph3D",
    "build_predictor",
]

_EXPLICIT = {
    "flownet2-c": lambda bn: FlowNet2C(use_bn=bn),
    "flownet2-s": lambda bn: FlowNet2S(use_bn=bn),
    "flownet2-sd": lambda bn: FlowNet2SD(use_bn=bn),
    "flownet2-cs": lambda bn: FlowNet2CS(use_bn=bn),
    "flownet2-css": lambda bn: FlowNet2CSS(use_bn=bn),
    "flownetc": lambda bn: FlowNetC(use_bn=bn),
    # the cascade pinned to the plain NHWC path (no packed/plane layouts) —
    # the honestly-naive bench baseline variant; same parameter tree
    "flownet2-nhwc": lambda bn: FlowNet2(use_bn=bn, packed=False),
    # pinard-lineage FlowNetC (reference FlowNetS/FlowNetC.py:9-107, unused
    # by the drivers; RGB-pair 6-ch input contract)
    "flownetc-pinard": lambda bn: FlowNetCPinard(use_bn=bn),
    "flownetsd": lambda bn: FlowNetSD(use_bn=bn),
    "flownets-full": lambda bn: FlowNetSFull(use_bn=bn),
    # legacy RGB PWC-DC variant (reference PWCNet.py:282-496, dead code
    # there; exposed here by explicit name only — 6-ch input contract)
    "pwc-old": lambda bn: PWCDCNetOld(),
    # PWC with the 2-ch flow upsamplers initialized as exact bilinear 2×
    # upsampling (models/pwcnet.py::_bilinear_up_init) — the from-scratch
    # training variant standing in for the reference's FlyingChairs init
    # (models.py:243-248); identical graph/parameter tree to "pwc"
    "pwc-bilinear": lambda bn: PWCDCNet(flow_up_init="bilinear"),
    # registration-tuned PWC: decoder additionally sees the warped moving
    # features (sub-pixel-sensitive evidence the reference's cost-volume-
    # only decoder lacks; models/pwcnet.py::PWCDCNet docstring)
    "pwc-reg": lambda bn: PWCDCNet(flow_up_init="bilinear",
                                   feed_warped=True),
    # registration-tuned RAFT: per-iteration warped moving features next
    # to the cost-volume lookup, working at 1/4 resolution
    # (models/raft.py::RAFT.feed_warped / .downsample)
    "raft-reg": lambda bn: RAFT(feed_warped=True, downsample=4),
}


def build_predictor(name: str, use_bn: bool = True):
    """Build a flow predictor module from a registry name.

    Mirrors the reference's substring dispatch (models.py:212-252) with
    additional explicit names for the cascade sub-variants.
    """
    key = name.lower()
    if key in _EXPLICIT:
        return _EXPLICIT[key](use_bn)
    if "flownet2" in key:
        return FlowNet2(use_bn=use_bn)
    if "raft" in key:
        return RAFT()
    if "pwc" in key:
        return PWCDCNet()
    return FlowNetS(use_bn=use_bn, style="pinard")
