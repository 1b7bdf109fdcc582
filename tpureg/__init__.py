"""tpureg — TPU-native self-supervised medical image registration.

A brand-new JAX / Flax / Pallas / pjit framework with the capabilities of the
PyTorch reference `Self-supervised-Medical-Image-Registration-using-Deep-Optical-
Flow-Estimation-with-Brain-MRI-Data`:

- L0 ops  (``tpureg.ops``):       correlation cost-volume, bilinear warping
                                  (3 grid conventions), channel norm, torch-parity
                                  resize, on-device elastic deformation synthesis.
- L1 models (``tpureg.models``):  FlowNetS, FlowNetC, FlowNetSD, FlowNetFusion,
                                  the FlowNet2 cascade, PWC-Net, 3-D affine net.
- L2 reg  (``tpureg.reg``):       registration head (predictor registry + STN warp).
- L3 losses/metrics:              Charbonnier photometric + NCC + smoothness
                                  multi-scale loss; Dice/Hausdorff/SSIM/PSNR/MI/
                                  Pearson evaluation suite.
- L4 data (``tpureg.data``):      OASIS-1 Analyze volume→slice pipeline with
                                  on-device moving-image synthesis.
- L5 train/cli:                   pjit-able train/eval steps, Orbax checkpoints,
                                  TensorBoard logging, argparse CLIs.
- parallel:                       device-mesh construction and sharding rules
                                  (DP / FSDP-style / spatial) for pjit/shard_map.

All arrays are NHWC (channel-last) — the natural TPU layout. Flows are
``[..., 2]`` with the last axis ordered ``(u_x, u_y)`` to match the reference's
channel-first ``flow[:, 0] = x-displacement`` convention (reference
models.py:256-268).
"""

__version__ = "0.1.0"
