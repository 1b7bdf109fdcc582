"""Layer-ordered weight ingestion from caffe-style dumps.

Capability parity with the reference's caffe parsers
(flownet2/utils/param_utils.py:5-254): those copy weights from a caffe
blob container into each subnet **by layer order** (not by name), flipping
the first conv's BGR channels. The equivalent here consumes a sequence of
(weight, bias) numpy pairs — e.g. exported from caffe blobs — and assigns
them to a model's conv/deconv kernels in parameter-tree traversal order
(flax trees are ordered dicts, so traversal order == definition order ==
the caffe layer order for these sequential nets).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

__all__ = ["assign_layer_ordered", "bgr_to_rgb_first_conv"]


def bgr_to_rgb_first_conv(weight: np.ndarray) -> np.ndarray:
    """Flip a (O, 3, kh, kw) caffe BGR stem conv to RGB channel order
    (param_utils.py first-conv channel flip)."""
    return weight[:, ::-1].copy()


def _conv_leaves(tree, path=()):  # ordered (path, leaf) conv/deconv kernels
    for k, v in tree.items():
        p = path + (k,)
        if isinstance(v, dict):
            yield from _conv_leaves(v, p)
        elif k == "kernel":
            yield p, v


def assign_layer_ordered(
    params: dict,
    layers: Sequence[Tuple[np.ndarray, Optional[np.ndarray]]],
    flip_first_bgr: bool = False,
) -> Tuple[dict, List[str]]:
    """Assign (weight, bias) pairs to conv kernels in traversal order.

    Weights arrive in caffe layout (O, I, kh, kw) and are transposed to
    HWIO; biases go to the sibling 'bias' leaf when the target has one.
    Returns (new_params, report_lines). Stops at whichever runs out first
    (caffe dumps cover only the conv stack).
    """
    import jax

    params = jax.tree.map(np.asarray, params)
    report = []
    leaves = list(_conv_leaves(params))
    for i, ((path, current), (weight, bias)) in enumerate(zip(leaves, layers)):
        weight = np.asarray(weight)
        if i == 0 and flip_first_bgr:
            weight = bgr_to_rgb_first_conv(weight)
        whwio = weight.transpose(2, 3, 1, 0)
        if whwio.shape != np.shape(current):
            report.append(
                f"stop at layer {i} ({'/'.join(path)}): "
                f"{whwio.shape} != {np.shape(current)}"
            )
            break
        node = params
        for p in path[:-1]:
            node = node[p]
        node["kernel"] = whwio.astype(np.asarray(current).dtype)
        if bias is not None and "bias" in node:
            node["bias"] = np.asarray(bias, np.asarray(current).dtype)
        report.append(f"layer {i} -> {'/'.join(path)} {whwio.shape}")
    return params, report
