"""PyTorch checkpoint import with channel surgery (compat shim).

Reproduces the reference's pretrained-weight ingestion capabilities
(SURVEY.md §2.1 "pretrained-weight adaptation"):

- FlowNet2 checkpoint loaded ``strict=False`` into the grayscale-adapted
  cascade (train.py:169-171)
- PWC FlyingChairs weights with the conv1a RGB→1-channel collapse by
  channel sum (models.py:246-248)
- FlowNetS FlyingChairs weights with the 6→2-channel conv1 collapse summing
  each RGB triplet (train.py:158-166, models.py:304-310)

Torch→flax tensor conversions:
- Conv2d weight (O, I, kh, kw) → HWIO kernel (kh, kw, I, O)
- ConvTranspose2d weight (I, O, kh, kw) → the equivalent-convolution layout
  used by TorchConvTranspose: spatially flipped then (kh, kw, I, O)
- BatchNorm weight/bias → bn scale/bias; running stats → batch_stats

Name translation handles the reference packages' naming:
``<block>.0.* / <block>.1.*`` Sequential(conv, bn) members, bare
``predict_flow*`` / ``dc_conv7`` convs, ``upsampled_flowA_to_B`` →
``upflowAtoB``, Sequential deconvs ``deconvN.0`` → ``deconvN/convt`` and
PWC's bare ConvTranspose ``deconvN`` / ``upfeatN``.

Import is strict=False by definition: keys that do not resolve to an
existing target leaf (or whose converted shape mismatches) are reported,
not fatal — matching ``load_state_dict(strict=False)``.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

import numpy as np

__all__ = [
    "load_torch_checkpoint",
    "import_torch_state_dict",
    "collapse_rgb_input",
    "collapse_rgb_pair_input",
]


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint file → flat {key: np.ndarray} state dict."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    if isinstance(obj, dict) and "model_state_dict" in obj:
        obj = obj["model_state_dict"]
    return {k: np.asarray(v.detach().cpu().numpy()) if hasattr(v, "detach")
            else np.asarray(v) for k, v in obj.items()}


def collapse_rgb_input(weight: np.ndarray) -> np.ndarray:
    """(O, 3, kh, kw) → (O, 1, kh, kw) by channel sum (models.py:246-248)."""
    return weight.sum(axis=1, keepdims=True)


def collapse_rgb_pair_input(weight: np.ndarray) -> np.ndarray:
    """(O, 6, kh, kw) → (O, 2, kh, kw): sum each image's RGB triplet
    (train.py:158-166)."""
    return np.concatenate(
        [weight[:, :3].sum(1, keepdims=True), weight[:, 3:].sum(1, keepdims=True)],
        axis=1,
    )


_UPFLOW_RE = re.compile(r"upsampled_flow(\d)_to_(\d)")
_BARE_DECONV_RE = re.compile(r"^(deconv\d|upfeat\d)$")


def _translate(key: str) -> Optional[Tuple[List[str], str, str]]:
    """torch key → (flax path segments, leaf name, kind).

    kind ∈ {'conv', 'deconv', 'bn_param', 'bn_stat', 'dense'}; returns None
    for keys with no flax counterpart (e.g. num_batches_tracked).
    """
    parts = key.split(".")
    leaf = parts[-1]
    if leaf == "num_batches_tracked":
        return None
    mods = parts[:-1]

    # name fixes
    mods = [_UPFLOW_RE.sub(lambda m: f"upflow{m.group(1)}to{m.group(2)}", m)
            for m in mods]

    last = mods[-1]
    if last == "0" and len(mods) >= 2:  # Sequential member 0 = conv/deconv
        owner = mods[-2]
        if owner.startswith("deconv"):
            return mods[:-1] + ["convt"], _conv_leaf(leaf), "deconv"
        return mods[:-1] + ["conv"], _conv_leaf(leaf), "conv"
    if last == "1" and len(mods) >= 2:  # Sequential member 1 = BatchNorm
        base = mods[:-1] + ["bn"]
        if leaf == "weight":
            return base, "scale", "bn_param"
        if leaf == "bias":
            return base, "bias", "bn_param"
        if leaf == "running_mean":
            return base, "mean", "bn_stat"
        if leaf == "running_var":
            return base, "var", "bn_stat"
        return None
    if last.startswith("upflow") or _BARE_DECONV_RE.match(last):
        return mods, _conv_leaf(leaf), "deconv"
    if last == "fc" or last.startswith("fc"):
        return mods, "kernel" if leaf == "weight" else "bias", "dense"
    # bare conv (predict_flow*, dc_conv7, ...)
    return mods, _conv_leaf(leaf), "conv"


def _conv_leaf(leaf: str) -> str:
    return {"weight": "kernel", "bias": "bias"}.get(leaf, leaf)


def _convert(value: np.ndarray, kind: str, leaf: str) -> np.ndarray:
    if leaf != "kernel":
        return value
    if kind == "conv" and value.ndim == 4:
        return value.transpose(2, 3, 1, 0)
    if kind == "deconv" and value.ndim == 4:
        return np.flip(value, axis=(2, 3)).transpose(2, 3, 0, 1).copy()
    if kind == "dense" and value.ndim == 2:
        return value.transpose(1, 0)
    return value


def _get(tree, path):
    node = tree
    for p in path:
        if not isinstance(node, dict) or p not in node:
            return None
        node = node[p]
    return node


def _set(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node[p]
    node[path[-1]] = value


def import_torch_state_dict(
    state_dict: Dict[str, np.ndarray],
    params: dict,
    batch_stats: Optional[dict] = None,
    surgery: Optional[Dict[str, str]] = None,
    prefix: Tuple[str, ...] = (),
) -> Tuple[dict, dict, Dict[str, List[str]]]:
    """Copy a torch state dict into flax params/batch_stats (strict=False).

    ``surgery`` maps torch keys to a transform name applied before
    conversion: 'rgb' (sum 3→1 input channels) or 'rgb_pair' (sum 6→2).
    ``prefix`` prepends path segments (e.g. ('predictor',) when importing
    into the registration head's tree).

    Returns (params, batch_stats, report) where report lists 'loaded',
    'missing' (no target leaf) and 'shape_mismatch' keys.
    """
    import jax

    params = jax.tree.map(np.asarray, params)
    batch_stats = jax.tree.map(np.asarray, batch_stats or {})
    report: Dict[str, List[str]] = {"loaded": [], "missing": [],
                                    "shape_mismatch": []}
    surgery = surgery or {}

    for key, value in state_dict.items():
        tr = _translate(key)
        if tr is None:
            continue
        path, leaf, kind = tr
        if key in surgery:
            op = surgery[key]
            value = (collapse_rgb_input(value) if op == "rgb"
                     else collapse_rgb_pair_input(value))
        value = _convert(np.asarray(value), kind, leaf)
        target_tree = batch_stats if kind == "bn_stat" else params
        full_path = list(prefix) + path + [leaf]
        current = _get(target_tree, full_path)
        if current is None:
            report["missing"].append(key)
            continue
        if tuple(np.shape(current)) != tuple(value.shape):
            report["shape_mismatch"].append(
                f"{key}: {value.shape} -> {np.shape(current)}"
            )
            continue
        _set(target_tree, full_path, value.astype(np.asarray(current).dtype))
        report["loaded"].append(key)

    return params, batch_stats, report
