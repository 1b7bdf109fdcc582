"""Export tpureg weights back into a PyTorch state dict (compat shim).

The reverse of :mod:`tpureg.compat.torch_import`: a TPU-trained flax
parameter tree is written into the flat ``state_dict`` layout the reference
networks load (``model.load_state_dict(...)`` in
``/root/reference/inference.py:61-63`` / ``train.py:169-171``), so a model
trained with this framework can be consumed by the reference's own torch
drivers. That is the strongest parity statement the compat layer can make:
import and export compose to the identity, and either side's checkpoints
work on the other side.

The export is template-driven: torch key names are model-specific (the
reference uses ``Sequential(conv, bn)`` member indices, bare
``predict_flow*`` convs, ``deconvN.0`` vs PWC's bare ``deconvN``), so the
caller supplies the target key set — either ``model.state_dict()`` of a
constructed reference model (the natural case: reference drivers always
construct the model before loading) or the keys of any existing torch
checkpoint of the same architecture. Each key is mapped through the SAME
``_translate`` used by the importer and the tensor conversion inverted:

- conv kernel (kh, kw, I, O) HWIO → torch Conv2d (O, I, kh, kw)
- deconv kernel (kh, kw, I, O) equivalent-convolution layout →
  torch ConvTranspose2d (I, O, kh, kw) with the spatial flip undone
- dense kernel (I, O) → torch Linear (O, I)
- bn scale/bias/mean/var → weight/bias/running_mean/running_var
- ``num_batches_tracked`` keys (no flax counterpart) are emitted as int64 0
  so ``load_state_dict(strict=True)`` succeeds.

Round-trip verified in tests/test_parity_torch.py: a randomly-initialized
tpureg net exported into the reference torch net (strict=True) produces
forwards matching to fp32 accumulation-order noise, both train and eval.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Tuple

import numpy as np

from .torch_import import _get, _translate

__all__ = ["export_torch_state_dict", "export_to_torch_checkpoint"]


def _invert(value: np.ndarray, kind: str, leaf: str) -> np.ndarray:
    if leaf != "kernel":
        return value
    if kind == "conv" and value.ndim == 4:
        return value.transpose(3, 2, 0, 1)  # HWIO -> OIHW
    if kind == "deconv" and value.ndim == 4:
        # importer: torch (I,O,kh,kw) --flip(2,3)--> transpose(2,3,0,1) ->
        # (kh,kw,I,O); invert in reverse order
        return np.flip(value.transpose(2, 3, 0, 1), axis=(2, 3)).copy()
    if kind == "dense" and value.ndim == 2:
        return value.transpose(1, 0)
    return value


def export_torch_state_dict(
    params: dict,
    template_keys: Iterable[str],
    batch_stats: Optional[dict] = None,
    prefix: Tuple[str, ...] = (),
) -> Tuple[Dict[str, np.ndarray], Dict[str, List[str]]]:
    """Fill a torch state dict from flax ``params``/``batch_stats``.

    ``template_keys``: the torch keys to produce (e.g.
    ``ref_model.state_dict().keys()``). ``prefix`` strips leading flax path
    segments (e.g. ``('predictor',)`` when exporting out of the
    registration head's tree).

    Returns ``(state_dict, report)``; ``report['missing']`` lists template
    keys with no flax counterpart (export is strict in spirit — a non-empty
    missing list means the architectures disagree).
    """
    import jax

    params = jax.tree.map(np.asarray, params)
    batch_stats = jax.tree.map(np.asarray, batch_stats or {})
    out: Dict[str, np.ndarray] = {}
    report: Dict[str, List[str]] = {"exported": [], "missing": []}

    for key in template_keys:
        if key.split(".")[-1] == "num_batches_tracked":
            out[key] = np.zeros((), dtype=np.int64)
            continue
        tr = _translate(key)
        if tr is None:  # no flax counterpart by construction
            report["missing"].append(key)
            continue
        path, leaf, kind = tr
        tree = batch_stats if kind == "bn_stat" else params
        value = _get(tree, list(prefix) + path + [leaf])
        if value is None:
            report["missing"].append(key)
            continue
        out[key] = _invert(np.asarray(value, dtype=np.float32), kind, leaf)
        report["exported"].append(key)

    return out, report


def export_to_torch_checkpoint(
    params: dict,
    template_keys: Iterable[str],
    path: str,
    batch_stats: Optional[dict] = None,
    prefix: Tuple[str, ...] = (),
) -> Dict[str, List[str]]:
    """Write a reference-loadable ``{'state_dict': ...}`` torch checkpoint
    (the wrapper layout ``load_torch_checkpoint`` unwraps, matching the
    reference's published FlowNet2 checkpoints)."""
    import torch

    sd, report = export_torch_state_dict(
        params, template_keys, batch_stats=batch_stats, prefix=prefix
    )
    torch.save(
        {"state_dict": {k: torch.from_numpy(np.asarray(v)) for k, v in
                        sd.items()}},
        path,
    )
    return report
