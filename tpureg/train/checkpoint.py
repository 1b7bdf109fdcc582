"""Two-tier Orbax checkpointing: per-epoch training state + best-val weights.

Capability parity with the reference's torch.save scheme (train.py:183-201):

- ``Checkpoints/Unsupervised/<Predictor>/training_state``: every epoch, the
  full resumable state {epoch, params, batch_stats, opt_state, best_loss}
  (train.py:183-188); resume picks it up when present (train.py:150-156)
- ``model_weight/Unsupervised/<Predictor>/best_weight``: weights + loss
  metadata whenever validation improves (train.py:193-201); inference loads
  this file (inference.py:147-148)

Orbax writes are async-capable and layout-preserving; restore rebuilds the
exact RegTrainState pytree (optimizer state included).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import orbax.checkpoint as ocp

__all__ = [
    "training_state_dir",
    "best_weight_dir",
    "save_training_state",
    "restore_training_state",
    "save_best_weights",
    "restore_best_weights",
]


def training_state_dir(root: str, predictor_name: str) -> str:
    return os.path.abspath(
        os.path.join(root, "Checkpoints", "Unsupervised", predictor_name,
                     "training_state")
    )


def best_weight_dir(root: str, predictor_name: str) -> str:
    return os.path.abspath(
        os.path.join(root, "model_weight", "Unsupervised", predictor_name,
                     "best_weight")
    )


def _save(path: str, payload) -> None:
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, payload, force=True)


def _restore(path: str, target):
    with ocp.StandardCheckpointer() as ckptr:
        if target is None:
            return ckptr.restore(path)
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
        return ckptr.restore(path, abstract)


def save_training_state(root: str, predictor_name: str, state, epoch: int,
                        best_loss: float) -> None:
    payload = {
        "epoch": epoch,
        "best_loss": float(best_loss),
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": int(state.step),
    }
    _save(training_state_dir(root, predictor_name), payload)


def restore_training_state(root: str, predictor_name: str, state
                           ) -> Optional[Tuple[Any, int, float]]:
    """(state, starting_epoch, best_loss) or None when no checkpoint exists.

    ``starting_epoch`` = saved epoch + 1 (train.py:155).
    """
    path = training_state_dir(root, predictor_name)
    if not os.path.exists(path):
        return None
    template = {
        "epoch": 0,
        "best_loss": 0.0,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": 0,
    }
    restored = _restore(path, template)
    state = state.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        step=restored["step"],
    )
    return state, int(restored["epoch"]) + 1, float(restored["best_loss"])


def save_best_weights(root: str, predictor_name: str, state,
                      metrics: Dict[str, float]) -> None:
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "metrics": {k: float(v) for k, v in metrics.items()},
    }
    _save(best_weight_dir(root, predictor_name), payload)


def restore_best_weights(root: str, predictor_name: str, state):
    """state with best-validation weights loaded (inference entry point)."""
    path = best_weight_dir(root, predictor_name)
    template = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "metrics": _restore(path, None).get("metrics", {}),
    }
    restored = _restore(path, template)
    return state.replace(
        params=restored["params"], batch_stats=restored["batch_stats"]
    ), restored["metrics"]
