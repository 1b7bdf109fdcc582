"""AOT export of trained registration models for serving (jax.export).

The reference has no deployment path — its research scripts rebuild the
model and load a torch checkpoint at eval time (reference inference.py:
140-148). A production TPU framework serves from a self-contained compiled
artifact instead: :func:`export_registration` closes the registration head
over its trained weights and exports the eval forward as serialized
StableHLO via ``jax.export`` — the artifact needs no model code, flax, or
checkpoint layout at the serving site, is version-checked by jax.export's
serialization layer, and can be lowered for several platforms at once
(``platforms=("tpu", "cpu")``) so the same file serves on TPU workers and
CPU canaries.

Artifact calling convention: ``f(imgs[, segs]) -> (flows, warped_imgs,
warped_segs_or_None, warped_grid)`` with the same shapes as
``OpticalFlowReg.__call__`` (eval mode, fixed batch/size chosen at export).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax import export as jexport

__all__ = ["export_registration", "save_artifact", "load_artifact"]


def export_registration(
    model,
    variables,
    batch_size: int,
    image_size: int,
    with_segs: bool = False,
    platforms: Optional[Sequence[str]] = None,
    dtype=jnp.float32,
):
    """Export ``model.apply`` (eval mode) with ``variables`` baked in.

    Returns a ``jax.export.Exported``; use :func:`save_artifact` /
    ``.serialize()`` to persist. ``platforms`` defaults to the current
    backend; pass ``("tpu", "cpu")`` for a multi-platform artifact.

    Multi-platform artifacts are traced under the scoped
    :func:`tpureg.ops.portable.portable_ops` switch: a TPU-only Pallas
    custom call cannot appear in the non-TPU branches, so the portable
    pure-XLA op lowerings are baked in instead (slightly slower on TPU;
    single-platform TPU artifacts keep the Pallas kernels). The switch is
    a contextvar, so concurrent tracing in other threads is unaffected.
    """
    from ..ops.portable import portable_ops

    spec = jax.ShapeDtypeStruct((batch_size, image_size, image_size, 2),
                                dtype)
    portable = bool(
        platforms and set(platforms) - {jax.default_backend()}
    )

    if with_segs:

        def forward(imgs, segs):
            return model.apply(variables, imgs, segs, train=False)

        args = (spec, spec)
    else:

        def forward(imgs):
            return model.apply(variables, imgs, None, train=False)

        args = (spec,)

    if portable:
        with portable_ops():
            exp = jexport.export(jax.jit(forward), platforms=platforms)(*args)
    else:
        exp = jexport.export(jax.jit(forward), platforms=platforms)(*args)
    return exp


def save_artifact(path: str, exported) -> None:
    with open(path, "wb") as f:
        f.write(exported.serialize())


def load_artifact(path: str):
    """Deserialize an artifact → callable ``f(imgs[, segs])``.

    Runs on whatever backend jax currently targets (must be one of the
    artifact's export platforms).
    """
    with open(path, "rb") as f:
        exp = jexport.deserialize(bytearray(f.read()))
    return exp.call
