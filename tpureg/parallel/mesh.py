"""Device mesh + sharding rules (the reference has no distributed path at all
— SURVEY.md §2.3; this is the TPU-native scaling layer built in its place).

Design: a 2-D logical mesh ``('data', 'spatial')``.

- ``data``: batch data-parallelism — the workload's natural axis (per-chip
  batches of 2-D slice pairs; ≤162.5M params replicate trivially). Gradients
  all-reduce over ICI automatically via pjit when params are replicated and
  batches are sharded.
- ``spatial``: optional H-axis sharding for the 3-D volumetric path (256³
  volumes; the "context-parallel" analogue per SURVEY.md §5) and a place to
  hang FSDP-style parameter sharding as a config change.

Everything goes through ``jax.jit`` + ``NamedSharding`` annotations; XLA
inserts the collectives (psum for grads, halo exchanges for spatially
sharded convs).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "spatial_sharding",
    "fsdp_param_sharding",
    "fsdp_state_sharding",
]


def make_mesh(
    n_data: Optional[int] = None,
    n_spatial: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ('data', 'spatial') mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_spatial
    assert n_data * n_spatial == len(devices), (
        f"mesh {n_data}x{n_spatial} != {len(devices)} devices"
    )
    arr = np.asarray(devices).reshape(n_data, n_spatial)
    return Mesh(arr, ("data", "spatial"))


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'; rest replicated."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def spatial_sharding(mesh: Mesh, ndim: int = 5, axis: int = 2) -> NamedSharding:
    """Shard batch over 'data' and one spatial axis over 'spatial'.

    Default axis=2 → H for [B, D, H, W, C] volumes. XLA materializes the
    conv/warp halo exchanges over the 'spatial' mesh axis.
    """
    spec = [None] * ndim
    spec[0] = "data"
    spec[axis] = "spatial"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def fsdp_param_sharding(mesh: Mesh, param, min_size: int = 2**16,
                        axis: str = "data") -> NamedSharding:
    """FSDP-style sharding for one parameter: shard the largest dimension
    divisible by the mesh axis; small/indivisible params replicate.

    The workload's models (≤162.5M params) replicate trivially, but the
    mesh exposes FSDP as a config change (SURVEY.md §2.3): apply this over a
    state pytree via ``fsdp_state_sharding`` and pjit partitions optimizer
    state and params across 'data', all-gathering weights per layer.
    """
    n = mesh.shape[axis]
    shape = getattr(param, "shape", ())
    if np.prod(shape, dtype=np.int64) < min_size:
        return NamedSharding(mesh, P())
    dims = sorted(range(len(shape)), key=lambda d: -shape[d])
    for d in dims:
        if shape[d] % n == 0:
            spec = [None] * len(shape)
            spec[d] = axis
            return NamedSharding(mesh, P(*spec))
    return NamedSharding(mesh, P())


def fsdp_state_sharding(mesh: Mesh, state):
    """Sharding pytree for a TrainState: FSDP params/opt-state, replicated
    scalars."""
    import jax

    return jax.tree.map(lambda p: fsdp_param_sharding(mesh, p), state)


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree of host arrays with batch-axis sharding."""
    return jax.tree.map(
        lambda x: jax.device_put(x, batch_sharding(mesh, np.ndim(x))), batch
    )
