from .mesh import (
    fsdp_param_sharding,
    fsdp_state_sharding,
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
    spatial_sharding,
)

__all__ = [
    "fsdp_param_sharding",
    "fsdp_state_sharding",
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "spatial_sharding",
]
