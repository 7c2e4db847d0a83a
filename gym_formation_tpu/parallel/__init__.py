from .mesh import (
    batch_sharding,
    make_mesh,
    model_sharding_for_params,
    replicated,
    shard_batch,
)

__all__ = [
    "batch_sharding",
    "make_mesh",
    "model_sharding_for_params",
    "replicated",
    "shard_batch",
]
