from .mesh import (
    batch_sharding,
    make_mesh,
    model_sharding_for_params,
    parse_mesh_arg,
    replicated,
    shard_batch,
    shard_train_tuple,
)
from .multihost import initialize_multihost, per_host_batch, pod_mesh

__all__ = [
    "batch_sharding",
    "make_mesh",
    "model_sharding_for_params",
    "parse_mesh_arg",
    "replicated",
    "shard_batch",
    "shard_train_tuple",
    "initialize_multihost",
    "per_host_batch",
    "pod_mesh",
]
