from .mesh import (
    batch_sharding,
    make_mesh,
    model_sharding_for_params,
    parse_mesh_arg,
    replicated,
    shard_batch,
    shard_train_tuple,
)
from .multihost import (
    host_local_to_global,
    initialize_multihost,
    per_host_batch,
    pod_mesh,
    replicate_global,
)

__all__ = [
    "batch_sharding",
    "make_mesh",
    "model_sharding_for_params",
    "parse_mesh_arg",
    "replicated",
    "shard_batch",
    "shard_train_tuple",
    "host_local_to_global",
    "initialize_multihost",
    "per_host_batch",
    "pod_mesh",
    "replicate_global",
]
