from .mesh import (
    batch_sharding,
    make_mesh,
    model_sharding_for_params,
    replicated,
    shard_batch,
)
from .multihost import initialize_multihost, per_host_batch, pod_mesh

__all__ = [
    "batch_sharding",
    "make_mesh",
    "model_sharding_for_params",
    "replicated",
    "shard_batch",
    "initialize_multihost",
    "per_host_batch",
    "pod_mesh",
]
