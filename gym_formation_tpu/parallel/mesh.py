"""Device mesh + sharding helpers.

The reference's parallelism is OS processes over pipes plus an unused gloo
all-reduce (SURVEY §2.11).  The TPU-native equivalents: the env batch shards
over a ``('data',)`` (or ``('data','model')``) mesh axis so the fleet spans
chips/hosts over ICI/DCN, model parameters optionally shard over 'model'
(tensor parallelism for wide layers), and gradient reduction is inserted by
XLA when the jitted train step consumes sharded batches — no explicit
collectives in user code.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axis_names: Tuple[str, ...] = ("data",),
    devices=None,
) -> Mesh:
    """Build a mesh over available devices.

    Defaults to a 1-D ``('data',)`` mesh over all devices.  Pass
    ``shape=(dp, mp), axis_names=('data','model')`` for a 2-D layout.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (devices.size,) + (1,) * (len(axis_names) - 1)
    return Mesh(devices.reshape(shape), axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding that splits the leading (env-batch) axis over ``axis``."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree, mesh: Mesh, axis: str = "data"):
    """Place a pytree with leading batch axes onto the mesh, batch-sharded.

    Leaves with rank 0 are replicated (e.g. scalar counters inside states)."""
    s_batch = batch_sharding(mesh, axis)
    s_rep = replicated(mesh)

    def place(x):
        return jax.device_put(x, s_batch if np.ndim(x) >= 1 else s_rep)

    return jax.tree.map(place, tree)


def model_sharding_for_params(params, mesh: Mesh, axis: str = "model"):
    """Tensor-parallel layout for MLP params: shard the widest axis of each
    kernel over ``axis`` when divisible; replicate everything else.

    For the 64-hidden baselines this is demonstration-scale TP; it becomes
    load-bearing for wide actor/critic stacks and the N=243 centralized
    critic whose input dim is O(N·obs_dim).
    """
    size = mesh.shape[axis]

    def spec(x):
        if np.ndim(x) >= 2 and x.shape[-1] % size == 0:
            return NamedSharding(mesh, P(*([None] * (np.ndim(x) - 1) + [axis])))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec, params)
