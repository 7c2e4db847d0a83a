"""Multi-host initialization helpers.

The reference has no real multi-node path (a vestigial gloo all-reduce,
``train/maddpg-v2/utils/misc.py:33-46``, and Ray actors in v3 — SURVEY §2.11).
The TPU-native story: every host runs the SAME program; ``jax.distributed``
wires the processes, the mesh spans all devices of the pod slice, and the env
batch shards over it — rollouts are embarrassingly parallel over ICI/DCN and
learner gradients reduce via the collectives XLA inserts under pjit.

This module cannot be exercised on single-host CI (the driver dry-runs the
sharded program on a virtual CPU mesh instead — ``__graft_entry__``); it is
the documented entry point for real pods.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax

from .mesh import make_mesh


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed.  On TPU pods all arguments are discovered
    from the environment; pass them explicitly for CPU/GPU clusters."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def pod_mesh(tp: int = 1, axis_names: Tuple[str, str] = ("data", "model")):
    """Global mesh over every device in the pod slice: data-parallel env
    batch over ``total_devices // tp``, tensor-parallel over ``tp``.

    Call after :func:`initialize_multihost`; the same code runs unchanged on
    one host (``jax.devices()`` is then just the local chips).
    """
    n = len(jax.devices())
    assert n % tp == 0, (n, tp)
    return make_mesh((n // tp, tp), axis_names)


def per_host_batch(global_batch: int) -> int:
    """Env count this host should generate when building a host-local batch
    (``global_batch`` must divide evenly across processes)."""
    p = jax.process_count()
    assert global_batch % p == 0, (global_batch, p)
    return global_batch // p
