"""Profiling & numeric-safety instrumentation.

Replaces the reference's wall-clock FPS prints (``maddpg-v4/runner.py:156-161``)
with ``jax.profiler`` traces and throughput counters, and guards the known
zero-distance NaN (``core.py:312``, train/README.md:194-205) with an explicit
finite-state check usable in debug runs.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """``with trace('/tmp/jaxtrace'): ...`` → TensorBoard-loadable trace."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


named_scope = jax.named_scope  # re-export for per-section annotation


class Throughput:
    """Steps/s/chip counter (print cadence mirrors the reference's FPS log)."""

    def __init__(self, report_every: int = 10):
        self.report_every = report_every
        self._t0: Optional[float] = None
        self._steps = 0
        self._iters = 0
        self.last_rate = 0.0

    def tick(self, env_steps: int) -> Optional[float]:
        """Record ``env_steps`` done; returns steps/s when a report is due."""
        now = time.perf_counter()
        if self._t0 is None:
            self._t0 = now
            return None
        self._steps += env_steps
        self._iters += 1
        if self._iters % self.report_every == 0:
            self.last_rate = self._steps / (now - self._t0)
            self._t0, self._steps = now, 0
            return self.last_rate
        return None


def assert_finite(tree, name: str = "state") -> None:
    """Host-side finite check over a pytree (debug harness for the reference's
    NaN failure mode)."""
    bad = [
        path
        for path, leaf in jax.tree_util.tree_leaves_with_path(tree)
        if jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.floating)
        and not bool(jnp.isfinite(leaf).all())
    ]
    if bad:
        raise FloatingPointError(
            f"non-finite values in {name}: {[jax.tree_util.keystr(p) for p in bad]}"
        )
