"""Lightweight gym-compatible space descriptors (no gym dependency).

The reference builds per-agent ``gym.spaces`` lists
(``/root/reference/formation_gym/environment.py:56-96``) and vendors an
old-gym ``MultiDiscrete`` (``formation_gym/multi_discrete.py:9-45``).  These
minimal equivalents carry the same shape/bounds metadata trainers read, plus
key-based ``sample`` for functional RNG.
"""

from __future__ import annotations

from typing import Sequence, Tuple as TTuple

import numpy as np
import jax
import jax.numpy as jnp


class Space:
    shape: TTuple[int, ...] = ()
    dtype = np.float32

    def sample(self, key):
        raise NotImplementedError

    def contains(self, x) -> bool:
        raise NotImplementedError


class Box(Space):
    def __init__(self, low, high, shape=None, dtype=np.float32):
        if shape is None:
            shape = np.broadcast(np.asarray(low), np.asarray(high)).shape
        self.shape = tuple(shape)
        self.low = np.broadcast_to(np.asarray(low, dtype), self.shape)
        self.high = np.broadcast_to(np.asarray(high, dtype), self.shape)
        self.dtype = dtype

    def sample(self, key):
        lo = jnp.where(jnp.isfinite(self.low), self.low, -1.0)
        hi = jnp.where(jnp.isfinite(self.high), self.high, 1.0)
        return jax.random.uniform(key, self.shape, jnp.float32, lo, hi)

    def contains(self, x) -> bool:
        x = np.asarray(x)
        return x.shape == self.shape and bool(
            np.all(x >= self.low - 1e-6) and np.all(x <= self.high + 1e-6)
        )

    def __repr__(self):
        return f"Box{self.shape}"


class Discrete(Space):
    def __init__(self, n: int):
        self.n = int(n)
        self.shape = ()
        self.dtype = np.int64

    def sample(self, key):
        return jax.random.randint(key, (), 0, self.n)

    def contains(self, x) -> bool:
        return 0 <= int(x) < self.n

    def __repr__(self):
        return f"Discrete({self.n})"


class Tuple(Space):
    def __init__(self, spaces: Sequence[Space]):
        self.spaces = tuple(spaces)

    def sample(self, key):
        keys = jax.random.split(key, len(self.spaces))
        return tuple(s.sample(k) for s, k in zip(self.spaces, keys))

    def contains(self, x) -> bool:
        return len(x) == len(self.spaces) and all(
            s.contains(v) for s, v in zip(self.spaces, x)
        )

    def __repr__(self):
        return f"Tuple({list(self.spaces)})"


class MultiDiscrete(Space):
    """[min, max] integer-pair space matching the vendored old-gym variant
    (``formation_gym/multi_discrete.py:9-45``)."""

    def __init__(self, array_of_param_array):
        arr = np.asarray(array_of_param_array)
        self.low = arr[:, 0].astype(np.int64)
        self.high = arr[:, 1].astype(np.int64)
        self.num_discrete_space = self.low.shape[0]
        self.shape = (self.num_discrete_space,)
        self.dtype = np.int64

    @property
    def n(self) -> int:
        return int(np.sum(self.high - self.low + 1))

    def sample(self, key):
        return jax.random.randint(
            key, (self.num_discrete_space,), self.low, self.high + 1
        )

    def contains(self, x) -> bool:
        x = np.asarray(x)
        return (
            x.shape == self.shape
            and bool(np.all(x >= self.low))
            and bool(np.all(x <= self.high))
        )

    def __repr__(self):
        return f"MultiDiscrete({self.num_discrete_space})"
