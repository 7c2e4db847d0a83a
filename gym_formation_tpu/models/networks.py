"""Neural networks for the trainer zoo (flax.linen).

Scale mirrors the reference baselines: 64-hidden MLPs with orthogonal init
(``/root/reference/train/maddpg-v1/maddpg/actor_critic.py:7-43`` — 3×64 ReLU
actor/critic; ``train/maddpg-v2/utils/networks.py:4-46`` — 2-hidden MLP with
tanh-constrained output; mappo's shared 64-hidden nets per
``train/mappo/train_formation.sh:13`` defaults).  Everything is batch-first
and jit/vmap/pjit friendly.
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

Array = jnp.ndarray


def orthogonal_init(scale: float = jnp.sqrt(2)):
    return nn.initializers.orthogonal(scale)


def soft_bound(x: Array, lo: float, hi: float) -> Array:
    """Smoothly bound ``x`` to (lo, hi) with nonzero gradient everywhere
    (a hard clip freezes the parameter permanently once it crosses a bound:
    the clipped branch has zero gradient).  Identity-like near 0."""
    return hi - nn.softplus(hi - (lo + nn.softplus(x - lo)))


class MLP(nn.Module):
    """ReLU MLP trunk with orthogonal init (reference mappo/maddpg-v4 style:
    orthogonal + optional layer norm, ``maddpg-v4/parameters.yaml``)."""

    features: Sequence[int]
    activation: Callable = nn.relu
    use_layer_norm: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for f in self.features:
            x = nn.Dense(f, kernel_init=orthogonal_init())(x)
            x = self.activation(x)
            if self.use_layer_norm:
                x = nn.LayerNorm()(x)
        return x


class GaussianActor(nn.Module):
    """Continuous stochastic policy for PPO/MAPPO: diagonal Gaussian with a
    state-independent learned log-std."""

    act_dim: int
    hidden: Sequence[int] = (64, 64)
    log_std_init: float = 0.0

    @nn.compact
    def __call__(self, obs: Array) -> Tuple[Array, Array]:
        h = MLP(self.hidden)(obs)
        mean = nn.Dense(self.act_dim, kernel_init=orthogonal_init(0.01))(h)
        log_std = self.param(
            "log_std", nn.initializers.constant(self.log_std_init), (self.act_dim,)
        )
        # guard rail: unbounded log_std drift eventually NaNs the PPO ratio
        log_std = soft_bound(log_std, -5.0, 2.0)
        return mean, jnp.broadcast_to(log_std, mean.shape)


class ValueCritic(nn.Module):
    """Centralized value head: share_obs (all agents' obs concatenated,
    ``environment.py:95-96``) → scalar value."""

    hidden: Sequence[int] = (64, 64)

    @nn.compact
    def __call__(self, share_obs: Array) -> Array:
        h = MLP(self.hidden)(share_obs)
        return nn.Dense(1, kernel_init=orthogonal_init(1.0))(h).squeeze(-1)


class DeterministicActor(nn.Module):
    """DDPG/MADDPG actor: tanh-squashed deterministic policy ×max_action
    (reference ``maddpg-v1/maddpg/actor_critic.py:7-24``)."""

    act_dim: int
    max_action: float = 1.0
    hidden: Sequence[int] = (64, 64, 64)

    @nn.compact
    def __call__(self, obs: Array) -> Array:
        h = MLP(self.hidden)(obs)
        return self.max_action * jnp.tanh(
            nn.Dense(self.act_dim, kernel_init=orthogonal_init(0.01))(h)
        )


class CentralizedQCritic(nn.Module):
    """MADDPG centralized critic: Q(all obs, all actions) → scalar
    (reference ``maddpg-v1/maddpg/actor_critic.py:26-43``; actions scaled by
    max_action before concat, ``:37-39``)."""

    max_action: float = 1.0
    hidden: Sequence[int] = (64, 64, 64)

    @nn.compact
    def __call__(self, obs_all: Array, act_all: Array) -> Array:
        x = jnp.concatenate([obs_all, act_all / self.max_action], axis=-1)
        h = MLP(self.hidden)(x)
        return nn.Dense(1, kernel_init=orthogonal_init(1.0))(h).squeeze(-1)


class LogitsActor(nn.Module):
    """Discrete-action actor: MLP → per-action logits (the reference v2
    discrete path, where the policy net's raw output feeds
    ``onehot_from_logits``/``gumbel_softmax`` —
    ``maddpg-v2/utils/agents.py:48-62``, ``utils/misc.py:49-80``)."""

    n_actions: int
    hidden: Sequence[int] = (64, 64, 64)

    @nn.compact
    def __call__(self, obs: Array) -> Array:
        h = MLP(self.hidden)(obs)
        return nn.Dense(self.n_actions, kernel_init=orthogonal_init(0.01))(h)


def onehot_from_logits(logits: Array) -> Array:
    """Greedy one-hot over the last axis (``maddpg-v2/utils/misc.py:49-57``;
    the ε-random branch lives in the caller's exploration logic)."""
    return jax.nn.one_hot(jnp.argmax(logits, axis=-1), logits.shape[-1], dtype=logits.dtype)


def gumbel_softmax_st(key, logits: Array, tau: float = 1.0) -> Array:
    """Straight-through Gumbel-softmax sample: hard one-hot forward, softmax
    gradient backward (``maddpg-v2/utils/misc.py:60-80``, hard=True path used
    by the discrete actor loss ``algorithms/maddpg.py:174``)."""
    g = jax.random.gumbel(key, logits.shape, logits.dtype)
    y = jax.nn.softmax((logits + g) / tau, axis=-1)
    y_hard = jax.nn.one_hot(jnp.argmax(y, axis=-1), logits.shape[-1], dtype=y.dtype)
    return y_hard + y - jax.lax.stop_gradient(y)


def categorical_logp(logits: Array, action_onehot: Array) -> Array:
    """log π(a|s) for a one-hot action over the last axis (the discrete
    branch of onpolicy's ACTLayer, mirrored by ``maddpg-v4/utils.py``'s
    multidiscrete heads — reference ``train/maddpg-v4/utils.py:118-160``)."""
    return jnp.sum(jax.nn.log_softmax(logits) * action_onehot, axis=-1)


def categorical_entropy(logits: Array) -> Array:
    logp = jax.nn.log_softmax(logits)
    return -jnp.sum(jnp.exp(logp) * logp, axis=-1)


def categorical_sample(key, logits: Array) -> Array:
    """One-hot sample over the last axis."""
    idx = jax.random.categorical(key, logits)
    return jax.nn.one_hot(idx, logits.shape[-1], dtype=logits.dtype)


def gaussian_logp(mean: Array, log_std: Array, action: Array) -> Array:
    """Diagonal-Gaussian log density, summed over action dims."""
    var = jnp.exp(2 * log_std)
    return jnp.sum(
        -0.5 * ((action - mean) ** 2 / var) - log_std - 0.5 * jnp.log(2 * jnp.pi),
        axis=-1,
    )


def gaussian_entropy(log_std: Array) -> Array:
    return jnp.sum(log_std + 0.5 * jnp.log(2 * jnp.pi * jnp.e), axis=-1)


def gaussian_sample(key, mean: Array, log_std: Array) -> Array:
    return mean + jnp.exp(log_std) * jax.random.normal(key, mean.shape, mean.dtype)


class GRUPolicy(nn.Module):
    """Recurrent actor core: obs embed → GRU → Gaussian head.

    The recurrent (`r*`) variants of the reference zoo — rmappo is the tuned
    default (``train/mappo/train_formation.sh:13``), and the offpolicy side
    exposes rmaddpg/rmatd3/rmasac with rnn chunking
    (``train/maddpg-v5/config.py:89-90``)."""

    act_dim: int
    hidden: int = 64
    discrete: bool = False  # logits head instead of the Gaussian head

    @nn.compact
    def __call__(self, carry: Array, obs: Array, reset: Array):
        """One step: carry [., H], obs [., do], reset [.] bool (zeroes the
        carry at episode starts).  Returns (new_carry, dist) where dist is
        (mean, log_std) or, when ``discrete``, per-action logits."""
        x = nn.relu(nn.Dense(self.hidden, kernel_init=orthogonal_init())(obs))
        carry = jnp.where(reset[..., None], 0.0, carry)
        carry, h = nn.GRUCell(self.hidden)(carry, x)
        out = nn.Dense(self.act_dim, kernel_init=orthogonal_init(0.01))(h)
        if self.discrete:
            return carry, out
        log_std = self.param(
            "log_std", nn.initializers.constant(0.0), (self.act_dim,)
        )
        log_std = soft_bound(log_std, -5.0, 2.0)
        return carry, (out, jnp.broadcast_to(log_std, out.shape))

    def initial_carry(self, batch_shape) -> Array:
        return jnp.zeros(tuple(batch_shape) + (self.hidden,))


class GRUCritic(nn.Module):
    """Recurrent centralized value core: share_obs → GRU → V."""

    hidden: int = 64

    @nn.compact
    def __call__(self, carry: Array, share_obs: Array, reset: Array):
        x = nn.relu(nn.Dense(self.hidden, kernel_init=orthogonal_init())(share_obs))
        carry = jnp.where(reset[..., None], 0.0, carry)
        carry, h = nn.GRUCell(self.hidden)(carry, x)
        v = nn.Dense(1, kernel_init=orthogonal_init(1.0))(h).squeeze(-1)
        return carry, v

    def initial_carry(self, batch_shape) -> Array:
        return jnp.zeros(tuple(batch_shape) + (self.hidden,))
