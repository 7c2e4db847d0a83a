"""Scenario protocol: pure-function workload definitions.

The reference wires scenarios into the env as *callbacks on mutable world
objects* loaded by file path via ``imp.load_source``
(``/root/reference/formation_gym/__init__.py:6-17``,
``formation_gym/scenario.py:4-12``).  Here a scenario is a small class of
*pure* JAX functions over :class:`~gym_formation_tpu.core.types.EnvState`
plus a static :class:`~gym_formation_tpu.core.types.WorldCfg`; the env layer
jits/vmaps them.  Side-effecting callback quirks of the reference (obs
recentering landmarks, reward rewriting obstacle velocities — SURVEY §8) are
re-expressed as explicit ``pre_obs`` / ``post_step`` phases with identical
per-step net effect.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp

from ..core.types import EnvState, WorldCfg
from ..ops.distances import pairwise_dists

Array = jnp.ndarray


class Scenario:
    """Base scenario.  Subclasses set ``cfg`` and implement reset/observe/reward.

    Mirrors the surface of ``BaseScenario`` (``scenario.py:4-12``) +
    ``benchmark_data``, as pure functions.
    """

    name: str = "base"
    cfg: WorldCfg
    obs_dim: int
    dtype = jnp.float32
    # Collision predicate threshold factor: reference uses (s1+s2)/2 in the hd
    # scenario (``envs/formation_hd_env.py:121``) but s1+s2 everywhere else
    # (``envs/basic_formation_env.py:89-91``) — SURVEY §8.3.
    collision_factor: float = 1.0

    # -- helpers ------------------------------------------------------------
    @property
    def n(self) -> int:
        return self.cfg.n_agents

    def agent_pos(self, state: EnvState) -> Array:
        return state.pos[: self.cfg.n_agents]

    def agent_vel(self, state: EnvState) -> Array:
        return state.vel[: self.cfg.n_agents]

    def landmark_pos(self, state: EnvState) -> Array:
        return state.pos[self.cfg.n_agents :]

    def _collision_matrix(self, state: EnvState) -> Array:
        """[N,N] bool: agents i,j closer than threshold (diag is True: the
        reference's ``is_collision(a, a)`` is True at distance 0; callers
        exclude/include self to match each reference code path)."""
        apos = self.agent_pos(state)
        d = pairwise_dists(apos, apos)
        s = jnp.asarray(self.cfg.size[: self.n], d.dtype)
        thresh = (s[:, None] + s[None, :]) * self.collision_factor
        return d < thresh

    def _uniform(self, key, shape):
        return jax.random.uniform(key, shape, self.dtype, -1.0, 1.0)

    def _others_rel(self, pos_a: Array) -> Array:
        """[N, 2(N-1)] relative positions of every other agent, in agent-index
        order with self removed — the ``for other in world.agents: if other is
        agent: continue`` pattern (``envs/formation_hd_env.py:54-57``)."""
        n = pos_a.shape[0]
        rel = pos_a[None, :, :] - pos_a[:, None, :]  # [self, other, 2]
        mask = ~np.eye(n, dtype=bool)
        idx = np.nonzero(mask)[1].reshape(n, n - 1)  # static gather indices
        return jnp.take_along_axis(rel, jnp.asarray(idx)[:, :, None], axis=1).reshape(
            n, 2 * (n - 1)
        )

    def _others_comm(self, state: EnvState) -> Array:
        """[N, (N-1)*dim_c] comm of others, self removed (same ordering)."""
        n = self.n
        c = jnp.broadcast_to(state.c[None], (n, n, self.cfg.dim_c))
        mask = ~np.eye(n, dtype=bool)
        idx = np.nonzero(mask)[1].reshape(n, n - 1)
        return jnp.take_along_axis(c, jnp.asarray(idx)[:, :, None], axis=1).reshape(
            n, (n - 1) * self.cfg.dim_c
        )

    # -- protocol -----------------------------------------------------------
    def reset(self, key: Array) -> EnvState:
        raise NotImplementedError

    def pre_obs(self, state: EnvState) -> EnvState:
        """State adjustment the reference performs inside the first obs
        callback of the step (default: none)."""
        return state

    def observe(self, state: EnvState) -> Array:
        raise NotImplementedError

    def reward(self, state: EnvState) -> Array:
        """Per-agent individual rewards [N]."""
        raise NotImplementedError

    def post_step(self, state: EnvState) -> EnvState:
        """State adjustment the reference performs via reward-callback side
        effects, applied once after obs/reward are computed (default: none)."""
        return state

    # Scripted agents (``core.py:151-154,210-211``: agents whose
    # ``action_callback`` drives them instead of the policy).  No shipped
    # scenario uses them; the hook exists for custom scenarios.
    scripted_mask = None  # optional np.ndarray [n_agents] bool

    def scripted_actions(self, state: EnvState) -> Array:
        """Control for scripted agents [n_agents, dim_p]; rows where
        ``scripted_mask`` is False are ignored."""
        raise NotImplementedError

    def benchmark(self, state: EnvState) -> Dict[str, Array]:
        """The reward/collisions/min_dists/occupied_landmarks quartet
        (``envs/formation_hd_env.py:97-117``).  ``collisions`` counts self
        (distance 0 passes ``is_collision``) exactly like the reference."""
        rew = self.reward(state)
        collisions = jnp.sum(self._collision_matrix(state), axis=1)
        d = pairwise_dists(self.agent_pos(state), self.benchmark_landmarks(state))
        lmin = jnp.min(d, axis=0)
        return {
            "reward": rew,
            "collisions": collisions.astype(rew.dtype),
            "min_dists": jnp.broadcast_to(jnp.sum(lmin), rew.shape),
            "occupied_landmarks": jnp.broadcast_to(
                jnp.sum(lmin < 0.1).astype(rew.dtype), rew.shape
            ),
        }

    def benchmark_landmarks(self, state: EnvState) -> Array:
        """Landmark set used by benchmark min-dist stats (all landmarks,
        including obstacles, per the reference loops over ``world.landmarks``)."""
        return self.landmark_pos(state)

    def zero_state(self, key: Array) -> EnvState:
        """Blank state skeleton with correct shapes/dtypes."""
        cfg = self.cfg
        z = lambda *s: jnp.zeros(s, self.dtype)
        return EnvState(
            pos=z(cfg.n_entities, cfg.dim_p),
            vel=z(cfg.n_entities, cfg.dim_p),
            c=z(cfg.n_agents, cfg.dim_c),
            ideal_shape=z(cfg.n_landmarks, cfg.dim_p),
            ideal_vel=z(cfg.dim_p),
            t=jnp.zeros((), jnp.int32),
            key=key,
        )
