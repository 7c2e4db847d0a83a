"""`formation_hd_partial_env` and `formation_hd_partial_range_env`:
Hausdorff formation under partial observability.

Native rebuilds of
``/root/reference/formation_gym/envs/formation_hd_partial_env.py`` (each agent
sees only the next ``num_obs`` agents, ring-indexed by agent id, ``:49-54``)
and ``formation_hd_partial_range_env.py`` (relative positions clipped to
±``obs_range``, ``:49-53``).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core.types import EnvState, make_world_cfg
from ..ops.distances import center, hausdorff
from .scenario import Scenario

Array = jnp.ndarray


class _HausdorffPartialBase(Scenario):
    """Shared reward/reset: −Hausdorff(centered agents, centered landmarks)
    − 1 per agent-agent collision (self excluded), threshold s1+s2
    (``formation_hd_partial_env.py:68-99``)."""

    def _init_world(self, num_agents, num_landmarks, world_length, dtype):
        self.cfg = make_world_cfg(
            num_agents,
            num_landmarks,
            agent_size=0.04,
            landmark_size=0.02,
            world_length=world_length,
        )
        self.dtype = dtype

    def reset(self, key: Array) -> EnvState:
        k1, k2, carry = jax.random.split(key, 3)
        apos = self._uniform(k1, (self.n, 2))
        lpos = self._uniform(k2, (self.cfg.n_landmarks, 2))
        return self.zero_state(carry).replace(pos=jnp.concatenate([apos, lpos]))

    def reward(self, state: EnvState) -> Array:
        apos = self.agent_pos(state)
        shared = -hausdorff(center(apos), center(self.landmark_pos(state)))
        coll = self._collision_matrix(state) & ~jnp.eye(self.n, dtype=bool)
        return shared - jnp.sum(coll, axis=1).astype(self.dtype)

    def _landmarks_abs(self, state: EnvState) -> Array:
        return jnp.broadcast_to(
            self.landmark_pos(state).reshape(-1), (self.n, 2 * self.cfg.n_landmarks)
        )


class FormationHDPartialScenario(_HausdorffPartialBase):
    name = "formation_hd_partial_env"

    def __init__(
        self,
        num_agents: int = 5,
        num_landmarks: int = 5,
        num_obs: int = 3,
        world_length: int = 25,
        dtype=jnp.float32,
    ):
        self._init_world(num_agents, num_landmarks, world_length, dtype)
        self.num_obs = num_obs
        self.obs_dim = 2 + 2 * self.cfg.n_landmarks + 2 * num_obs + 2 * (num_agents - 1)
        # Static ring gather: agent i observes agents (i+1 .. i+num_obs) mod N
        # (``formation_hd_partial_env.py:51-54``).
        self._ring = np.stack(
            [np.arange(1, num_obs + 1) + i for i in range(num_agents)]
        ) % num_agents

    def observe(self, state: EnvState) -> Array:
        """[N, 2 + 2L + 2·num_obs + 2(N−1)]: [p_vel | landmarks_abs |
        ring-neighbors rel | comm(all others)]."""
        apos = self.agent_pos(state)
        ring_rel = (apos[jnp.asarray(self._ring)] - apos[:, None, :]).reshape(self.n, -1)
        return jnp.concatenate(
            [
                self.agent_vel(state),
                self._landmarks_abs(state),
                ring_rel,
                self._others_comm(state),
            ],
            axis=1,
        )


class FormationHDPartialRangeScenario(_HausdorffPartialBase):
    name = "formation_hd_partial_range_env"

    def __init__(
        self,
        num_agents: int = 4,
        num_landmarks: int = 4,
        obs_range: float = 0.7,
        world_length: int = 25,
        dtype=jnp.float32,
    ):
        self._init_world(num_agents, num_landmarks, world_length, dtype)
        self.obs_range = obs_range
        self.obs_dim = 2 + 2 * self.cfg.n_landmarks + 4 * (num_agents - 1)

    def observe(self, state: EnvState) -> Array:
        """[N, 2 + 2L + 4(N−1)]: [p_vel | landmarks_abs | clip(others_rel,
        ±obs_range) | comm] (``formation_hd_partial_range_env.py:41-54``)."""
        apos = self.agent_pos(state)
        rel = jnp.clip(self._others_rel(apos), -self.obs_range, self.obs_range)
        return jnp.concatenate(
            [self.agent_vel(state), self._landmarks_abs(state), rel, self._others_comm(state)],
            axis=1,
        )
