"""`basic_formation_env`: MPE simple-spread style landmark coverage.

Native rebuild of ``/root/reference/formation_gym/envs/basic_formation_env.py``
(which in the reference imports the *external* ``multiagent`` package —
SURVEY §8.7; here it runs on the same native core as every other scenario).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.types import EnvState, make_world_cfg
from ..ops.distances import pairwise_dists
from .scenario import Scenario

Array = jnp.ndarray


class BasicFormationScenario(Scenario):
    """Cover the landmarks: reward = −Σ_l min_a dist(a,l) − 1 per collision
    (``basic_formation_env.py:43-52``), collision threshold s1+s2."""

    name = "basic_formation_env"

    def __init__(
        self, num_agents: int = 3, num_landmarks: int = 3, world_length: int = 50,
        dtype=jnp.float32,
    ):
        # Agent size 0.1, landmarks default size, non-collide/static
        # (``basic_formation_env.py:13-24``); episode length defaults to the
        # world default 50 (``core.py:113``).
        self.cfg = make_world_cfg(
            num_agents, num_landmarks, agent_size=0.1, world_length=world_length
        )
        self.dtype = dtype
        self.obs_dim = 4 + 2 * num_landmarks + 4 * (num_agents - 1)

    def reset(self, key: Array) -> EnvState:
        k1, k2, carry = jax.random.split(key, 3)
        apos = self._uniform(k1, (self.n, 2))
        lpos = self._uniform(k2, (self.cfg.n_landmarks, 2))
        return self.zero_state(carry).replace(pos=jnp.concatenate([apos, lpos]))

    def observe(self, state: EnvState) -> Array:
        """[N, 4 + 2L + 4(N−1)]: [p_vel | p_pos | landmarks_rel(2L) |
        others_rel(2N−2) | comm(2N−2)] (``basic_formation_env.py:29-41``)."""
        apos = self.agent_pos(state)
        lrel = (state.pos[self.n :][None, :, :] - apos[:, None, :]).reshape(self.n, -1)
        return jnp.concatenate(
            [
                self.agent_vel(state),
                apos,
                lrel,
                self._others_rel(apos),
                self._others_comm(state),
            ],
            axis=1,
        )

    def reward(self, state: EnvState) -> Array:
        d = pairwise_dists(self.agent_pos(state), self.landmark_pos(state))
        shared = -jnp.sum(jnp.min(d, axis=0))
        coll = self._collision_matrix(state)
        # The reference counts every agent with ``is_collision(a, agent)``
        # WITHOUT excluding self (``basic_formation_env.py:48-51``) — self is
        # always a "collision" (dist 0), so each agent pays an extra −1.
        per_agent = jnp.sum(coll, axis=1)
        return shared - per_agent.astype(self.dtype)
