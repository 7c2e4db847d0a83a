"""`formation_hd_obs_env`: Hausdorff formation among falling obstacles.

Native rebuild of ``/root/reference/formation_gym/envs/formation_hd_obs_env.py``.
The landmark block holds ``num_landmarks`` static targets followed by
``num_obstacles`` movable, collide-able obstacles spawned along the top edge
and driven downward.  The reference rewrites obstacle velocities *inside the
reward callback* (``:86-89``); here that dynamics law is an explicit
``post_step`` with identical per-step effect (SURVEY §8).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core.types import EnvState, make_world_cfg
from ..ops.distances import center, hausdorff, pairwise_dists
from .scenario import Scenario

Array = jnp.ndarray


class FormationHDObsScenario(Scenario):
    name = "formation_hd_obs_env"

    def __init__(
        self,
        num_agents: int = 4,
        num_landmarks: int = 4,
        num_obstacles: int = 3,
        world_length: int = 50,
        dtype=jnp.float32,
    ):
        self.num_targets = num_landmarks
        self.num_obstacles = num_obstacles
        # Agents size 0.1; targets size 0.02 non-collide static; obstacles
        # size 0.15, collide + movable (``formation_hd_obs_env.py:24-44``).
        self.cfg = make_world_cfg(
            num_agents,
            num_landmarks + num_obstacles,
            agent_size=0.1,
            landmark_size=np.array([0.02] * num_landmarks + [0.15] * num_obstacles),
            landmark_collide=np.array([False] * num_landmarks + [True] * num_obstacles),
            landmark_movable=np.array([False] * num_landmarks + [True] * num_obstacles),
            world_length=world_length,
        )
        self.dtype = dtype
        self.obs_dim = 2 + 2 * (num_landmarks + num_obstacles) + 4 * (num_agents - 1)

    def reset(self, key: Array) -> EnvState:
        """Agents and targets uniform in [−1,1]²; obstacle k uniform in its
        horizontal band [step_k, step_{k+1}] × [2.0, 2.5] with initial
        velocity (0,−1) (``formation_hd_obs_env.py:101-120``)."""
        n, t, o = self.n, self.num_targets, self.num_obstacles
        k1, k2, k3, carry = jax.random.split(key, 4)
        apos = self._uniform(k1, (n, 2))
        tpos = self._uniform(k2, (t, 2))
        band = np.linspace(-1.8, 1.8, o + 1)
        lo = jnp.asarray(np.stack([band[:-1], np.full(o, 2.0)], -1), self.dtype)
        hi = jnp.asarray(np.stack([band[1:], np.full(o, 2.5)], -1), self.dtype)
        opos = lo + jax.random.uniform(k3, (o, 2), self.dtype) * (hi - lo)
        state = self.zero_state(carry)
        vel = state.vel.at[n + t :, 1].set(-1.0)
        return state.replace(pos=jnp.concatenate([apos, tpos, opos]), vel=vel)

    def observe(self, state: EnvState) -> Array:
        """[N, 2 + 2(T+O) + 4(N−1)]: [p_vel | targets_abs | obstacles_rel |
        others_rel | comm] — note targets are *absolute* while obstacles are
        relative (``formation_hd_obs_env.py:55-69``)."""
        n, t = self.n, self.num_targets
        apos = self.agent_pos(state)
        targets = jnp.broadcast_to(state.pos[n : n + t].reshape(-1), (n, 2 * t))
        obst_rel = (state.pos[n + t :][None, :, :] - apos[:, None, :]).reshape(n, -1)
        return jnp.concatenate(
            [
                self.agent_vel(state),
                targets,
                obst_rel,
                self._others_rel(apos),
                self._others_comm(state),
            ],
            axis=1,
        )

    def reward(self, state: EnvState) -> Array:
        """−Hausdorff(centered agents, centered targets) − 2 per agent-agent
        collision (self excluded) − 2 per agent-obstacle collision
        (``formation_hd_obs_env.py:71-99``), threshold s1+s2."""
        n, t = self.n, self.num_targets
        apos = self.agent_pos(state)
        shared = -hausdorff(center(apos), center(state.pos[n : n + t]))
        coll_aa = jnp.sum(self._collision_matrix(state) & ~jnp.eye(n, dtype=bool), axis=1)
        opos = state.pos[n + t :]
        d_ao = pairwise_dists(apos, opos)
        s_a = jnp.asarray(self.cfg.size[:n], d_ao.dtype)
        s_o = jnp.asarray(self.cfg.size[n + t :], d_ao.dtype)
        coll_ao = jnp.sum(d_ao < (s_a[:, None] + s_o[None, :]), axis=1)
        return shared - 2.0 * (coll_aa + coll_ao).astype(self.dtype)

    def post_step(self, state: EnvState) -> EnvState:
        """Obstacle driving law: vel ← (0,−1) while y > −2.2, else (0,0) —
        the reward-callback side effect of ``formation_hd_obs_env.py:86-89``."""
        n, t = self.n, self.num_targets
        falling = state.pos[n + t :, 1] > -2.2
        zero = jnp.zeros_like(falling, self.dtype)
        ovel = jnp.stack([zero, jnp.where(falling, zero - 1.0, zero)], -1)
        return state.replace(vel=state.vel.at[n + t :].set(ovel))
