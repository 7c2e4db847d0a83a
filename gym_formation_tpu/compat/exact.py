"""Exact-match harness: reference-RNG resets and state injection.

The reference seeds the *global* numpy MT19937 (``environment.py:106-110``)
and draws reset state from it in a fixed order.  Bit-for-bit rollout parity
under a fixed seed therefore needs (a) the same draw sequence on the host and
(b) a way to load those numbers into an :class:`EnvState`.  ``host_reset``
replays the documented draw order per scenario with ``np.random``;
``state_from_numpy`` loads any host-side reset (including one captured from
the reference itself) into the device pytree.

Native (non-exact) mode uses per-env ``jax.random`` keys instead — these
helpers exist for golden tests and migration.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp

from ..core.types import EnvState
from ..envs.scenario import Scenario


def state_from_numpy(
    scenario: Scenario,
    agent_pos: np.ndarray,
    landmark_pos: np.ndarray,
    agent_vel: Optional[np.ndarray] = None,
    landmark_vel: Optional[np.ndarray] = None,
    ideal_shape: Optional[np.ndarray] = None,
    ideal_vel: Optional[np.ndarray] = None,
    t: int = 0,
    key=None,
    dtype=None,
) -> EnvState:
    """Build an :class:`EnvState` from host arrays (e.g. a captured reference
    reset)."""
    cfg = scenario.cfg
    dtype = dtype or scenario.dtype
    if key is None:
        import jax

        key = jax.random.PRNGKey(0)
    z = lambda a, shape: (
        jnp.zeros(shape, dtype) if a is None else jnp.asarray(a, dtype)
    )
    pos = jnp.concatenate(
        [jnp.asarray(agent_pos, dtype), jnp.asarray(landmark_pos, dtype)]
    )
    vel = jnp.concatenate(
        [
            z(agent_vel, (cfg.n_agents, cfg.dim_p)),
            z(landmark_vel, (cfg.n_landmarks, cfg.dim_p)),
        ]
    )
    return EnvState(
        pos=pos,
        vel=vel,
        c=jnp.zeros((cfg.n_agents, cfg.dim_c), dtype),
        ideal_shape=z(ideal_shape, (cfg.n_landmarks, cfg.dim_p)),
        ideal_vel=z(ideal_vel, (cfg.dim_p,)),
        t=jnp.asarray(t, jnp.int32),
        key=key,
    )


def host_reset(scenario: Scenario, seed: Optional[int] = None, rng=None) -> EnvState:
    """Reference-identical reset draws for a scenario.

    With ``seed`` given, seeds a fresh MT19937 exactly like ``env.seed``
    (``environment.py:106-110``, default seed 1) and replays each scenario's
    ``reset_world`` draw order:

    * hd (``formation_hd_env.py:77-95``): per-agent uniform(−1,1,2) → per-
      landmark uniform(−1,1,2) (ideal shape = centered landmark draws) →
      ideal_vel uniform(−1,1,2).
    * basic / partial / partial_range (``basic_formation_env.py:54-65``):
      per-agent draws → per-landmark draws.
    * obs (``formation_hd_obs_env.py:101-120``): per-agent draws → per-target
      draws → per-obstacle banded draws, obstacle vel (0,−1).
    """
    if rng is None:
        rng = np.random.RandomState(1 if seed is None else seed)
    cfg = scenario.cfg
    n = cfg.n_agents
    apos = np.stack([rng.uniform(-1, 1, cfg.dim_p) for _ in range(n)])
    name = scenario.name
    if name == "formation_hd_env":
        draws = np.stack([rng.uniform(-1, 1, cfg.dim_p) for _ in range(cfg.n_landmarks)])
        ideal_vel = rng.uniform(-1, 1, cfg.dim_p)
        return state_from_numpy(
            scenario,
            apos,
            draws,
            ideal_shape=draws - draws.mean(0),
            ideal_vel=ideal_vel,
        )
    if name == "formation_hd_obs_env":
        t, o = scenario.num_targets, scenario.num_obstacles
        tpos = np.stack([rng.uniform(-1, 1, cfg.dim_p) for _ in range(t)])
        band = np.linspace(-1.8, 1.8, o + 1)
        opos = np.stack(
            [rng.uniform([band[k], 2.0], [band[k + 1], 2.5]) for k in range(o)]
        )
        lvel = np.zeros((t + o, cfg.dim_p))
        lvel[t:, 1] = -1.0
        return state_from_numpy(
            scenario, apos, np.concatenate([tpos, opos]), landmark_vel=lvel
        )
    # basic / partial / partial_range: agents then landmarks.
    lpos = np.stack([rng.uniform(-1, 1, cfg.dim_p) for _ in range(cfg.n_landmarks)])
    return state_from_numpy(scenario, apos, lpos)
