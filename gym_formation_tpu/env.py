"""Functional multi-agent environment API.

TPU-native replacement for the reference ``MultiAgentEnv``
(``/root/reference/formation_gym/environment.py:11-236``).  Instead of a
stateful object mutated per step, :class:`FormationEnv` exposes pure
``reset(key) -> (state, obs)`` and ``step(state, actions) -> (state,
StepOut)`` over one environment; :class:`VecFormationEnv` jits + vmaps them
over an env batch (optionally sharded over a device mesh).  This collapses the
reference's SubprocVecEnv pipe protocol (``train/maddpg-v4/wrapper.py``) into
a single compiled program: episode bookkeeping, time-limit dones
(``environment.py:172-178``), shared-reward broadcast
(``environment.py:135-138``) and worker-side auto-reset
(``train/maddpg-v4/wrapper.py:140-145``) all run inside jit.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from . import spaces
from .core.physics import world_step
from .core.types import EnvState, StepOut
from .envs.scenario import Scenario

Array = jnp.ndarray

# Discrete action index → movement direction, the ``discrete_action_input``
# decoding of ``environment.py:194-204`` (0: noop, 1:-x, 2:+x, 3:-y, 4:+y).
_DISCRETE_MOVES = np.array(
    [[0.0, 0.0], [-1.0, 0.0], [1.0, 0.0], [0.0, -1.0], [0.0, 1.0]]
)

# The benchmark_data quartet (``envs/formation_hd_env.py:97-117``).
BENCHMARK_KEYS = ("reward", "collisions", "min_dists", "occupied_landmarks")


def benchmark_means(info: dict) -> dict:
    """Scalar means of the benchmark quartet present in a step's ``info``
    (populated when the env was built with ``benchmark=True``) under
    ``bench_*`` keys — the training-time equivalent of the reference's
    ``make_env(benchmark=True)`` info_callback instrumentation
    (``formation_gym/__init__.py:13-14``).  Empty dict otherwise, so collect
    loops can thread it unconditionally."""
    return {f"bench_{k}": jnp.mean(info[k]) for k in BENCHMARK_KEYS if k in info}


class FormationEnv:
    """One formation-control environment as a pair of pure functions.

    Args:
      scenario: scenario instance (see :mod:`gym_formation_tpu.envs`).
      benchmark: include the benchmark_data quartet in ``info`` (the
        ``make_env(benchmark=True)`` path, ``__init__.py:13-14``).
      auto_reset: re-draw a fresh episode inside ``step`` when the episode
        ends (vec-env worker behavior, inside jit).
      discrete_action: 5-way one-hot action decoding instead of continuous
        (``environment.py:64-65,206-210``).
      discrete_action_input: actions are integer indices (``:194-204``).
      force_discrete_action: continuous actions are snapped to a one-hot
        over the first ``dim_p`` entries before scaling — the reference's
        ``force_discrete_action`` attribute (``environment.py:212-215``;
        driven by ``world.discrete_action``, which no shipped scenario
        sets — kept for surface parity).
    """

    def __init__(
        self,
        scenario: Scenario,
        benchmark: bool = False,
        auto_reset: bool = True,
        discrete_action: bool = False,
        discrete_action_input: bool = False,
        force_discrete_action: bool = False,
    ):
        self.scenario = scenario
        self.cfg = scenario.cfg
        self.benchmark = benchmark
        self.auto_reset = auto_reset
        self.discrete_action = discrete_action
        self.discrete_action_input = discrete_action_input
        self.force_discrete_action = force_discrete_action
        cfg = self.cfg
        n = cfg.n_agents
        self.num_agents = n
        self.world_length = cfg.world_length
        self.shared_reward = cfg.collaborative
        # sensitivity = accel if set else 5.0, applied to the control before
        # the physics' own mass*(accel or 1) factor (``environment.py:218-221``
        # — the reference double-applies accel; scenarios here never set it).
        # Explicit in WorldCfg; the accel-derived fallback only serves
        # hand-built configs predating the field.
        if cfg.sensitivity is not None:
            self._sensitivity = np.asarray(cfg.sensitivity)
        else:
            accel = cfg.act_coef / cfg.mass[:n]
            self._sensitivity = np.where(np.isclose(accel, 1.0), 5.0, accel)
        self._all_silent = bool(np.all(cfg.silent))

        # Spaces (``environment.py:56-96``).
        self.action_space = []
        self.observation_space = []
        for i in range(n):
            if discrete_action:
                u_space = spaces.Discrete(cfg.dim_p * 2 + 1)
            else:
                u_space = spaces.Box(-cfg.u_range, cfg.u_range, (cfg.dim_p,))
            if cfg.silent[i]:
                self.action_space.append(u_space)
            else:
                c_space = (
                    spaces.Discrete(cfg.dim_c)
                    if discrete_action
                    else spaces.Box(0.0, 1.0, (cfg.dim_c,))
                )
                self.action_space.append(spaces.Tuple((u_space, c_space)))
            self.observation_space.append(
                spaces.Box(-np.inf, np.inf, (scenario.obs_dim,))
            )
        share_dim = scenario.obs_dim * n
        self.share_observation_space = [
            spaces.Box(-np.inf, np.inf, (share_dim,)) for _ in range(n)
        ]

    # -- action layout ------------------------------------------------------
    @property
    def act_dim(self) -> int:
        """Flat per-agent action width fed to :meth:`step`."""
        if self.discrete_action_input:
            return 1
        move = 5 if self.discrete_action else self.cfg.dim_p
        comm = 0 if self._all_silent else self.cfg.dim_c
        return move + comm

    def _decode_actions(self, actions: Array) -> Tuple[Array, Optional[Array]]:
        """[N, act_dim] → physical control u [N, dim_p] (sensitivity-scaled)
        and comm action (or None).  ``environment.py:187-236``."""
        cfg = self.cfg
        if self.discrete_action_input:
            idx = actions.reshape(-1).astype(jnp.int32)
            u = jnp.asarray(_DISCRETE_MOVES, jnp.float32)[idx]
            comm = None
        elif self.discrete_action:
            u = jnp.stack(
                [actions[:, 1] - actions[:, 2], actions[:, 3] - actions[:, 4]], -1
            )
            comm = None if self._all_silent else actions[:, 5 : 5 + cfg.dim_c]
        else:
            u = actions[:, : cfg.dim_p]
            if self.force_discrete_action:
                # snap to a one-hot over dim_p (``environment.py:212-215``:
                # argmax, zero the vector, set 1.0 at the argmax)
                idx = jnp.argmax(u, axis=-1)
                u = jax.nn.one_hot(idx, cfg.dim_p, dtype=u.dtype)
            comm = (
                None
                if self._all_silent
                else actions[:, cfg.dim_p : cfg.dim_p + cfg.dim_c]
            )
        u = u * jnp.asarray(self._sensitivity, u.dtype)[:, None]
        return u, comm

    # -- pure env functions -------------------------------------------------
    def reset(self, key: Array) -> Tuple[EnvState, Array]:
        """Fresh episode: scenario reset + initial observations
        (``environment.py:144-156``)."""
        state = self.scenario.pre_obs(self.scenario.reset(key))
        return state, self.scenario.observe(state)

    def step(self, state: EnvState, actions: Array) -> Tuple[EnvState, StepOut]:
        """Advance one step.  ``actions``: [n_agents, act_dim]."""
        scen, cfg = self.scenario, self.cfg
        u, comm = self._decode_actions(actions)
        if scen.scripted_mask is not None:
            # scripted agents override the policy control (core.py:210-211)
            mask = jnp.asarray(scen.scripted_mask)[:, None]
            u = jnp.where(mask, scen.scripted_actions(state).astype(u.dtype), u)
        key, k_noise, k_reset = jax.random.split(state.key, 3)
        pos, vel = world_step(
            state.pos, state.vel, u.astype(state.pos.dtype), cfg,
            k_noise if cfg.has_noise() else None,
        )
        # Comm state update (``core.py:279-286``): silent agents emit zeros.
        if self._all_silent or comm is None:
            c = jnp.zeros_like(state.c)
        else:
            silent = jnp.asarray(cfg.silent)[:, None]
            c = jnp.where(silent, 0.0, comm.astype(state.c.dtype))
        state = state.replace(pos=pos, vel=vel, c=c, t=state.t + 1, key=key)

        state = scen.pre_obs(state)
        obs = scen.observe(state)
        indiv = scen.reward(state)
        if self.shared_reward:
            reward = jnp.broadcast_to(jnp.sum(indiv), indiv.shape)
        else:
            reward = indiv
        done_flag = state.t >= self.world_length
        done = jnp.broadcast_to(done_flag, (cfg.n_agents,))
        info = {"individual_reward": indiv}
        if self.benchmark:
            info.update(scen.benchmark(state))
        state = scen.post_step(state)

        if self.auto_reset:
            # keep the true pre-reset observation available for off-policy
            # bootstrapping (unused consumers are DCE'd by XLA)
            info["terminal_obs"] = obs
            reset_state, reset_obs = self.reset(k_reset)
            state = jax.tree.map(
                lambda a, b: jnp.where(
                    jnp.reshape(done_flag, (1,) * a.ndim), a, b
                ),
                reset_state,
                state,
            )
            obs = jnp.where(done_flag, reset_obs, obs)
        return state, StepOut(obs=obs, reward=reward, done=done, info=info)

    def sample_actions(self, key: Array) -> Array:
        """Uniform random joint action [n_agents, act_dim] (the ``test.py -r``
        driver path)."""
        if self.discrete_action_input:
            return jax.random.randint(key, (self.num_agents, 1), 0, 5)
        return jax.random.uniform(
            key,
            (self.num_agents, self.act_dim),
            jnp.float32,
            -self.cfg.u_range,
            self.cfg.u_range,
        )


class VecFormationEnv:
    """A batch of identical envs stepping in lockstep under one jit.

    The TPU-native replacement for ``SubprocVecEnv``/``DummyVecEnv``
    (``train/maddpg-v2/utils/env_wrappers.py:9-129``): the batch is a leading
    axis of the state pytree, optionally sharded over a mesh axis so the
    fleet spans chips/hosts with zero host involvement.
    """

    def __init__(self, env: FormationEnv, num_envs: int, sharding=None):
        self.env = env
        self.num_envs = num_envs
        self.sharding = sharding
        donate = dict(donate_argnums=(0,))
        self._reset = jax.jit(jax.vmap(env.reset), out_shardings=sharding)
        self._step = jax.jit(
            jax.vmap(env.step), out_shardings=sharding, **donate
        )

        def _choose(state, obs, keys, choose):
            fresh_state, fresh_obs = jax.vmap(env.reset)(keys)
            sel = lambda a, b: jnp.where(
                choose.reshape((-1,) + (1,) * (a.ndim - 1)), a, b
            )
            return jax.tree.map(sel, fresh_state, state), sel(fresh_obs, obs)

        # no donation: callers routinely keep the pre-reset state/obs around
        # (e.g. to log terminal stats), and this is not a hot path
        self._reset_choose = jax.jit(_choose, out_shardings=sharding)

    def reset(self, key: Array):
        keys = jax.random.split(key, self.num_envs)
        return self._reset(keys)

    def reset_choose(self, state, obs, key: Array, choose):
        """Selectively re-draw fresh episodes for envs where ``choose`` is
        True, leaving the rest untouched — the Choose* vec-env capability
        (``train/maddpg-v4/wrapper.py:225-486`` ``reset_choose``), as one
        jitted select instead of per-worker pipe commands.

        Args:
          state, obs: current batched env state and observations.
          key: PRNG key (split per env; only chosen envs consume theirs).
          choose: [num_envs] bool mask.
        Returns ``(state, obs)`` with chosen envs freshly reset."""
        keys = jax.random.split(key, self.num_envs)
        return self._reset_choose(state, obs, keys, jnp.asarray(choose))

    def step(self, state, actions: Array):
        """state, actions [B, N, act_dim] → (state, StepOut batched)."""
        return self._step(state, actions)

    def sample_actions(self, key: Array) -> Array:
        keys = jax.random.split(key, self.num_envs)
        return jax.vmap(self.env.sample_actions)(keys)


def rollout(
    env: FormationEnv,
    policy_fn,
    state: EnvState,
    obs: Array,
    key: Array,
    length: int,
):
    """Scan ``length`` env steps with ``policy_fn(obs, key) -> actions``.

    Single-env version; vmap for a batch.  Returns ``(state, obs)`` carry and
    stacked :class:`StepOut`.  The entire loop compiles to one XLA scan — the
    replacement for the trainer-side Python step loops
    (``train/maddpg-v1/runner.py:31-54``).
    """

    def body(carry, _):
        st, ob, k = carry
        k, k_act = jax.random.split(k)
        actions = policy_fn(ob, k_act)
        st, out = env.step(st, actions)
        return (st, out.obs, k), out

    (state, obs, _), outs = jax.lax.scan(
        body, (state, obs, key), None, length=length
    )
    return (state, obs), outs


def rollout_stateonly(
    env: FormationEnv,
    policy_fn,
    state: EnvState,
    key: Array,
    length: int,
):
    """Memory-lean rollout: carries ONLY the env state and recomputes the
    observation from it each step instead of threading obs through the scan
    carry.  At large scale the obs carry dominates memory (e.g. N=243 ×
    B=8192: three 11.6 GB [B, N, 6N] buffers live at once under
    :func:`rollout`); recomputing keeps a single in-flight obs.  Returns the
    final state and the per-step rewards [T, n_agents]."""

    def body(carry, _):
        st, k = carry
        obs = env.scenario.observe(env.scenario.pre_obs(st))
        k, k_act = jax.random.split(k)
        actions = policy_fn(obs, k_act)
        st, out = env.step(st, actions)
        return (st, k), out.reward

    (state, _), rewards = jax.lax.scan(body, (state, key), None, length=length)
    return state, rewards


def rollout_statepolicy(
    env: FormationEnv,
    state_policy_fn,
    state: EnvState,
    key: Array,
    length: int,
):
    """Rollout for policies that consume the ``EnvState`` directly
    (``state_policy_fn(state, key) -> actions``), e.g.
    :func:`~gym_formation_tpu.models.bfs.bfs_actions_from_state` closures.

    No observation tensor is ever materialized: the [N, 6N] obs is O(N²)
    per agent and dominates HBM traffic at large N, while scripted and
    hierarchical controllers only need O(N) state quantities.  Actions (and
    hence trajectories/rewards) are identical to driving :func:`rollout`
    with the equivalent obs-consuming policy.  Returns the final state and
    per-step rewards [T, n_agents]."""

    def body(carry, _):
        st, k = carry
        k, k_act = jax.random.split(k)
        actions = state_policy_fn(env.scenario.pre_obs(st), k_act)
        st, out = env.step(st, actions)
        return (st, k), out.reward

    (state, _), rewards = jax.lax.scan(body, (state, key), None, length=length)
    return state, rewards


def rollout_statepolicy_rewardsum(
    env: FormationEnv,
    state_policy_fn,
    state: EnvState,
    key: Array,
    length: int,
):
    """:func:`rollout_statepolicy` but accumulating the reward *sum* in the
    scan carry instead of stacking per-step rewards.  The stacked [T, N]
    output is a scan output XLA must materialize — at the large-batch bench
    configs it dominates memory (N=243, B=8192, T=256: an 8.2 GB reward
    tensor, which OOMs the 16 GB chip).  Returns (state, scalar reward sum).
    """

    def body(carry, _):
        st, k, acc = carry
        k, k_act = jax.random.split(k)
        actions = state_policy_fn(env.scenario.pre_obs(st), k_act)
        st, out = env.step(st, actions)
        return (st, k, acc + out.reward.sum()), None

    (state, _, rsum), _ = jax.lax.scan(
        body, (state, key, jnp.zeros((), state.pos.dtype)), None, length=length
    )
    return state, rsum


def rollout_statepolicy_fused(
    env: FormationEnv,
    state_policy_fn,
    state: EnvState,
    keys: Array,
    length: int,
    stats: str = "pre",
    tile: int = 16,
    interpret: bool = False,
    policy: str = "external",
    layout: str = "auto",
):
    """Batched rollout driving the fused physics+reward step kernel
    (:func:`~gym_formation_tpu.ops.pallas.fused_step.fused_hd_step`) — the
    N=243 BASELINE fast path.

    Unlike the per-env rollouts above this one is batch-level (the kernel
    wants the whole env batch): ``state`` is a batched ``EnvState`` and
    ``keys`` one PRNG key per env.  Semantics match
    ``vmap(rollout_statepolicy)`` step for step — physics + hd reward +
    shared-reward broadcast + time-limit auto-reset (``environment.py:
    113-178``) — within the fused kernel's f32 tolerance
    (tests/test_fused_rollout_hd.py).

    ``stats="pre"`` runs the off-by-one plane-sharing variant: step t's
    kernel emits the reward statistics of its *input* positions, which are
    step t-1's post-physics positions, so reward t-1 is finalized during
    step t.  On steps where any env auto-reset in between, the statistics
    are recomputed from the carried pre-reset positions (one extra reward
    kernel call under a scalar ``lax.cond`` — with lockstep episodes that is
    1/episode_length of steps).  ``stats="post"`` computes the statistics on
    the integrated positions inside the same kernel call (no restructuring,
    ~one extra triangle sweep per step).

    ``policy="bfs_ez"`` runs the arity-3 BFS + ezpolicy expansion INSIDE the
    fused kernel (models/bfs_planes.py) — ``state_policy_fn`` is then unused
    (the PRNG chain still advances identically, so trajectories stay
    comparable with the step path).  The standard expansion's [B, G, n, 2]
    tensors waste 126/128 lanes per op; in-kernel the whole 5-level
    expansion stays VMEM-resident.

    Returns ``(state, rewards [T, B])`` where ``rewards[t, b]`` is the sum
    over agents of env b's step-t reward vector (the shared-reward broadcast
    included, matching ``StepOut.reward.sum()``).
    """
    from .core import physics as _physics
    from .ops.pallas.fused_step import fused_hd_step
    from .ops.pallas.reward_sym import hd_reward_stats_sym

    scen, cfg = env.scenario, env.cfg
    n = cfg.n_agents
    if layout == "auto":
        layout = "planes" if (policy == "bfs_ez" and stats == "pre") else "arrays"
    assert layout in ("planes", "arrays"), layout
    if layout == "planes":
        assert policy == "bfs_ez" and stats == "pre", (
            "planes layout implemented for the bfs_ez + pre configuration"
        )
        return _rollout_fused_planes(
            env, state, keys, length, tile=tile, interpret=interpret
        )
    sub = _physics._collide_subset(cfg)
    if sub is None:
        lo, hi, sub_cfg = 0, cfg.n_entities, cfg
    else:
        lo, hi, idx, sub_cfg = sub
        assert idx is None and (lo, hi) == (0, n), "fused rollout wants the agent-prefix subset"
    thresh = float(2.0 * cfg.size[0] * scen.collision_factor)
    assert env.shared_reward and env.auto_reset and scen.scripted_mask is None
    assert not cfg.has_noise() and bool(np.all(cfg.silent))
    sens = jnp.asarray(env._sensitivity, jnp.float32)[None, :, None]
    coef = jnp.asarray(cfg.act_coef, jnp.float32)[None, :, None]
    interp = interpret or jax.default_backend() != "tpu"
    assert policy in ("external", "bfs_ez"), policy
    if policy == "bfs_ez":
        import math as _math

        bfs_L = round(_math.log(n, 3))
        assert 3**bfs_L == n, (
            f"policy='bfs_ez' runs the ARITY-3 in-kernel BFS expansion "
            f"(models/bfs_planes.py); N={n} is not a power of 3 — use "
            f"policy='external' with models/bfs.py (any arity, parity-tested)"
        )
        su = np.unique(env._sensitivity), np.unique(cfg.act_coef[:n])
        assert len(su[0]) == 1 and len(su[1]) == 1, "bfs_ez wants uniform scaling"
        act_scale = float(su[0][0] * su[1][0])
    else:
        bfs_L, act_scale = None, None

    def phys_reward(st, actions):
        """Shared step front half: decode, fused kernel, state update."""
        keys3 = jax.vmap(lambda k: jax.random.split(k, 3))(st.key)
        if policy == "bfs_ez":
            aforce = None
            kw = dict(bfs_L=bfs_L, ideal_vel=st.ideal_vel, act_scale=act_scale)
        else:
            aforce = actions.astype(jnp.float32) * sens * coef
            kw = {}
        npos_a, nvel_a, haus, ncoll = fused_hd_step(
            st.pos[:, :n], st.vel[:, :n], aforce, st.ideal_shape, sub_cfg,
            thresh=thresh, stats=stats, tile=tile, interpret=interp, **kw,
        )
        st = st.replace(
            pos=jnp.concatenate([npos_a, st.pos[:, n:]], axis=1),
            vel=jnp.concatenate([nvel_a, st.vel[:, n:]], axis=1),
            c=jnp.zeros_like(st.c),
            t=st.t + 1,
            key=keys3[:, 0],
        )
        st = jax.vmap(scen.pre_obs)(st)
        velterm = -jnp.linalg.norm(
            st.ideal_vel - nvel_a.mean(axis=1), axis=-1
        )  # [B]
        return st, keys3[:, 2], haus, ncoll, velterm

    def finalize(haus, ncoll, velterm):
        """Per-env sum of the step's reward vector, shared-broadcast included
        (``environment.py:135-138``): sum_i broadcast(sum_j indiv_j) ==
        n * (n*(-haus+velterm) - sum ncoll)."""
        return n * (n * (velterm - haus) - ncoll.sum(axis=-1))

    def auto_reset(st, k_reset):
        done = st.t >= env.world_length  # [B]

        def do_reset(st):
            fresh = jax.vmap(lambda k: scen.pre_obs(scen.reset(k)))(k_reset)
            sel = lambda a, b: jnp.where(
                jnp.reshape(done, done.shape + (1,) * (a.ndim - 1)), a, b
            )
            return jax.tree.map(sel, fresh, st)

        # scalar cond: generating a complete fresh episode (uniform draws,
        # landmark recentring, a tree-wide select over ~80 MB of state at
        # N=243 B=2048) every step cost ~0.2 ms/step; with lockstep episodes
        # it is needed on 1/episode_length of steps.  The PRNG chain is
        # untouched (k_reset was split either way), so trajectories are
        # identical to the unconditional select.
        return jax.lax.cond(jnp.any(done), do_reset, lambda s: s, st), done

    if stats == "post":

        def body(carry, _):
            st, k = carry
            ks = jax.vmap(lambda kk: jax.random.split(kk))(k)
            actions = None if policy == "bfs_ez" else jax.vmap(
                state_policy_fn
            )(jax.vmap(scen.pre_obs)(st), ks[:, 1])
            st, k_reset, haus, ncoll, velterm = phys_reward(st, actions)
            r = finalize(haus, ncoll, velterm)
            st, _ = auto_reset(st, k_reset)
            return (st, ks[:, 0]), r

        (state, _), rewards = jax.lax.scan(
            body, (state, keys), None, length=length
        )
        return state, rewards

    # stats == "pre": off-by-one finalization with reset-boundary correction
    B = keys.shape[0]

    def stats_plain(pos_a, ishape):
        return hd_reward_stats_sym(
            pos_a, ishape, thresh=thresh, interpret=interp
        )

    def body(carry, _):
        st, k, prev = carry
        ks = jax.vmap(lambda kk: jax.random.split(kk))(k)
        actions = None if policy == "bfs_ez" else jax.vmap(
            state_policy_fn
        )(jax.vmap(scen.pre_obs)(st), ks[:, 1])
        ishape_t = st.ideal_shape
        st, k_reset, haus_in, ncoll_in, velterm = phys_reward(st, actions)
        post_pos = st.pos[:, :n]  # pre-reset post-physics positions

        # finalize reward t-1: the kernel's input-state statistics are valid
        # for envs that did NOT reset between t-1 and t; the rest recompute
        # from the carried pre-reset positions (scalar cond: skipped
        # entirely on reset-free steps — all but 1/episode_length of steps
        # under lockstep episodes)
        def corrected(_):
            h2, nc2 = stats_plain(prev["pos"], prev["ishape"])
            return (
                jnp.where(prev["done"], h2, haus_in),
                jnp.where(prev["done"][:, None], nc2, ncoll_in),
            )

        haus_prev, ncoll_prev = jax.lax.cond(
            jnp.any(prev["done"]),
            corrected,
            lambda _: (haus_in, ncoll_in),
            None,
        )
        r_prev = finalize(haus_prev, ncoll_prev, prev["velterm"])

        st, done = auto_reset(st, k_reset)
        prev = {
            "pos": post_pos,
            "ishape": ishape_t,
            "velterm": velterm,
            "done": done,
        }
        return (st, ks[:, 0], prev), r_prev

    prev0 = {
        "pos": state.pos[:, :n],
        "ishape": state.ideal_shape,
        "velterm": jnp.zeros((B,), jnp.float32),
        "done": jnp.zeros((B,), bool),
    }
    (state, _, prev), ys = jax.lax.scan(
        body, (state, keys, prev0), None, length=length
    )
    # ys[0] finalized the bogus step -1; the last step finalizes here
    h_last, nc_last = stats_plain(prev["pos"], prev["ishape"])
    r_last = finalize(h_last, nc_last, prev["velterm"])
    rewards = jnp.concatenate([ys[1:], r_last[None]], axis=0)
    return state, rewards


def _rollout_fused_planes(
    env: FormationEnv,
    state: EnvState,
    keys: Array,
    length: int,
    tile: int = 16,
    interpret: bool = False,
):
    """SoA-planes body of :func:`rollout_statepolicy_fused` (bfs_ez + pre).

    The arrays-layout body converts ``[B, N, 2]`` state to transposed
    ``[E, B]`` planes inside every kernel call and back out — and every XLA
    op between calls (concats, selects, recentring) runs on tensors whose
    minor dimension is the 2-wide coordinate axis, i.e. at 2/128 lane
    utilization.  Here the scan carry IS the plane set: positions,
    velocities, ideal shape, landmarks and the root-velocity rows stay in
    the transposed layout for the whole chunk; `[B, N, 2]` exists only at
    chunk boundaries and inside the rare reset/correction conds.  Step
    semantics and the PRNG chain are identical to the arrays body
    (parity: tests/test_fused_rollout_hd.py)."""
    import math as _math

    from .core import physics as _physics
    from .ops.pallas.fused_step import fused_hd_step_planes
    from .ops.pallas.reward_sym import hd_reward_stats_sym

    scen, cfg = env.scenario, env.cfg
    n = cfg.n_agents
    nl = cfg.n_landmarks
    sub = _physics._collide_subset(cfg)
    sub_cfg = cfg if sub is None else sub[3]
    thresh = float(2.0 * cfg.size[0] * scen.collision_factor)
    bfs_L = round(_math.log(n, 3))
    assert 3**bfs_L == n, f"bfs_ez needs an arity-3 agent count, got {n}"
    assert env.shared_reward and env.auto_reset and scen.scripted_mask is None
    assert not cfg.has_noise() and bool(np.all(cfg.silent))
    su = np.unique(env._sensitivity), np.unique(cfg.act_coef[:n])
    assert len(su[0]) == 1 and len(su[1]) == 1
    act_scale = float(su[0][0] * su[1][0])
    interp = interpret or jax.default_backend() != "tpu"
    wl = env.world_length

    B = keys.shape[0]
    LANE = 128
    up = lambda v, m: ((v + m - 1) // m) * m
    Ep = up(n, tile)
    Lp = up(max(nl, 8), 8)
    Bp = up(B, LANE)
    sent = (jnp.arange(Ep, dtype=jnp.float32) >= n) * (
        1e4 * (1.0 + jnp.arange(Ep, dtype=jnp.float32))
    )
    zero = jnp.zeros_like(sent)

    def pad_t(a, s, rows):  # [B, rows_real] -> [rows, Bp] with row offsets s
        return (
            jnp.zeros((Bp, rows), jnp.float32).at[:B, : a.shape[1]].set(a)
            + s[None, :rows]
        ).T

    rmask = (jnp.arange(Ep) < n)[:, None]  # [Ep, 1]
    lmask = (jnp.arange(Lp) < nl)[:, None]

    def to_planes(st):
        x = pad_t(st.pos[:, :n, 0], sent, Ep)
        y = pad_t(st.pos[:, :n, 1], sent, Ep)
        vx = pad_t(st.vel[:, :n, 0], zero, Ep)
        vy = pad_t(st.vel[:, :n, 1], zero, Ep)
        sx = pad_t(st.ideal_shape[..., 0], -sent, Ep)
        sy = pad_t(st.ideal_shape[..., 1], -sent, Ep)
        lz = jnp.zeros(Lp, jnp.float32)
        lx = pad_t(st.pos[:, n:, 0], lz, Lp)
        ly = pad_t(st.pos[:, n:, 1], lz, Lp)
        rvx = jnp.zeros((Ep, Bp), jnp.float32).at[0, :B].set(st.ideal_vel[:, 0])
        rvy = jnp.zeros((Ep, Bp), jnp.float32).at[0, :B].set(st.ideal_vel[:, 1])
        return dict(
            x=x, y=y, vx=vx, vy=vy, sx=sx, sy=sy, lx=lx, ly=ly,
            rvx=rvx, rvy=rvy, t=st.t, key=st.key,
        )

    P0 = to_planes(state)
    prev0 = dict(
        px=P0["x"], py=P0["y"], psx=P0["sx"], psy=P0["sy"],
        vt=jnp.zeros((B,), jnp.float32), done=jnp.zeros((B,), bool),
    )

    def stats_prev(prev):
        ppos = jnp.stack(
            [prev["px"][:n, :B].T, prev["py"][:n, :B].T], axis=-1
        )
        pish = jnp.stack(
            [prev["psx"][:n, :B].T, prev["psy"][:n, :B].T], axis=-1
        )
        return hd_reward_stats_sym(ppos, pish, thresh=thresh, interpret=interp)

    def finalize(haus, ncsum, velterm):
        return n * (n * (velterm - haus) - ncsum)

    def body(carry, _):
        P, k, prev = carry
        ks = jax.vmap(lambda kk: jax.random.split(kk))(k)
        keys3 = jax.vmap(lambda kk: jax.random.split(kk, 3))(P["key"])
        nx, ny, nvx, nvy, rowmin, colmin, cnt = fused_hd_step_planes(
            P["x"], P["y"], P["vx"], P["vy"], P["rvx"], P["rvy"],
            P["sx"], P["sy"], sub_cfg,
            n=n, thresh=thresh, stats="pre", tile=tile, interpret=interp,
            bfs_L=bfs_L, act_scale=act_scale,
        )
        # reward t-1: stats of this call's INPUT state (valid unless reset)
        big = jnp.float32(3.4e38)
        rm = jnp.where(rmask, rowmin, -big).max(axis=0)
        cm = jnp.where(rmask, colmin, -big).max(axis=0)
        haus_in = jnp.sqrt(jnp.maximum(rm, cm))[:B]
        ncs_in = cnt.sum(axis=0)[:B]

        def corrected(_):
            h2, nc2 = stats_prev(prev)
            return (
                jnp.where(prev["done"], h2, haus_in),
                jnp.where(prev["done"], nc2.sum(axis=-1), ncs_in),
            )

        h_prev, ncs_prev = jax.lax.cond(
            jnp.any(prev["done"]), corrected,
            lambda _: (haus_in, ncs_in), None,
        )
        r_prev = finalize(h_prev, ncs_prev, prev["vt"])

        # this step's velocity term (post-physics, pre-reset)
        mvx = nvx.sum(axis=0)[:B] / n  # pad rows are exactly 0
        mvy = nvy.sum(axis=0)[:B] / n
        ivx = P["rvx"][0, :B]
        ivy = P["rvy"][0, :B]
        velterm = -jnp.sqrt((ivx - mvx) ** 2 + (ivy - mvy) ** 2)

        # landmark recentring onto the agent centroid (pre_obs,
        # formation_hd_env.py:40-44) — plane ops, lane-parallel
        amx = jnp.where(rmask, nx, 0.0).sum(axis=0) / n  # [Bp]
        amy = jnp.where(rmask, ny, 0.0).sum(axis=0) / n
        lmx = jnp.where(lmask, P["lx"], 0.0).sum(axis=0) / nl
        lmy = jnp.where(lmask, P["ly"], 0.0).sum(axis=0) / nl
        lx = jnp.where(lmask, P["lx"] + (amx - lmx)[None, :], P["lx"])
        ly = jnp.where(lmask, P["ly"] + (amy - lmy)[None, :], P["ly"])

        t = P["t"] + 1
        done = t >= wl  # [B]
        newP = dict(
            x=nx, y=ny, vx=nvx, vy=nvy, sx=P["sx"], sy=P["sy"],
            lx=lx, ly=ly, rvx=P["rvx"], rvy=P["rvy"], t=t,
            key=keys3[:, 0],
        )

        def do_reset(newP):
            fresh = jax.vmap(lambda kk: scen.pre_obs(scen.reset(kk)))(
                keys3[:, 2]
            )
            F = to_planes(fresh)
            dl = jnp.zeros((Bp,), bool).at[:B].set(done)[None, :]
            out = {}
            for kname, v in newP.items():
                if kname in ("t", "key"):
                    f = F[kname]
                    sel = jnp.reshape(done, done.shape + (1,) * (v.ndim - 1))
                    out[kname] = jnp.where(sel, f, v)
                else:
                    out[kname] = jnp.where(dl, F[kname], v)
            return out

        newP = jax.lax.cond(jnp.any(done), do_reset, lambda p: p, newP)
        prev = dict(
            px=nx, py=ny, psx=P["sx"], psy=P["sy"], vt=velterm, done=done
        )
        return (newP, ks[:, 0], prev), r_prev

    (P, _, prev), ys = jax.lax.scan(
        body, (P0, keys, prev0), None, length=length
    )
    h_last, nc_last = stats_prev(prev)
    r_last = finalize(h_last, nc_last.sum(axis=-1), prev["vt"])
    rewards = jnp.concatenate([ys[1:], r_last[None]], axis=0)

    pos = jnp.concatenate(
        [
            jnp.stack([P["x"][:n, :B].T, P["y"][:n, :B].T], axis=-1),
            jnp.stack([P["lx"][:nl, :B].T, P["ly"][:nl, :B].T], axis=-1),
        ],
        axis=1,
    ).astype(state.pos.dtype)
    vel = jnp.concatenate(
        [
            jnp.stack([P["vx"][:n, :B].T, P["vy"][:n, :B].T], axis=-1),
            jnp.zeros((B, nl, 2), state.vel.dtype),
        ],
        axis=1,
    ).astype(state.vel.dtype)
    out_state = state.replace(
        pos=pos,
        vel=vel,
        c=jnp.zeros_like(state.c),
        ideal_shape=jnp.stack(
            [P["sx"][:n, :B].T, P["sy"][:n, :B].T], axis=-1
        ).astype(state.ideal_shape.dtype),
        ideal_vel=jnp.stack([P["rvx"][0, :B], P["rvy"][0, :B]], axis=-1).astype(
            state.ideal_vel.dtype
        ),
        t=P["t"],
        key=P["key"],
    )
    return out_state, rewards


_fused_sharded_cache: dict = {}


def rollout_statepolicy_fused_sharded(
    env: FormationEnv,
    state_policy_fn,
    state: EnvState,
    keys: Array,
    length: int,
    mesh,
    axis: str = "data",
    **kw,
):
    """:func:`rollout_statepolicy_fused` composed with a data mesh via
    ``shard_map``: each shard runs the fused kernel on its B/D slice of the
    env batch.  Envs have no cross-shard coupling, so the mapping is exact;
    the off-by-one reset-correction ``lax.cond`` becomes per-shard (still
    correct — it only gates a recompute).  Returns ``(state, rewards)`` like
    the unsharded call."""
    from jax.sharding import PartitionSpec as P

    # Cache the jitted shard_map closure: jit keys on the callable object, so
    # rebuilding it per invocation re-traces the whole T-step rollout every
    # call (ADVICE r4 — bench.py's mesh branch was paying trace+lower inside
    # every timed window).
    ck = (id(env), state_policy_fn, length, mesh, axis,
          tuple(sorted(kw.items())))
    hit = _fused_sharded_cache.get(ck)
    if hit is None:
        spec = jax.tree.map(lambda _: P(axis), state)

        def fn(st, ks):
            return rollout_statepolicy_fused(
                env, state_policy_fn, st, ks, length, **kw
            )

        hit = jax.jit(
            jax.shard_map(
                fn,
                mesh=mesh,
                in_specs=(spec, P(axis)),
                out_specs=(spec, P(None, axis)),
                # pallas_call outputs carry no vma annotation; per-shard pure
                check_vma=False,
            )
        )
        _fused_sharded_cache[ck] = (env, hit)  # keep env alive (id-keyed)
    else:
        hit = hit[1]
    return hit(state, keys)


def make_receptor_locations(receptor_type: str = "polar") -> np.ndarray:
    """Receptor-field offsets in the agent's local frame — the reference's
    (unused) observation helper ``environment.py:396-414``, kept for surface
    parity.  ``polar``: 8 angles × 3 radii in [0.1, 1.0] plus the origin
    (25 points); ``grid``: a 5×5 lattice over [-1, 1]².  Returns [K, 2]."""
    if receptor_type == "polar":
        angles = np.linspace(-np.pi, np.pi, 8, endpoint=False)
        radii = np.linspace(0.05 * 2.0, 1.0, 3)
        pts = [
            r * np.array([np.cos(a), np.sin(a)]) for a in angles for r in radii
        ]
        pts.append(np.zeros(2))
    elif receptor_type == "grid":
        xs = np.linspace(-1.0, 1.0, 5)
        pts = [np.array([x, y]) for x in xs for y in xs]
    else:
        raise ValueError(f"unknown receptor_type: {receptor_type!r}")
    return np.stack(pts)
