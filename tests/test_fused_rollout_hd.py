"""Parity of the fused-step rollout (env.rollout_statepolicy_fused) against
the step-by-step scan (env.rollout_statepolicy), across auto-reset
boundaries, for both statistics placements."""

import numpy as np
import jax
import jax.numpy as jnp

import gym_formation_tpu as ft
from gym_formation_tpu.envs.formation_hd import FormationHDScenario

N, B, T, EP_LEN = 27, 3, 15, 6  # T crosses two auto-reset boundaries


def _setup():
    scen = FormationHDScenario(num_agents=N, episode_length=EP_LEN)
    env = ft.FormationEnv(scen)
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    state = jax.vmap(lambda k: env.reset(k)[0])(keys)
    rollkeys = jax.random.split(jax.random.PRNGKey(1), B)
    return env, state, rollkeys


def _ez_state(state):
    # tiny deterministic state policy: proportional pull toward the ideal
    # vertex matched by index, plus the ideal velocity — enough to exercise
    # contacts without the BFS machinery's own cost in interpret mode
    apos = state.pos[:N]
    target = state.ideal_shape + apos.mean(axis=0, keepdims=True)
    return jnp.clip(0.5 * (target - apos), -1.0, 1.0) + state.ideal_vel


def _reference(env, state, rollkeys):
    policy = lambda st, k: _ez_state(st)
    _, rewards = jax.vmap(
        lambda s, k: ft.rollout_statepolicy(env, policy, s, k, T)
    )(state, rollkeys)
    return rewards.sum(axis=-1).T  # [B, T, N] -> [T, B]


def test_fused_rollout_post_matches_step_path():
    env, state, rollkeys = _setup()
    ref = np.asarray(_reference(env, state, rollkeys))
    policy = lambda st, k: _ez_state(st)
    _, rew = ft.rollout_statepolicy_fused(
        env, policy, state, rollkeys, T, stats="post", interpret=True
    )
    np.testing.assert_allclose(np.asarray(rew), ref, atol=5e-3, rtol=1e-4)


def test_fused_rollout_pre_matches_step_path():
    """The off-by-one variant produces the same per-step rewards, including
    the steps whose statistics had to be recomputed at reset boundaries."""
    env, state, rollkeys = _setup()
    ref = np.asarray(_reference(env, state, rollkeys))
    policy = lambda st, k: _ez_state(st)
    _, rew = ft.rollout_statepolicy_fused(
        env, policy, state, rollkeys, T, stats="pre", interpret=True
    )
    np.testing.assert_allclose(np.asarray(rew), ref, atol=5e-3, rtol=1e-4)


def test_fused_rollout_inkernel_bfs_matches_step_path():
    """policy='bfs_ez': the arity-3 BFS + ezpolicy expansion computed INSIDE
    the fused kernel (models/bfs_planes.py) reproduces the step-by-step path
    driven by the standard expansion, across reset boundaries."""
    env, state, rollkeys = _setup()
    bfs_policy = lambda st, k: ft.bfs_actions_from_state(
        ft.ezpolicy_batched, env.scenario, st, 3
    )
    st_ref, rew_ref = jax.vmap(
        lambda s, k: ft.rollout_statepolicy(env, bfs_policy, s, k, T)
    )(state, rollkeys)
    ref = np.asarray(rew_ref.sum(axis=-1)).T
    # layout auto -> SoA planes (the shipping fast path) AND the arrays
    # body: both must reproduce the step-by-step reference
    for layout in ("planes", "arrays"):
        st_f, rew = ft.rollout_statepolicy_fused(
            env, None, state, rollkeys, T,
            stats="pre", policy="bfs_ez", interpret=True, layout=layout,
        )
        np.testing.assert_allclose(
            np.asarray(rew), ref, atol=5e-3, rtol=1e-4, err_msg=layout
        )
        np.testing.assert_allclose(
            np.asarray(st_f.pos), np.asarray(st_ref.pos),
            atol=1e-3, rtol=1e-4, err_msg=layout,
        )


def test_fused_rollout_states_match_step_path():
    """Final carried state (positions, velocities, episode counters, RNG
    keys) matches the step-by-step path."""
    env, state, rollkeys = _setup()
    policy = lambda st, k: _ez_state(st)
    st_ref, _ = jax.vmap(
        lambda s, k: ft.rollout_statepolicy(env, policy, s, k, T)
    )(state, rollkeys)
    st_f, _ = ft.rollout_statepolicy_fused(
        env, policy, state, rollkeys, T, stats="pre", interpret=True
    )
    np.testing.assert_array_equal(np.asarray(st_f.t), np.asarray(st_ref.t))
    np.testing.assert_array_equal(np.asarray(st_f.key), np.asarray(st_ref.key))
    np.testing.assert_allclose(
        np.asarray(st_f.pos), np.asarray(st_ref.pos), atol=1e-3, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(st_f.vel), np.asarray(st_ref.vel), atol=1e-3, rtol=1e-4
    )
