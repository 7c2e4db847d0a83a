"""Scripted-policy and hierarchical-BFS parity + behavior tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import gym_formation_tpu as ft
from gym_formation_tpu.models import bfs_actions, ezpolicy, ezpolicy_batched
from _refshim import reference_available, load_reference

needs_ref = pytest.mark.skipif(
    not reference_available(), reason="reference implementation not importable"
)


def random_hd_obs(rng, n):
    """A plausible 6N-dim hd observation batch [N, 6N] with shared
    ideal-shape/vel blocks and consistent relative positions."""
    pos = rng.uniform(-1, 1, (n, 2))
    vel = rng.uniform(-0.5, 0.5, (n, 2))
    shape = rng.uniform(-1, 1, (n, 2))
    shape -= shape.mean(0)
    ivel = rng.uniform(-1, 1, 2)
    obs = []
    for i in range(n):
        others = np.concatenate([pos[j] - pos[i] for j in range(n) if j != i])
        obs.append(
            np.concatenate([vel[i], others, np.zeros(2 * (n - 1)), shape.reshape(-1), ivel])
        )
    return np.stack(obs)


@needs_ref
@pytest.mark.parametrize("n", [3, 5])
def test_ezpolicy_matches_reference(n):
    ref = load_reference()
    rng = np.random.RandomState(0)
    for trial in range(20):
        obs = random_hd_obs(rng, n)
        for i in range(n):
            ours = np.asarray(ezpolicy(jnp.asarray(obs[i], jnp.float64)))
            theirs = ref.ezpolicy(obs[i])
            np.testing.assert_allclose(ours, theirs, atol=1e-9)


@needs_ref
@pytest.mark.parametrize("n_per_layer,layers", [(3, 1), (3, 2), (3, 3), (2, 3)])
def test_bfs_matches_reference(n_per_layer, layers):
    ref = load_reference()
    rng = np.random.RandomState(layers)
    n = n_per_layer**layers
    obs = random_hd_obs(rng, n)
    theirs = np.stack(ref.get_action_BFS(ref.ezpolicy, list(obs), n_per_layer))
    obs64 = jnp.asarray(obs, jnp.float64)
    ours = np.asarray(bfs_actions(ezpolicy_batched, obs64, n_per_layer))
    np.testing.assert_allclose(ours, theirs, atol=1e-8)


def test_bfs_jits_and_vmaps():
    rng = np.random.RandomState(1)
    obs = np.stack([random_hd_obs(rng, 9) for _ in range(4)])  # [B=4, 9, 54]
    fn = jax.jit(lambda o: ft.bfs_actions_batched(ezpolicy_batched, o, 3))
    acts = fn(jnp.asarray(obs, jnp.float32))
    assert acts.shape == (4, 9, 2)
    assert np.isfinite(np.asarray(acts)).all()


def test_ezpolicy_converges_formation():
    """Driving the hd env with ezpolicy should shrink the Hausdorff error —
    the reference's only integration test (`test.py` visual check) made
    quantitative."""
    env = ft.make_env("formation_hd_env", num_agents=3)
    env_noreset = ft.FormationEnv(env.scenario, auto_reset=False)
    state, obs = env_noreset.reset(jax.random.PRNGKey(42))
    step = jax.jit(env_noreset.step)
    first_rew, last_rew = None, None
    for t in range(60):
        acts = ezpolicy_batched(obs)
        state, out = step(state, acts)
        obs = out.obs
        if t == 0:
            first_rew = float(out.reward[0])
        last_rew = float(out.reward[0])
    assert last_rew > first_rew, (first_rew, last_rew)
    assert last_rew > -3.0, last_rew


@needs_ref
def test_generate_shape_matches_reference():
    ref = load_reference()
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_hd", "/root/reference/formation_gym/envs/formation_hd_env.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    scen = mod.Scenario()
    for layer in range(4):
        np.testing.assert_allclose(
            ft.generate_shape(layer), scen.generate_shape(layer), atol=0
        )


@pytest.mark.parametrize("n,L", [(3, 2), (2, 3), (3, 3)])
def test_bfs_from_state_bitwise_equals_obs_path(n, L):
    env = ft.make_env("formation_hd_env", num_agents=n**L)
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(42))
    a_obs = ft.bfs_actions(ft.ezpolicy_batched, obs, n)
    a_state = ft.bfs_actions_from_state(ft.ezpolicy_batched, env.scenario, state, n)
    # identical inputs; XLA may reassociate the block-mean reductions
    # between the two graphs at the 1-ULP level (same caveat as RESULTS.md
    # bit-exactness notes), hence atol instead of array_equal
    np.testing.assert_allclose(
        np.asarray(a_obs), np.asarray(a_state), rtol=0, atol=1e-6
    )


def test_rollout_statepolicy_matches_rollout():
    env = ft.make_env("formation_hd_env", num_agents=9)
    key = jax.random.PRNGKey(7)
    state, obs = jax.jit(env.reset)(key)

    pol_obs = lambda o, k: ft.bfs_actions(ft.ezpolicy_batched, o, 3)
    pol_state = lambda s, k: ft.bfs_actions_from_state(
        ft.ezpolicy_batched, env.scenario, s, 3
    )
    (_, _), outs = jax.jit(
        lambda s, o: ft.rollout(env, pol_obs, s, o, jax.random.PRNGKey(0), 12)
    )(state, obs)
    _, rewards = jax.jit(
        lambda s: ft.rollout_statepolicy(env, pol_state, s, jax.random.PRNGKey(0), 12)
    )(state)
    np.testing.assert_allclose(
        np.asarray(outs.reward), np.asarray(rewards), rtol=0, atol=1e-5
    )
