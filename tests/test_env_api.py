"""Env API contract tests: spaces, episode machinery, auto-reset, vec batch."""

import numpy as np
import jax
import jax.numpy as jnp

import gym_formation_tpu as ft
from gym_formation_tpu import spaces


def test_spaces_layout():
    env = ft.make_env("formation_hd_env", num_agents=3)
    assert len(env.action_space) == 3
    assert isinstance(env.action_space[0], spaces.Box)
    assert env.action_space[0].shape == (2,)
    assert env.observation_space[0].shape == (18,)
    assert env.share_observation_space[0].shape == (54,)
    env_d = ft.FormationEnv(env.scenario, discrete_action=True)
    assert isinstance(env_d.action_space[0], spaces.Discrete)
    assert env_d.action_space[0].n == 5


def test_reset_and_step_shapes(key):
    env = ft.make_env("formation_hd_env", num_agents=3, benchmark=True)
    state, obs = env.reset(key)
    assert obs.shape == (3, 18)
    assert int(state.t) == 0
    acts = env.sample_actions(jax.random.PRNGKey(1))
    state, out = jax.jit(env.step)(state, acts)
    assert out.obs.shape == (3, 18)
    assert out.reward.shape == (3,)
    assert out.done.shape == (3,)
    assert int(state.t) == 1
    for k in ("individual_reward", "reward", "collisions", "min_dists", "occupied_landmarks"):
        assert k in out.info


def test_shared_reward_is_sum_broadcast(key):
    env = ft.make_env("formation_hd_env", num_agents=3)
    state, _ = env.reset(key)
    state, out = env.step(state, env.sample_actions(jax.random.PRNGKey(1)))
    indiv = np.asarray(out.info["individual_reward"])
    rew = np.asarray(out.reward)
    assert np.allclose(rew, indiv.sum())
    assert np.allclose(rew[0], rew[1]) and np.allclose(rew[1], rew[2])


def test_done_at_world_length_and_autoreset(key):
    env = ft.make_env("formation_hd_env", num_agents=3, episode_length=5)
    assert env.world_length == 5
    state, obs0 = env.reset(key)
    step = jax.jit(env.step)
    zero = jnp.zeros((3, env.act_dim))
    for t in range(4):
        state, out = step(state, zero)
        assert not bool(out.done[0])
    state, out = step(state, zero)
    assert bool(out.done.all())
    # auto-reset: state is a fresh episode, obs is the reset obs
    assert int(state.t) == 0
    assert np.all(np.asarray(state.vel[:3]) == 0)


def test_no_autoreset_keeps_counting(key):
    scen = ft.make_scenario("formation_hd_env", num_agents=3, episode_length=3)
    env = ft.FormationEnv(scen, auto_reset=False)
    state, _ = env.reset(key)
    step = jax.jit(env.step)
    zero = jnp.zeros((3, env.act_dim))
    for _ in range(5):
        state, out = step(state, zero)
    assert int(state.t) == 5
    assert bool(out.done.all())


def test_discrete_action_paths(key):
    scen = ft.make_scenario("formation_hd_env", num_agents=3)
    env = ft.FormationEnv(scen, discrete_action=True)
    state, _ = env.reset(key)
    # one-hot index 1 → +x (``environment.py:208``; note this differs from the
    # integer-input decoding where 1 → −x, ``environment.py:197-198``)
    onehot = jnp.tile(jnp.array([[0.0, 1.0, 0.0, 0.0, 0.0]]), (3, 1))
    state, out = env.step(state, onehot)
    assert np.all(np.asarray(state.vel[:3, 0]) > 0)
    env_i = ft.FormationEnv(scen, discrete_action_input=True)
    state, _ = env_i.reset(key)
    state, out = env_i.step(state, jnp.full((3, 1), 4))  # move +y
    assert np.all(np.asarray(state.vel[:3, 1]) > 0)


def test_vec_env_batch(key):
    venv = ft.make_vec_env("formation_hd_env", num_envs=8, num_agents=3)
    state, obs = venv.reset(key)
    assert obs.shape == (8, 3, 18)
    acts = venv.sample_actions(jax.random.PRNGKey(1))
    state, out = venv.step(state, acts)
    assert out.reward.shape == (8, 3)
    # different envs evolved differently
    assert not np.allclose(np.asarray(out.obs[0]), np.asarray(out.obs[1]))


def test_rollout_scan(key):
    env = ft.make_env("formation_hd_env", num_agents=3)
    state, obs = env.reset(key)
    policy = lambda obs, k: ft.ezpolicy_batched(obs)
    (state, obs), outs = jax.jit(
        lambda s, o: ft.rollout(env, policy, s, o, jax.random.PRNGKey(9), 12)
    )(state, obs)
    assert outs.reward.shape == (12, 3)
    assert np.isfinite(np.asarray(outs.reward)).all()


def test_deterministic_given_key(key):
    env = ft.make_env("formation_hd_env", num_agents=3)
    s1, o1 = env.reset(key)
    s2, o2 = env.reset(key)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    a = env.sample_actions(jax.random.PRNGKey(1))
    _, r1 = env.step(s1, a)
    _, r2 = env.step(s2, a)
    np.testing.assert_array_equal(np.asarray(r1.reward), np.asarray(r2.reward))


def test_rollout_stateonly_matches_rollout(key):
    """The memory-lean rollout produces the same rewards as the obs-carrying
    rollout for an obs-dependent policy."""
    env = ft.make_env("formation_hd_env", num_agents=3)
    state, obs = env.reset(key)
    policy = lambda o, k: ft.ezpolicy_batched(o)
    (s1, _), outs = jax.jit(
        lambda s, o: ft.rollout(env, policy, s, o, jax.random.PRNGKey(9), 8)
    )(state, obs)
    s2, rewards = jax.jit(
        lambda s: ft.rollout_stateonly(env, policy, s, jax.random.PRNGKey(9), 8)
    )(state)
    np.testing.assert_allclose(
        np.asarray(outs.reward), np.asarray(rewards), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(s1.pos), np.asarray(s2.pos), atol=1e-5)


def test_reset_choose_selective(key):
    """reset_choose resets exactly the chosen envs — the Choose* vec-env
    capability (maddpg-v4/wrapper.py:225-486 reset_choose)."""
    env = ft.make_env("formation_hd_env", num_agents=3)
    vec = ft.VecFormationEnv(env, num_envs=4)
    state, obs = vec.reset(key)
    for i in range(5):
        state, out = vec.step(state, vec.sample_actions(jax.random.PRNGKey(i)))
        obs = out.obs
    assert np.all(np.asarray(state.t) == 5)
    choose = jnp.array([True, False, True, False])
    new_state, new_obs = vec.reset_choose(state, obs, jax.random.PRNGKey(7), choose)
    t = np.asarray(new_state.t)
    assert t[0] == 0 and t[2] == 0 and t[1] == 5 and t[3] == 5
    # unchosen envs keep their exact state/obs; chosen envs are fresh
    assert np.array_equal(np.asarray(new_obs[1]), np.asarray(obs[1]))
    assert np.array_equal(np.asarray(new_obs[3]), np.asarray(obs[3]))
    assert not np.array_equal(np.asarray(new_obs[0]), np.asarray(obs[0]))
    assert np.array_equal(
        np.asarray(new_state.pos[1]), np.asarray(state.pos[1])
    )


def test_benchmark_quartet_in_train_metrics(key):
    """benchmark=True envs surface the benchmark_data quartet means in every
    algorithm train_step's metrics (reference make_env(benchmark=True)
    info_callback wiring, formation_gym/__init__.py:13-14)."""
    from gym_formation_tpu.algos import MAPPO, MAPPOConfig, MADDPG, MADDPGConfig

    env = ft.make_env("formation_hd_env", num_agents=3, benchmark=True)
    algo = MAPPO(env, MAPPOConfig(rollout_len=4, ppo_epochs=1), num_envs=4)
    ts, es, obs = algo.init(key)
    ts, es, obs, m = algo.train_step(ts, es, obs, jax.random.PRNGKey(1))
    for k in ("bench_reward", "bench_collisions", "bench_min_dists",
              "bench_occupied_landmarks"):
        assert k in m and np.isfinite(float(m[k])), k

    algo2 = MADDPG(
        env,
        MADDPGConfig(buffer_size=512, steps_per_iter=4, updates_per_iter=2,
                     batch_size=32),
        num_envs=4,
    )
    ts2, buf, es2, obs2 = algo2.init(key)
    ts2, buf, es2, obs2, m2 = algo2.train_step(
        ts2, buf, es2, obs2, jax.random.PRNGKey(2)
    )
    assert "bench_collisions" in m2 and np.isfinite(float(m2["bench_collisions"]))

    # benchmark=False envs add nothing
    env0 = ft.make_env("formation_hd_env", num_agents=3)
    algo0 = MAPPO(env0, MAPPOConfig(rollout_len=4, ppo_epochs=1), num_envs=4)
    ts0, es0, obs0 = algo0.init(key)
    _, _, _, m0 = algo0.train_step(ts0, es0, obs0, jax.random.PRNGKey(1))
    assert not any(k.startswith("bench_") for k in m0)
