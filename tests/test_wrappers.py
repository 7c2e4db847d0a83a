"""Imperative adapter contracts: GymMultiAgentEnv (reference
``environment.py:113-156``) and DictAgentEnv (``train/maddpg-v3/env/
wrapper.py:15-84``)."""

import numpy as np
import pytest

import gym_formation_tpu as ft


@pytest.fixture(scope="module")
def gym_env():
    return ft.GymMultiAgentEnv(
        "formation_hd_env", benchmark=True, num_agents=3, episode_length=5
    )


def test_gym_env_reference_contract(gym_env):
    env = gym_env
    env.seed(3)
    obs_n = env.reset()
    assert isinstance(obs_n, list) and len(obs_n) == 3
    assert obs_n[0].shape == (env.observation_space[0].shape[0],)

    acts = [np.zeros(2, np.float32) for _ in range(3)]
    obs_n, reward_n, done_n, info_n = env.step(acts)
    # the [[r]] nesting trainers rely on (environment.py:128,138; SURVEY §8.10)
    assert reward_n == [[reward_n[0][0]]] * 3  # shared-reward broadcast
    assert isinstance(reward_n[0], list) and isinstance(reward_n[0][0], float)
    assert done_n == [False] * 3
    # per-agent info dicts: individual_reward + benchmark quartet
    for info in info_n:
        assert {"individual_reward", "reward", "collisions", "min_dists",
                "occupied_landmarks"} <= set(info.keys())

    # time-limit done (environment.py:172-178), episode_length=5
    for _ in range(4):
        _, _, done_n, _ = env.step(acts)
    assert done_n == [True] * 3


def test_gym_env_seed_determinism(gym_env):
    env = gym_env
    env.seed(11)
    a = env.reset()
    env.seed(11)
    b = env.reset()
    np.testing.assert_array_equal(np.stack(a), np.stack(b))
    env.seed(12)
    c = env.reset()
    assert not np.array_equal(np.stack(a), np.stack(c))


def test_gym_env_render(gym_env):
    env = gym_env
    env.seed(0)
    env.reset()
    frame = env.render(size=64)
    assert frame.shape == (64, 64, 3) and frame.dtype == np.uint8


def test_dict_agent_env_contract():
    env = ft.DictAgentEnv(
        scenario_name="formation_hd_env", num_agents=3, episode_length=3
    )
    env.seed(5)
    obs = env.reset()
    assert set(obs.keys()) == {0, 1, 2}
    assert set(env.observation_space_dict) == {0, 1, 2}

    acts = {i: np.zeros(2, np.float32) for i in range(3)}
    obs, rew, done, info = env.step(acts)
    assert set(obs) == {0, 1, 2} and set(rew) == {0, 1, 2}
    # the reference v3 wrapper passes the [[r]] nesting through untouched
    # (wrapper.py:66-70): rew_dict[i] is the one-element [r] list
    assert isinstance(rew[0], list) and len(rew[0]) == 1
    # done carries the required "__all__" key (wrapper.py:72)
    assert set(done) == {0, 1, 2, "__all__"} and done["__all__"] is False
    assert info[0] == {"done": False}  # the v3 info workaround (:75)

    env.step(acts)
    _, _, done, info = env.step(acts)
    assert done["__all__"] is True and info[2] == {"done": True}
