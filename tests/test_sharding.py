"""Multi-device sharding tests on the virtual 8-device CPU mesh.

The reference has no multi-node test story (SURVEY §4); these validate the
TPU-native path: env batches sharded over 'data', params over 'model', full
train step compiling + executing under pjit semantics.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import gym_formation_tpu as ft
from gym_formation_tpu.algos import MAPPO, MAPPOConfig
from gym_formation_tpu.parallel import (
    batch_sharding,
    make_mesh,
    model_sharding_for_params,
    shard_batch,
)

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


@needs_8
def test_vec_env_sharded_step(key):
    mesh = make_mesh(axis_names=("data",))
    env = ft.make_env("formation_hd_env", num_agents=3)
    venv = ft.VecFormationEnv(env, num_envs=32)
    state, obs = venv.reset(key)
    state = shard_batch(state, mesh)
    obs = shard_batch(obs, mesh)
    acts = venv.sample_actions(jax.random.PRNGKey(1))
    state, out = venv.step(state, shard_batch(acts, mesh))
    assert out.reward.shape == (32, 3)
    # state stays sharded over the batch axis
    shard = state.pos.sharding
    assert shard.is_fully_replicated is False
    assert np.isfinite(np.asarray(out.reward)).all()


@needs_8
def test_sharded_rollout_equals_single_device(key):
    """Sharding must not change numerics: compare a 16-env rollout sharded
    over 8 devices vs unsharded."""
    env = ft.make_env("formation_hd_env", num_agents=3)
    venv = ft.VecFormationEnv(env, num_envs=16)
    mesh = make_mesh(axis_names=("data",))

    def run(shard):
        state, obs = venv.reset(key)
        if shard:
            state = shard_batch(state, mesh)
            obs = shard_batch(obs, mesh)
        rews = []
        for i in range(5):
            acts = venv.sample_actions(jax.random.PRNGKey(100 + i))
            state, out = venv.step(state, acts)
            rews.append(np.asarray(out.reward))
        return np.stack(rews)

    np.testing.assert_allclose(run(False), run(True), atol=1e-5)


@needs_8
def test_mappo_train_step_dp_tp(key):
    mesh = make_mesh((4, 2), ("data", "model"))
    env = ft.make_env("formation_hd_env", num_agents=3)
    algo = MAPPO(env, MAPPOConfig(rollout_len=4, ppo_epochs=1), num_envs=8)
    ts, es, obs = algo.init(key)
    ts = ts.replace(
        params=jax.device_put(ts.params, model_sharding_for_params(ts.params, mesh))
    )
    es = shard_batch(es, mesh)
    obs = shard_batch(obs, mesh)
    ts, es, obs, m = algo.train_step(ts, es, obs, jax.random.PRNGKey(1))
    jax.block_until_ready(m)
    assert np.isfinite(float(m["v_loss"]))
    # params keep their tensor-parallel sharding through the update
    kernel = ts.params["actor"]["params"]["MLP_0"]["Dense_0"]["kernel"]
    assert not kernel.sharding.is_fully_replicated


@needs_8
def test_graft_dryrun():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
