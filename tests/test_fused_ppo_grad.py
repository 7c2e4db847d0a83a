"""Gradient parity of the fused PPO-update kernel vs jax.grad.

The kernel (ops/pallas/fused_ppo_grad.py) computes the full actor+critic
PPO gradient with a hand-derived backward pass; these tests hold every
gradient leaf to ``jax.grad(MAPPO._loss)`` on realistic data, and run a
fully-fused (collection + update) train_step end to end.
"""

import numpy as np
import jax
import jax.numpy as jnp

import gym_formation_tpu as ft
from gym_formation_tpu.algos import MAPPO, MAPPOConfig


def _make_batch(algo, ts, key, M):
    """Realistic flat batch: obs ~ reset distribution scale, actions sampled
    from the current policy with a slight param perturbation so ratios ≠ 1
    and every clip/min branch is exercised."""
    n, do, A = algo.n_agents, algo.obs_dim, algo.act_dim
    ks = jax.random.split(key, 6)
    obs = jax.random.uniform(ks[0], (M, n, do), jnp.float32, -1.5, 1.5)
    mean, log_std = algo.actor.apply(ts.params["actor"], obs)
    action = mean + jnp.exp(log_std) * jax.random.normal(ks[1], mean.shape)
    from gym_formation_tpu.models.networks import gaussian_logp

    # behavior logp: jittered so the ratio spreads around 1
    logp = gaussian_logp(mean, log_std, action) + 0.2 * jax.random.normal(
        ks[2], (M, n)
    )
    value = algo.critic.apply(
        ts.params["critic"], obs.reshape(M, n * do)
    )
    target = value + jax.random.normal(ks[3], value.shape)
    adv = jax.random.normal(ks[4], (M,))
    return {
        "obs": obs,
        "action": action,
        "logp": logp,
        "value": value,
        "adv": adv,
        "target": target,
    }


def test_grad_parity():
    env = ft.make_env("formation_hd_env", num_agents=3)
    env = ft.FormationEnv(env.scenario)
    M = 512
    algo = MAPPO(
        env, MAPPOConfig(rollout_len=8, fused_update=True), num_envs=M // 8
    )
    ts, _, _ = algo.init(jax.random.PRNGKey(0))
    data = jax.tree.map(
        lambda x: jnp.asarray(x, jnp.float32),
        _make_batch(algo, ts, jax.random.PRNGKey(1), M),
    )

    ref_grads = jax.grad(algo._loss, has_aux=True)(
        jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), ts.params),
        data, ts.value_norm,
    )[0]

    fused_grads, metrics = jax.jit(algo._fused_epoch_grads)(
        jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), ts.params), data
    )

    flat_ref = jax.tree_util.tree_flatten_with_path(ref_grads)[0]
    flat_fused = jax.tree_util.tree_flatten_with_path(fused_grads)[0]
    assert len(flat_ref) == len(flat_fused)
    for (path_r, r), (path_f, f) in zip(flat_ref, flat_fused):
        assert path_r == path_f, (path_r, path_f)
        np.testing.assert_allclose(
            np.asarray(f), np.asarray(r), rtol=2e-3, atol=2e-6,
            err_msg=str(path_r),
        )


def test_fully_fused_train_step():
    """fused_collect + fused_update together: jitted train_step runs with
    finite metrics and the critic fits."""
    env = ft.make_env("formation_hd_env", num_agents=3, episode_length=25)
    env = ft.FormationEnv(env.scenario)
    algo = MAPPO(
        env,
        MAPPOConfig(rollout_len=8, ppo_epochs=2, fused_collect=True,
                    fused_update=True, entropy_coef=0.0),
        num_envs=32,
    )
    ts, es, obs = algo.init(jax.random.PRNGKey(0))
    v0 = None
    for i in range(8):
        ts, es, obs, m = algo.train_step(ts, es, obs, jax.random.PRNGKey(i))
        assert np.isfinite(float(m["mean_step_reward"]))
        v = float(m["v_loss"])
        assert np.isfinite(v)
        if v0 is None:
            v0 = v
    assert v < v0 * 5  # critic not diverging


def test_fused_update_matches_scan_update_one_step():
    """Starting from identical state+data, one train-update via the fused
    kernel matches the standard path's parameters after the update."""
    env = ft.make_env("formation_hd_env", num_agents=3)
    env = ft.FormationEnv(env.scenario)
    M = 256
    mk = lambda fused: MAPPO(
        env, MAPPOConfig(rollout_len=8, ppo_epochs=3, fused_update=fused),
        num_envs=M // 8,
    )
    a_std, a_fused = mk(False), mk(True)
    ts, _, _ = a_std.init(jax.random.PRNGKey(0))
    data = _make_batch(a_std, ts, jax.random.PRNGKey(1), M)

    ts_std, m_std = a_std._update(ts, data, jax.random.PRNGKey(2))
    ts_fused, m_fused = a_fused._update_fused(ts, data, jax.random.PRNGKey(2))

    for (p_s, s), (p_f, f) in zip(
        jax.tree_util.tree_flatten_with_path(ts_std.params)[0],
        jax.tree_util.tree_flatten_with_path(ts_fused.params)[0],
    ):
        assert p_s == p_f
        np.testing.assert_allclose(
            np.asarray(f), np.asarray(s), rtol=5e-3, atol=5e-5,
            err_msg=str(p_s),
        )
    np.testing.assert_allclose(
        float(m_fused["v_loss"]), float(m_std["v_loss"]), rtol=1e-3
    )
