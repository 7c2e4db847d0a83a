"""Parity of the fused Hausdorff/collision reward kernel (interpret mode)
against the plain XLA reward formulas (envs/formation_hd.py, reference
``formation_hd_env.py:61-75``)."""

import jax
import jax.numpy as jnp
import numpy as np

import gym_formation_tpu as ft
from gym_formation_tpu.core import physics
from gym_formation_tpu.ops.pallas.reward import hd_reward_stats_batched


def _rand_inputs(n, B, key):
    apos = jax.random.uniform(key, (B, n, 2), jnp.float32, -1.0, 1.0)
    ishape = jax.random.uniform(
        jax.random.fold_in(key, 1), (B, n, 2), jnp.float32, -1.0, 1.0
    )
    return apos, ishape - ishape.mean(axis=1, keepdims=True)


def test_hd_stats_kernel_matches_xla():
    env = ft.make_env("formation_hd_env", num_agents=243)
    apos, ishape = _rand_inputs(243, 4, jax.random.PRNGKey(0))
    h_x, nc_x = jax.vmap(env.scenario._hd_stats_xla)(apos, ishape)
    h_k, nc_k = hd_reward_stats_batched(
        apos, ishape, thresh=0.03, interpret=True
    )
    np.testing.assert_allclose(np.asarray(h_k), np.asarray(h_x), atol=1e-6)
    np.testing.assert_allclose(np.asarray(nc_k), np.asarray(nc_x), atol=0)


def test_hd_stats_kernel_nonaligned_batch_and_n():
    """Pad paths: B not a multiple of the batch tile, N not of the lane."""
    env = ft.make_env("formation_hd_env", num_agents=100)
    apos, ishape = _rand_inputs(100, 5, jax.random.PRNGKey(2))
    h_x, nc_x = jax.vmap(env.scenario._hd_stats_xla)(apos, ishape)
    h_k, nc_k = hd_reward_stats_batched(
        apos, ishape, thresh=0.03, interpret=True
    )
    np.testing.assert_allclose(np.asarray(h_k), np.asarray(h_x), atol=1e-6)
    np.testing.assert_allclose(np.asarray(nc_k), np.asarray(nc_x), atol=0)


def test_hd_stats_sym_kernel_matches_xla():
    """The transposed-lane triangle kernel (ops/pallas/reward_sym.py) matches
    the XLA formulas: aligned and non-aligned N, odd batch, and a squeezed
    fixture where collisions actually fire (exercises the triangle sweep's
    row+col accumulation)."""
    from gym_formation_tpu.ops.pallas.reward_sym import hd_reward_stats_sym

    for n, B, scale in ((243, 4, 1.0), (100, 5, 1.0), (243, 3, 0.05)):
        env = ft.make_env("formation_hd_env", num_agents=n)
        apos, ishape = _rand_inputs(n, B, jax.random.PRNGKey(n + B))
        apos = apos * scale  # scale<1 squeezes agents into collision range
        h_x, nc_x = jax.vmap(env.scenario._hd_stats_xla)(apos, ishape)
        h_k, nc_k = hd_reward_stats_sym(
            apos, ishape, thresh=0.03, interpret=True
        )
        np.testing.assert_allclose(np.asarray(h_k), np.asarray(h_x), atol=1e-6)
        np.testing.assert_allclose(np.asarray(nc_k), np.asarray(nc_x), atol=0)
        if scale < 1.0:
            assert np.asarray(nc_x).sum() > 0  # collisions present


def test_hd_stats_sym_matches_rowmajor_kernel():
    """Both reward-kernel layouts agree with each other bit-for-bit on the
    counts and to f32 reduction tolerance on the Hausdorff."""
    from gym_formation_tpu.ops.pallas.reward_sym import hd_reward_stats_sym

    apos, ishape = _rand_inputs(243, 4, jax.random.PRNGKey(9))
    apos = apos * 0.1
    h_r, nc_r = hd_reward_stats_batched(apos, ishape, thresh=0.03, interpret=True)
    h_s, nc_s = hd_reward_stats_sym(apos, ishape, thresh=0.03, interpret=True)
    np.testing.assert_allclose(np.asarray(h_s), np.asarray(h_r), atol=1e-6)
    np.testing.assert_allclose(np.asarray(nc_s), np.asarray(nc_r), atol=0)


def test_reward_dispatch_modes_agree():
    """The scenario reward through the forced-on kernel dispatch (interpret
    off-TPU) equals the XLA path, including collision contributions."""
    env = ft.make_env("formation_hd_env", num_agents=243)
    scen = env.scenario
    state, _ = jax.jit(jax.vmap(env.reset))(
        jax.random.split(jax.random.PRNGKey(3), 4)
    )
    # squeeze agents together so collisions actually fire
    state = state.replace(pos=state.pos * 0.05)
    try:
        physics.set_pallas_mode("off")
        r_off = jax.jit(jax.vmap(scen.reward))(state)
        physics.set_pallas_mode("on")
        r_on = jax.jit(jax.vmap(scen.reward))(state)
    finally:
        physics.set_pallas_mode("auto")
    assert np.asarray(r_off).min() < -1.0  # collisions present in the fixture
    np.testing.assert_allclose(
        np.asarray(r_on), np.asarray(r_off), atol=1e-5
    )
