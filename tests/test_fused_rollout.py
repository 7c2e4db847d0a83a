"""Parity of the whole-rollout fused Pallas kernel vs the step-by-step path.

The fused kernel (ops/pallas/fused_rollout.py) re-implements the entire
formation_hd + ezpolicy rollout (physics, reward, time-limit auto-reset)
inside one Pallas program.  These tests run it in interpret mode on CPU and
hold it to the standard ``rollout`` path:

* exact-trajectory parity while no auto-reset fires (the in-kernel PRNG is a
  different — equally valid — stream, so trajectories diverge at the first
  episode boundary);
* distributional parity across many episodes (mean step reward).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gym_formation_tpu as ft
from gym_formation_tpu.ops.pallas.fused_rollout import (
    fused_rollout_hd,
    soa_to_state,
    state_to_soa,
)


def _setup(n, B):
    env = ft.make_env("formation_hd_env", num_agents=n)
    state, obs = jax.jit(jax.vmap(env.reset))(
        jax.random.split(jax.random.PRNGKey(0), B)
    )
    return env, state, obs


@pytest.mark.parametrize("n", [3, 4, 9])
def test_fused_matches_rollout_within_episode(n):
    env, state, obs = _setup(n, 32)
    T = 50 if n < 9 else 20  # < episode_length: no reset, exact-match regime
    # n=9 packs agents densely enough that contacts fire; the softplus
    # contact force (contact_force=100, margin=1e-3) amplifies f32-vs-f64
    # rounding into ~1e-4 state divergence — still 4 orders below any
    # semantic error, so scale the band rather than shorten the horizon
    tol = 1e-5 if n < 9 else 3e-4
    pol = lambda o, k: ft.ezpolicy_batched(o)
    (state_std, _), outs = jax.jit(
        lambda s, o, k: jax.vmap(
            lambda ss, oo, kk: ft.rollout(env, pol, ss, oo, kk, T)
        )(s, o, k)
    )(state, obs, jax.random.split(jax.random.PRNGKey(1), 32))
    r_std = outs.reward.sum(axis=(1, 2))

    soa, r_fused = fused_rollout_hd(
        state_to_soa(state), 7, length=T, ep_len=env.world_length,
        n=n, block=32, interpret=True,
    )
    state_fused = soa_to_state(soa, state)

    # rtol covers the larger reward magnitudes at n=9 (f32 accumulation
    # reassociation; observed rel err ~1e-6)
    np.testing.assert_allclose(
        np.asarray(r_fused), np.asarray(r_std), rtol=5e-6, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(state_fused.pos[:, :n]),
        np.asarray(state_std.pos[:, :n], np.float32),
        atol=tol,
    )
    np.testing.assert_allclose(
        np.asarray(state_fused.vel[:, :n]),
        np.asarray(state_std.vel[:, :n], np.float32),
        atol=tol,
    )
    # landmark reconstruction: ideal_shape + agent centroid (post-pre_obs)
    np.testing.assert_allclose(
        np.asarray(state_fused.pos[:, n:]),
        np.asarray(state_std.pos[:, n:], np.float32),
        atol=tol,
    )
    assert (np.asarray(state_fused.t) == np.asarray(state_std.t)).all()


def test_fused_across_episodes_distributional():
    """Crossing auto-resets: different PRNG stream, same MDP — the mean step
    reward under ezpolicy must agree with the standard path."""
    env, state, obs = _setup(3, 64)
    T = 300  # 3 episode boundaries
    pol = lambda o, k: ft.ezpolicy_batched(o)
    (_, _), outs = jax.jit(
        lambda s, o, k: jax.vmap(
            lambda ss, oo, kk: ft.rollout(env, pol, ss, oo, kk, T)
        )(s, o, k)
    )(state, obs, jax.random.split(jax.random.PRNGKey(1), 64))
    mean_std = float(outs.reward.sum()) / (64 * T)

    soa, r_fused = fused_rollout_hd(
        state_to_soa(state), 11, length=T, ep_len=env.world_length,
        n=3, block=64, interpret=True,
    )
    mean_fused = float(r_fused.sum()) / (64 * T)
    assert np.isfinite(mean_fused)
    # ezpolicy settles each episode; both paths should land near the same
    # steady-state mean (loose band: different reset draws)
    assert abs(mean_fused - mean_std) < 0.5, (mean_fused, mean_std)

    # resets actually fired: t wrapped below T
    assert int(np.asarray(soa.t).max()) < env.world_length


def test_fused_reset_draws_cover_the_box():
    """In-kernel reset positions must span the same [-1, 1) box the
    scenario's reset samples (formation_hd_env.py:77-95)."""
    env, state, obs = _setup(3, 128)
    soa, _ = fused_rollout_hd(
        state_to_soa(state), 3, length=105, ep_len=env.world_length,
        n=3, block=128, interpret=True,
    )
    ap = np.asarray(soa.ap)  # post-reset agent positions + 5 steps of drift
    assert ap.min() > -1.6 and ap.max() < 1.6
    assert ap.std() > 0.3  # spread over the box, not collapsed
