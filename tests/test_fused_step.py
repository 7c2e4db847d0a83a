"""Parity of the fused physics+reward step kernel (ops/pallas/fused_step.py)
against the XLA composition: collision forces + damped-Euler integration
(core/physics.py, reference ``core.py:264-322``) followed by the hd reward
statistics (envs/formation_hd.py, reference ``formation_hd_env.py:61-75``)."""

import numpy as np
import jax
import jax.numpy as jnp

import gym_formation_tpu as ft
from gym_formation_tpu.core import make_world_cfg, physics
from gym_formation_tpu.ops.pallas.fused_step import fused_hd_step

THRESH = 0.03  # (s1+s2)/2 with agent size 0.03 (formation_hd_env.py:119-121)


def _fixture(n, B, key, squeeze=1.0):
    ka, kv, kf, ks = jax.random.split(key, 4)
    apos = jax.random.uniform(ka, (B, n, 2), jnp.float32, -1.0, 1.0) * squeeze
    avel = jax.random.uniform(kv, (B, n, 2), jnp.float32, -0.5, 0.5)
    aforce = jax.random.uniform(kf, (B, n, 2), jnp.float32, -5.0, 5.0)
    ishape = jax.random.uniform(ks, (B, n, 2), jnp.float32, -1.0, 1.0)
    return apos, avel, aforce, ishape - ishape.mean(axis=1, keepdims=True)


def _xla_step(apos, avel, aforce, cfg):
    f = jax.vmap(lambda p: physics._collision_forces_xla(p, cfg))(apos) + aforce
    return jax.vmap(lambda p, v, fr: physics.integrate(p, v, fr, cfg))(
        apos, avel, f
    )


def _xla_stats(scen, apos, ishape):
    return jax.vmap(scen._hd_stats_xla)(apos, ishape)


def test_fused_step_post_matches_xla_composition():
    """stats='post': integrated state AND its reward statistics match the
    step-then-reward XLA composition, including near-contact pairs."""
    for n, B, squeeze in ((243, 3, 0.1), (100, 5, 0.3)):
        cfg = make_world_cfg(n, 0, agent_size=0.03, landmark_size=0.01)
        scen = ft.make_env("formation_hd_env", num_agents=n).scenario
        apos, avel, aforce, ishape = _fixture(n, B, jax.random.PRNGKey(n), squeeze)
        npos_x, nvel_x = _xla_step(apos, avel, aforce, cfg)
        h_x, nc_x = _xla_stats(scen, npos_x, ishape)
        npos_k, nvel_k, h_k, nc_k = fused_hd_step(
            apos, avel, aforce, ishape, cfg,
            thresh=THRESH, stats="post", interpret=True,
        )
        np.testing.assert_allclose(np.asarray(npos_k), np.asarray(npos_x),
                                   atol=2e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(nvel_k), np.asarray(nvel_x),
                                   atol=2e-3, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(h_k), np.asarray(h_x), atol=1e-5)
        # counts can flip only for pairs within f32 noise of the threshold;
        # the random fixture keeps them identical
        np.testing.assert_allclose(np.asarray(nc_k), np.asarray(nc_x), atol=0)
        assert np.asarray(nc_x).sum() > 0  # collisions present in the fixture


def test_fused_step_pre_stats_describe_input_state():
    """stats='pre': the integrated state still matches the XLA step, while
    the statistics describe the INPUT positions (the off-by-one contract)."""
    n, B = 243, 3
    cfg = make_world_cfg(n, 0, agent_size=0.03, landmark_size=0.01)
    scen = ft.make_env("formation_hd_env", num_agents=n).scenario
    apos, avel, aforce, ishape = _fixture(n, B, jax.random.PRNGKey(7), 0.1)
    npos_x, nvel_x = _xla_step(apos, avel, aforce, cfg)
    h_in, nc_in = _xla_stats(scen, apos, ishape)
    npos_k, nvel_k, h_k, nc_k = fused_hd_step(
        apos, avel, aforce, ishape, cfg,
        thresh=THRESH, stats="pre", interpret=True,
    )
    np.testing.assert_allclose(np.asarray(npos_k), np.asarray(npos_x),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(nvel_k), np.asarray(nvel_x),
                               atol=2e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(h_k), np.asarray(h_in), atol=1e-5)
    np.testing.assert_allclose(np.asarray(nc_k), np.asarray(nc_in), atol=0)
    assert np.asarray(nc_in).sum() > 0


def test_fused_step_speed_clamp():
    """Finite max_speed engages the in-kernel clamp (core.py:268-276)."""
    n, B = 32, 2
    cfg = make_world_cfg(n, 0, agent_size=0.03, landmark_size=0.01,
                         agent_max_speed=0.5)
    apos, avel, aforce, ishape = _fixture(n, B, jax.random.PRNGKey(3))
    aforce = aforce * 10.0  # guarantee some agents exceed the clamp
    npos_x, nvel_x = _xla_step(apos, avel, aforce, cfg)
    npos_k, nvel_k, _, _ = fused_hd_step(
        apos, avel, aforce, ishape, cfg,
        thresh=THRESH, stats="post", interpret=True,
    )
    assert float(jnp.linalg.norm(nvel_x, axis=-1).max()) <= 0.5 + 1e-5
    np.testing.assert_allclose(np.asarray(nvel_k), np.asarray(nvel_x),
                               atol=2e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(npos_k), np.asarray(npos_x),
                               atol=2e-4, rtol=1e-4)
