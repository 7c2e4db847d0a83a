"""Scenario-level behavior tests (obs layouts, reward semantics, quirks)."""

import numpy as np
import jax
import jax.numpy as jnp

import gym_formation_tpu as ft
from gym_formation_tpu.compat import state_from_numpy
from gym_formation_tpu.ops import center, hausdorff


def test_all_scenarios_obs_dims(key):
    expected = {
        "basic_formation_env": 4 + 2 * 3 + 4 * 2,
        "formation_hd_env": 18,
        "formation_hd_obs_env": 2 + 2 * 7 + 4 * 2,
        "formation_hd_partial_env": 2 + 2 * 5 + 2 * 3 + 2 * 2,
        "formation_hd_partial_range_env": 2 + 2 * 4 + 4 * 2,
    }
    for name, dim in expected.items():
        env = ft.make_env(name, num_agents=3)
        _, obs = env.reset(key)
        assert obs.shape == (3, dim), name
        assert np.isfinite(np.asarray(obs)).all(), name


def test_hd_reward_translation_invariance():
    scen = ft.make_scenario("formation_hd_env", num_agents=3)
    apos = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
    shape = apos - apos.mean(0)
    s1 = state_from_numpy(scen, apos, apos, ideal_shape=shape)
    s2 = state_from_numpy(scen, apos + 5.0, apos, ideal_shape=shape)
    r1, r2 = scen.reward(s1), scen.reward(s2)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-5)
    # perfect formation, zero ideal_vel → reward 0
    np.testing.assert_allclose(np.asarray(r1), 0.0, atol=1e-6)


def test_hd_collision_threshold_is_halved():
    scen = ft.make_scenario("formation_hd_env", num_agents=3)
    # agents at distance 0.04: > (0.03+0.03)/2 = 0.03 → NOT a collision in hd
    apos = np.array([[0.0, 0.0], [0.04, 0.0], [5.0, 5.0]])
    shape = center(jnp.asarray(apos)).astype(jnp.float32)
    s = state_from_numpy(scen, apos, apos, ideal_shape=np.asarray(shape))
    base = float(scen.reward(s)[0])
    # distance 0.02 < 0.03 → collision for both involved agents
    apos2 = np.array([[0.0, 0.0], [0.02, 0.0], [5.0, 5.0]])
    s2 = state_from_numpy(scen, apos2, apos, ideal_shape=np.asarray(shape))
    r2 = np.asarray(scen.reward(s2))
    assert r2[0] < float(scen.reward(s)[0])  # collision penalty applied
    assert r2[0] - r2[2] == -1.0  # exactly one collision each for pair


def test_basic_reward_counts_self_collision():
    """Reference quirk: basic's collision loop has no self-exclusion
    (`basic_formation_env.py:48-51`), so each agent pays −1 always."""
    scen = ft.make_scenario("basic_formation_env", num_agents=3)
    apos = np.array([[0.0, 0.0], [10.0, 0.0], [0.0, 10.0]])
    s = state_from_numpy(scen, apos, apos)
    r = np.asarray(scen.reward(s))
    # landmarks colocated with agents → spread term 0; only self-collisions
    np.testing.assert_allclose(r, -1.0, atol=1e-5)


def test_obstacle_dynamics():
    scen = ft.make_scenario("formation_hd_obs_env", num_agents=4)
    env = ft.FormationEnv(scen, auto_reset=False)
    state, _ = env.reset(jax.random.PRNGKey(0))
    o0 = np.asarray(state.pos[8:])  # 4 agents + 4 targets + 3 obstacles
    assert (o0[:, 1] >= 2.0).all() and (o0[:, 1] <= 2.5).all()
    step = jax.jit(env.step)
    zero = jnp.zeros((4, env.act_dim))
    for _ in range(30):
        state, _ = step(state, zero)
    o1 = np.asarray(state.pos[8:])
    assert (o1[:, 1] < o0[:, 1] - 1.0).all()  # obstacles fell
    t1 = np.asarray(state.pos[4:8])
    # static targets never move
    np.testing.assert_allclose(t1, np.asarray(env.reset(jax.random.PRNGKey(0))[0].pos[4:8]))


def test_partial_ring_obs():
    scen = ft.make_scenario("formation_hd_partial_env", num_agents=5)
    apos = np.stack([np.array([i, 0.0]) for i in range(5)])
    s = state_from_numpy(scen, apos, np.zeros((5, 2)))
    obs = np.asarray(scen.observe(s))
    # agent 0 sees agents 1,2,3 at rel +1,+2,+3 in x
    ring = obs[0, 2 + 10 : 2 + 10 + 6].reshape(3, 2)
    np.testing.assert_allclose(ring, [[1, 0], [2, 0], [3, 0]], atol=1e-6)
    # agent 4 wraps: sees agents 0,1,2 at rel −4,−3,−2
    ring4 = obs[4, 2 + 10 : 2 + 10 + 6].reshape(3, 2)
    np.testing.assert_allclose(ring4, [[-4, 0], [-3, 0], [-2, 0]], atol=1e-6)


def test_partial_range_clipping():
    scen = ft.make_scenario("formation_hd_partial_range_env", num_agents=4)
    apos = np.array([[0.0, 0.0], [5.0, 0.0], [0.0, 0.1], [-3.0, 0.0]])
    s = state_from_numpy(scen, apos, np.zeros((4, 2)))
    obs = np.asarray(scen.observe(s))
    rel = obs[0, 2 + 8 : 2 + 8 + 6].reshape(3, 2)
    np.testing.assert_allclose(rel[0], [0.7, 0.0], atol=1e-6)  # clipped
    np.testing.assert_allclose(rel[1], [0.0, 0.1], atol=1e-6)  # in range
    np.testing.assert_allclose(rel[2], [-0.7, 0.0], atol=1e-6)  # clipped


def test_hd_pre_obs_recenters_landmarks():
    scen = ft.make_scenario("formation_hd_env", num_agents=3)
    apos = np.array([[1.0, 1.0], [2.0, 1.0], [1.0, 2.0]])
    lpos = np.zeros((3, 2))
    s = state_from_numpy(scen, apos, lpos, ideal_shape=np.zeros((3, 2)))
    s2 = scen.pre_obs(s)
    np.testing.assert_allclose(
        np.asarray(s2.pos[3:].mean(0)), np.asarray(s2.pos[:3].mean(0)), atol=1e-6
    )


def test_generate_shape_nested_and_layers():
    s0 = ft.generate_shape(0)
    assert s0.shape == (3, 2)
    s2 = ft.generate_shape(2)
    assert s2.shape == (3, 3, 3, 2)
    flat = s2.reshape(-1, 2)
    assert flat.shape == (27, 2)
    # custom top-layer shapes apply only at the top (reference quirk §8.8)
    custom = np.tile(ft.generate_shape(0)[None], (4, 1, 1))
    q = ft.generate_shape(1, custom)
    fixed = ft.generate_shape(1, custom, fix_recursion=True)
    assert q.shape == fixed.shape == (3, 3, 2)
    # layer 0 IS the top layer: custom shapes must be returned directly
    my0 = np.arange(6, dtype=float).reshape(1, 3, 2)
    np.testing.assert_allclose(ft.generate_shape(0, my0), my0[0])


def test_hausdorff_matches_scipy():
    from scipy.spatial.distance import directed_hausdorff

    rng = np.random.RandomState(0)
    for _ in range(10):
        a, b = rng.randn(5, 2), rng.randn(7, 2)
        ours = float(hausdorff(jnp.asarray(a), jnp.asarray(b)))
        ref = max(directed_hausdorff(a, b)[0], directed_hausdorff(b, a)[0])
        assert abs(ours - ref) < 1e-6
