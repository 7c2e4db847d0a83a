"""Property tests for the vectorized physics core."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gym_formation_tpu.core import (
    WallCfg,
    collision_forces,
    integrate,
    make_world_cfg,
    wall_forces,
    world_step,
)


def simple_cfg(**kw):
    return make_world_cfg(2, 1, agent_size=0.1, **kw)


def test_damping_decay_no_force():
    cfg = simple_cfg()
    pos = jnp.array([[0.0, 0.0], [10.0, 0.0], [20.0, 0.0]])
    vel = jnp.array([[1.0, 0.0], [0.0, 2.0], [0.0, 0.0]])
    u = jnp.zeros((2, 2))
    new_pos, new_vel = world_step(pos, vel, u, cfg)
    # far apart → no contact; v' = v (1 - damping)
    np.testing.assert_allclose(np.asarray(new_vel[:2]), np.asarray(vel[:2]) * 0.75, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(new_pos[:2]), np.asarray(pos[:2] + new_vel[:2] * cfg.dt), atol=1e-6
    )
    # landmark (non-movable) untouched
    np.testing.assert_allclose(np.asarray(new_pos[2]), [20.0, 0.0])


def test_action_force_scaling():
    cfg = simple_cfg()
    pos = jnp.array([[0.0, 0.0], [5.0, 0.0], [50.0, 50.0]])
    vel = jnp.zeros((3, 2))
    u = jnp.array([[1.0, 0.0], [0.0, -1.0]])
    _, new_vel = world_step(pos, vel, u, cfg)
    # v = F/m * dt with mass 1, accel None → F = u
    np.testing.assert_allclose(np.asarray(new_vel[0]), [0.1, 0.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_vel[1]), [0.0, -0.1], atol=1e-6)


def test_collision_force_newton_third_law():
    """Equal masses: pair forces are equal/opposite → zero net momentum."""
    cfg = simple_cfg()
    pos = jnp.array([[0.0, 0.0], [0.15, 0.0], [50.0, 50.0]])
    f = collision_forces(pos, cfg)
    assert float(jnp.abs(f[0, 0])) > 0.1  # overlapping: strong push
    np.testing.assert_allclose(np.asarray(f[0] + f[1]), [0.0, 0.0], atol=1e-5)
    # push is along the separation axis, away from each other
    assert float(f[0, 0]) < 0 < float(f[1, 0])


def test_landmark_non_collide_feels_nothing():
    cfg = simple_cfg()
    pos = jnp.array([[0.0, 0.0], [5.0, 0.0], [0.01, 0.0]])  # landmark inside agent 0
    f = collision_forces(pos, cfg)
    np.testing.assert_allclose(np.asarray(f[2]), [0.0, 0.0])
    np.testing.assert_allclose(np.asarray(f[0]), [0.0, 0.0], atol=1e-6)


def test_mass_ratio_asymmetry():
    cfg = make_world_cfg(2, 0, agent_size=0.1)
    cfg.mass[1] = 4.0  # heavy second agent
    pos = jnp.array([[0.0, 0.0], [0.15, 0.0]])
    f = collision_forces(pos, cfg)
    # reference core.py:314-318: f_a = (m_b/m_a) F, f_b = -(m_a/m_b) F
    assert abs(float(f[0, 0])) == pytest.approx(16 * abs(float(f[1, 0])), rel=1e-4)


def test_zero_distance_nan_guard():
    pos = jnp.array([[0.0, 0.0], [0.0, 0.0], [5.0, 5.0]])
    guarded = collision_forces(pos, simple_cfg())
    assert np.isfinite(np.asarray(guarded)).all()
    import dataclasses

    cfg_exact = dataclasses.replace(simple_cfg(), nan_guard=False)
    raw = collision_forces(pos, cfg_exact)
    # reference behavior: 0/0 → NaN (core.py:312, train/README.md:194-205)
    assert np.isnan(np.asarray(raw[:2])).any()


def test_max_speed_clamp():
    cfg = make_world_cfg(1, 0, agent_size=0.1, agent_max_speed=0.5)
    pos = jnp.zeros((1, 2))
    vel = jnp.zeros((1, 2))
    new_pos, new_vel = world_step(pos, vel, jnp.array([[100.0, 0.0]]), cfg)
    assert float(jnp.linalg.norm(new_vel)) == pytest.approx(0.5, rel=1e-5)


def test_wall_force_pushes_back():
    wall = WallCfg(orient="V", axis_pos=1.0, endpoints=(-5.0, 5.0), width=0.1)
    cfg = make_world_cfg(1, 0, agent_size=0.1, walls=(wall,))
    pos = jnp.array([[0.98, 0.0]])  # touching the wall from the left
    f = wall_forces(pos, cfg)
    assert float(f[0, 0]) < 0  # pushed in −x, away from the wall
    far = wall_forces(jnp.array([[0.0, 10.0]]), cfg)  # beyond endpoints
    np.testing.assert_allclose(np.asarray(far), [[0.0, 0.0]])


def test_step_is_jit_and_vmap_safe():
    cfg = simple_cfg()
    B = 16
    pos = jax.random.uniform(jax.random.PRNGKey(0), (B, 3, 2), minval=-1, maxval=1)
    vel = jnp.zeros((B, 3, 2))
    u = jax.random.uniform(jax.random.PRNGKey(1), (B, 2, 2), minval=-1, maxval=1)
    step = jax.jit(jax.vmap(lambda p, v, a: world_step(p, v, a, cfg)))
    new_pos, new_vel = step(pos, vel, u)
    assert new_pos.shape == (B, 3, 2)
    assert np.isfinite(np.asarray(new_pos)).all()


def test_gram_path_matches_bruteforce():
    """≥48 entities takes the gram-matrix/matmul path; verify against a
    brute-force per-pair numpy oracle of the reference formulas."""
    rng = np.random.RandomState(0)
    n_a, n_l = 30, 30
    cfg = make_world_cfg(
        n_a, n_l, agent_size=0.05, landmark_size=0.05,
        landmark_collide=True, landmark_movable=True,
    )
    pos = rng.uniform(-0.3, 0.3, (60, 2))  # dense → plenty of contacts
    f = np.asarray(collision_forces(jnp.asarray(pos), cfg))

    expected = np.zeros((60, 2))
    k = cfg.contact_margin
    for i in range(60):
        for j in range(60):
            if i == j:
                continue
            delta = pos[i] - pos[j]
            dist = np.linalg.norm(delta)
            pen = np.logaddexp(0, -(dist - cfg.size[i] - cfg.size[j]) / k) * k
            expected[i] += cfg.contact_force * delta / dist * pen  # masses all 1
    np.testing.assert_allclose(f, expected, rtol=1e-3, atol=1e-4)
