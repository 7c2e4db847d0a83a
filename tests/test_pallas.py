"""Pallas pair-force kernel tests (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

import gym_formation_tpu as ft
from gym_formation_tpu.core import make_world_cfg
from gym_formation_tpu.core import physics
from gym_formation_tpu.ops.pallas import (
    collision_forces_batched,
    collision_forces_culled,
)


def _f64_oracle(pos, cfg):
    """Direct-delta double-precision reference of core.py:288-322."""
    pos = np.asarray(pos, np.float64)
    delta = pos[:, None, :] - pos[None, :, :]
    dist = np.sqrt((delta**2).sum(-1))
    dmin = cfg.size[:, None] + cfg.size[None, :]
    k = cfg.contact_margin
    pen = np.logaddexp(0.0, -(dist - dmin) / k) * k
    coef = cfg.contact_force * pen / np.maximum(dist, 1e-12)
    ok = (
        cfg.collide[:, None]
        & cfg.collide[None, :]
        & (cfg.movable[:, None] | cfg.movable[None, :])
        & ~np.eye(len(pos), dtype=bool)
    )
    ratio = np.where(cfg.movable[None, :], cfg.mass[None, :] / cfg.mass[:, None], 1.0)
    w = np.where(ok & cfg.movable[:, None], coef * ratio, 0.0)
    return np.einsum("ij,ijp->ip", w, delta)


def test_pallas_kernel_matches_f64_oracle():
    cfg = make_world_cfg(243, 243, agent_size=0.03, landmark_size=0.01)
    B = 5  # odd: exercises batch padding
    pos = jax.random.uniform(
        jax.random.PRNGKey(0), (B, 486, 2), jnp.float32, -0.5, 0.5
    )
    out = np.asarray(collision_forces_batched(pos, cfg, interpret=True))
    for b in range(B):
        np.testing.assert_allclose(
            out[b], _f64_oracle(pos[b], cfg), atol=1e-3, rtol=1e-3
        )


def test_culled_kernel_matches_f64_oracle():
    """The Morton-sorted culled kernel (ops/pallas/pairforce_cull.py) matches
    the f64 oracle at the dense kernel's tolerance — the tile cull only skips
    pairs whose penetration underflows to exactly 0.0f."""
    cfg = make_world_cfg(243, 243, agent_size=0.03, landmark_size=0.01)
    B = 5  # odd: exercises batch padding
    pos = jax.random.uniform(
        jax.random.PRNGKey(0), (B, 486, 2), jnp.float32, -0.5, 0.5
    )
    out = np.asarray(collision_forces_culled(pos, cfg, interpret=True))
    for b in range(B):
        np.testing.assert_allclose(
            out[b], _f64_oracle(pos[b], cfg), atol=1e-3, rtol=1e-3
        )


def test_culled_kernel_heterogeneous_entities():
    """Mixed movable/immovable + collide/non-collide attributes (the hd_obs
    obstacle layout) survive the per-entity attribute folding: immovable
    receivers get zero force, collide=False entities interact with nothing,
    mass ratios match the oracle."""
    cfg = make_world_cfg(
        100, 156, agent_size=0.05, landmark_size=0.04,
        landmark_collide=True, landmark_movable=True,
    )
    # carve out a non-collide, non-movable block to exercise every branch
    cfg.collide[120:180] = False
    cfg.movable[200:] = False
    cfg.mass[50:100] = 2.5
    pos = jax.random.uniform(
        jax.random.PRNGKey(3), (3, 256, 2), jnp.float32, -0.4, 0.4
    )
    out = np.asarray(collision_forces_culled(pos, cfg, interpret=True))
    for b in range(3):
        np.testing.assert_allclose(
            out[b], _f64_oracle(pos[b], cfg), atol=1e-3, rtol=1e-3
        )


def test_culled_equals_dense_on_spread_positions():
    """On widely spread positions (most tiles culled) the culled kernel still
    reproduces the dense kernel: the skipped tiles' pairs each contribute
    exactly +0.0f."""
    cfg = make_world_cfg(128, 128, agent_size=0.03, landmark_size=0.01)
    pos = jax.random.uniform(
        jax.random.PRNGKey(7), (4, 256, 2), jnp.float32, -3.0, 3.0
    )
    dense = np.asarray(collision_forces_batched(pos, cfg, interpret=True))
    culled = np.asarray(collision_forces_culled(pos, cfg, interpret=True))
    np.testing.assert_allclose(culled, dense, atol=2e-4, rtol=1e-4)


def test_both_f32_paths_beat_gram_cancellation():
    """Both shipping f32 paths (XLA direct-delta and the Pallas kernel) stay
    within ~1e-4 of the f64 oracle; the retired gram-matrix formulation loses
    ~3 digits to cancellation near contact — kept here as the reason the
    delta path is the default."""
    cfg = make_world_cfg(128, 128, agent_size=0.05, landmark_size=0.05,
                         landmark_collide=True, landmark_movable=True)
    pos = jax.random.uniform(
        jax.random.PRNGKey(1), (4, 256, 2), jnp.float32, -0.3, 0.3
    )
    pallas_out = np.asarray(collision_forces_batched(pos, cfg, interpret=True))
    xla_out = np.asarray(
        jax.vmap(lambda p: physics._collision_forces_xla(p, cfg))(pos)
    )

    def gram_forces(p):  # the retired formulation
        g = p @ p.T
        r = jnp.diagonal(g)
        dist = jnp.sqrt(jnp.clip(r[:, None] + r[None, :] - 2.0 * g, 0.0))
        size = jnp.asarray(cfg.size, p.dtype)
        dmin = size[:, None] + size[None, :]
        k = cfg.contact_margin
        pen = jnp.logaddexp(0.0, -(dist - dmin) / k) * k
        coef = cfg.contact_force * pen / jnp.maximum(dist, 1e-12)
        ok = ~jnp.eye(256, dtype=bool)
        w = jnp.where(ok, coef, 0.0)
        return w.sum(1, keepdims=True) * p - w @ p

    gram_out = np.asarray(jax.vmap(gram_forces)(pos.astype(jnp.float32)))
    err_p = err_x = err_g = 0.0
    for b in range(4):
        oracle = _f64_oracle(pos[b], cfg)
        err_p = max(err_p, np.abs(pallas_out[b] - oracle).max())
        err_x = max(err_x, np.abs(xla_out[b] - oracle).max())
        err_g = max(err_g, np.abs(gram_out[b] - oracle).max())
    assert err_p < 1e-3 and err_x < 1e-3
    assert err_g > 10 * max(err_p, err_x), (err_g, err_p, err_x)


def test_pallas_dispatch_through_env_step():
    """Forcing pallas mode routes the vmapped env step through the kernel and
    matches the XLA path."""
    env = ft.make_env("formation_hd_env", num_agents=64)
    venv = ft.VecFormationEnv(env, num_envs=4)
    st, _ = venv.reset(jax.random.PRNGKey(0))
    acts = venv.sample_actions(jax.random.PRNGKey(1))
    _, out_xla = venv.step(st, acts)
    physics.set_pallas_mode("on")
    try:
        venv2 = ft.VecFormationEnv(env, num_envs=4)
        st2, _ = venv2.reset(jax.random.PRNGKey(0))
        _, out_pal = venv2.step(st2, acts)
    finally:
        physics.set_pallas_mode("auto")
    np.testing.assert_allclose(
        np.asarray(out_xla.reward), np.asarray(out_pal.reward), atol=1e-3
    )


def test_sym_kernel_matches_f64_oracle():
    """The Newton's-third-law triangle kernel (ops/pallas/pairforce_sym.py)
    matches the f64 oracle on its exactness envelope (uniform all-colliding
    movable entities — the hd colliding subset), both grid variants, odd
    batch (exercises batch/entity padding) and near-contact pairs."""
    from gym_formation_tpu.ops.pallas import collision_forces_sym, sym_applicable

    cfg = make_world_cfg(243, 0, agent_size=0.03, landmark_size=0.01)
    assert sym_applicable(cfg)
    B = 5
    pos = jax.random.uniform(
        jax.random.PRNGKey(0), (B, 243, 2), jnp.float32, -0.5, 0.5
    )
    # force exact-contact and deep-penetration pairs through the kernel
    pos = pos.at[:, 1].set(pos[:, 0] + jnp.asarray([0.04, 0.0], jnp.float32))
    pos = pos.at[:, 2].set(pos[:, 0] + jnp.asarray([0.0, 0.0601], jnp.float32))
    # the shipping default (loop=True, tile=32 — what the auto dispatch uses
    # at E=243) is exercised at oracle tolerance, not just via env-step dispatch
    for kw in (
        {"loop": True, "tile": 16},
        {"loop": True, "tile": 32},
        {"loop": False, "tile": 32},
    ):
        out = np.asarray(collision_forces_sym(pos, cfg, interpret=True, **kw))
        for b in range(B):
            np.testing.assert_allclose(
                out[b], _f64_oracle(pos[b], cfg), atol=1e-3, rtol=1e-3
            )


def test_sym_applicability_gate():
    """sym_applicable rejects heterogeneous worlds (mixed mass/size or
    non-colliding members), and the auto dispatch still routes them through
    the dense kernel with correct results."""
    from gym_formation_tpu.ops.pallas import sym_applicable

    het = make_world_cfg(100, 156, agent_size=0.05, landmark_size=0.04,
                         landmark_collide=True, landmark_movable=True)
    assert not sym_applicable(het)  # mixed sizes
    uni = make_world_cfg(64, 0, agent_size=0.03, landmark_size=0.01)
    assert sym_applicable(uni)
    uni.mass[3] = 2.0
    assert not sym_applicable(uni)
