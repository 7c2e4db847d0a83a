"""Golden-trajectory parity vs the reference numpy implementation.

For each scenario: seed the reference env exactly as a trainer would
(``env.seed(s); env.reset()``), replay the identical MT19937 reset with
``compat.host_reset``, then step both engines with the same float64 action
sequence and compare observations / rewards / dones per step.

These tests exercise the reference *read-only* through tests/_refshim.py and
skip cleanly if it cannot be imported.
"""

import numpy as np
import pytest
import jax

from _refshim import reference_available, load_reference

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

import gym_formation_tpu as ft  # noqa: E402
from gym_formation_tpu.compat import host_reset  # noqa: E402

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference implementation not importable"
)

SCENARIO_CONFIGS = [
    # (name, num_agents, steps)
    ("formation_hd_env", 3, 40),
    ("formation_hd_env", 9, 15),
    ("basic_formation_env", 3, 40),
    ("formation_hd_obs_env", 4, 30),
    ("formation_hd_partial_env", 5, 30),  # crosses world_length=25 → done parity
    ("formation_hd_partial_range_env", 4, 30),
]


def make_pair(name, num_agents, seed):
    ref = load_reference()
    ref_env = ref.make_env(name, benchmark=False, num_agents=num_agents)
    ref_env.seed(seed)
    ref_obs = ref_env.reset()
    scenario = ft.make_scenario(name, num_agents=num_agents, dtype=jnp.float64)
    env = ft.FormationEnv(scenario, auto_reset=False)
    state = host_reset(scenario, seed)
    state = scenario.pre_obs(state)
    obs = scenario.observe(state)
    return ref_env, ref_obs, env, state, obs


@pytest.mark.parametrize("seed", [7, 19])
@pytest.mark.parametrize("name,n,steps", SCENARIO_CONFIGS)
def test_rollout_parity(name, n, steps, seed):
    ref_env, ref_obs, env, state, obs = make_pair(name, n, seed)
    np.testing.assert_allclose(
        np.asarray(obs), np.stack(ref_obs), atol=1e-12, err_msg="reset obs"
    )
    rng = np.random.RandomState(123)
    step = jax.jit(env.step)
    for t in range(steps):
        acts = rng.uniform(-1, 1, (n, 2))
        # copy: the reference's _set_action scales the caller's array in place
        # (environment.py:216-221 operates on a view)
        ref_obs, ref_rew, ref_done, ref_info = ref_env.step([a.copy() for a in acts])
        state, out = step(state, jnp.asarray(acts))
        np.testing.assert_allclose(
            np.asarray(out.obs), np.stack(ref_obs), atol=1e-9, err_msg=f"obs@{t}"
        )
        np.testing.assert_allclose(
            np.asarray(out.reward),
            np.asarray(ref_rew).reshape(-1),
            atol=1e-9,
            err_msg=f"reward@{t}",
        )
        assert list(np.asarray(out.done)) == list(ref_done), f"done@{t}"
        np.testing.assert_allclose(
            np.asarray(out.info["individual_reward"]),
            np.asarray([i["individual_reward"] for i in ref_info]),
            atol=1e-9,
            err_msg=f"indiv@{t}",
        )


def test_host_reset_matches_reference_world():
    ref = load_reference()
    seed = 11
    ref_env = ref.make_env("formation_hd_env", benchmark=False, num_agents=3)
    ref_env.seed(seed)
    ref_env.reset()
    world = ref_env.world
    scenario = ft.make_scenario("formation_hd_env", num_agents=3, dtype=jnp.float64)
    state = scenario.pre_obs(host_reset(scenario, seed))
    np.testing.assert_allclose(
        np.asarray(state.pos[:3]),
        np.stack([a.state.p_pos for a in world.agents]),
        atol=0,
    )
    # Landmarks in the reference world are recentred by the first obs call.
    np.testing.assert_allclose(
        np.asarray(state.pos[3:]),
        np.stack([l.state.p_pos for l in world.landmarks]),
        atol=1e-12,
    )
    scen_obj = ref_env  # ideal shape lives on the reference Scenario object


def test_benchmark_quartet_matches_reference():
    ref = load_reference()
    seed = 3
    name, n = "formation_hd_env", 3
    ref_env = ref.make_env(name, benchmark=True, num_agents=n)
    ref_env.seed(seed)
    ref_env.reset()
    scenario = ft.make_scenario(name, num_agents=n, dtype=jnp.float64)
    env = ft.FormationEnv(scenario, benchmark=True, auto_reset=False)
    state = scenario.pre_obs(host_reset(scenario, seed))
    rng = np.random.RandomState(5)
    step = jax.jit(env.step)
    # Find the scenario object the reference wired as info_callback.
    ref_bench = ref_env.info_callback
    for t in range(10):
        acts = rng.uniform(-1, 1, (n, 2))
        ref_env.step([a.copy() for a in acts])
        state, out = step(state, jnp.asarray(acts))
        ref_q = [ref_bench(a, ref_env.world) for a in ref_env.world.agents]
        np.testing.assert_allclose(
            np.asarray(out.info["reward"]),
            [q["reward"] for q in ref_q],
            atol=1e-9,
        )
        np.testing.assert_allclose(
            np.asarray(out.info["collisions"]), [q["collisions"] for q in ref_q]
        )
        np.testing.assert_allclose(
            np.asarray(out.info["min_dists"]),
            [q["min_dists"] for q in ref_q],
            atol=1e-9,
        )
        np.testing.assert_allclose(
            np.asarray(out.info["occupied_landmarks"]),
            [q["occupied_landmarks"] for q in ref_q],
        )


@pytest.mark.parametrize(
    "name,n,steps",
    [("formation_hd_env", 3, 40), ("formation_hd_partial_range_env", 4, 26)],
)
def test_bit_exact_rollout_eager(name, n, steps):
    """BIT-FOR-BIT parity (the BASELINE.json north star) on the primary
    workload: eager float64 execution reproduces the reference's exact bit
    stream for observations and rewards over whole rollouts.  (Under jit,
    XLA fusion reassociates reductions at the 1-ULP level — covered by the
    tolerance-based tests above.)"""
    ref = load_reference()
    ref_env = ref.make_env(name, benchmark=False, num_agents=n)
    ref_env.seed(7)
    ref_obs = ref_env.reset()
    scenario = ft.make_scenario(name, num_agents=n, dtype=jnp.float64)
    env = ft.FormationEnv(scenario, auto_reset=False)
    state = scenario.pre_obs(host_reset(scenario, 7))
    np.testing.assert_array_equal(np.asarray(scenario.observe(state)), np.stack(ref_obs))
    rng = np.random.RandomState(123)
    for t in range(steps):
        acts = rng.uniform(-1, 1, (n, 2))
        ro, rr, _, _ = ref_env.step([a.copy() for a in acts])
        state, out = env.step(state, jnp.asarray(acts))  # eager on purpose
        np.testing.assert_array_equal(
            np.asarray(out.obs), np.stack(ro), err_msg=f"obs bits @{t}"
        )
        assert float(out.reward[0]) == float(np.asarray(rr).reshape(-1)[0]), t


def _make_ref_env(name, n, seed, **env_kwargs):
    """Reference env built like ``make_env`` (``__init__.py:6-17``) but with
    ctor kwargs (``discrete_action``) reachable."""
    import imp  # shimmed by _refshim

    load_reference()
    scen = imp.load_source(
        "", f"/root/reference/formation_gym/envs/{name}.py"
    ).Scenario()
    world = scen.make_world(n)
    import formation_gym.environment as ref_environment

    env = ref_environment.MultiAgentEnv(
        world, scen.reset_world, scen.reward, scen.observation, **env_kwargs
    )
    env.seed(seed)
    return env, env.reset()


@pytest.mark.parametrize(
    "mode", ["discrete_onehot", "discrete_input", "force_discrete"]
)
def test_discrete_action_decode_parity(mode):
    """Golden parity for the reference's other three action decodings
    (``environment.py:194-221``): 5-way one-hot (``discrete_action_space``),
    integer index (``discrete_action_input``), and continuous-snapped-to-
    one-hot (``force_discrete_action``)."""
    name, n, steps, seed = "formation_hd_env", 3, 20, 13
    ref_env, _ = _make_ref_env(name, n, seed, discrete_action=mode == "discrete_onehot")
    if mode == "discrete_input":
        ref_env.discrete_action_input = True  # attribute toggle, as upstream
    if mode == "force_discrete":
        ref_env.force_discrete_action = True

    scenario = ft.make_scenario(name, num_agents=n, dtype=jnp.float64)
    env = ft.FormationEnv(
        scenario,
        auto_reset=False,
        discrete_action=mode == "discrete_onehot",
        discrete_action_input=mode == "discrete_input",
        force_discrete_action=mode == "force_discrete",
    )
    state = scenario.pre_obs(host_reset(scenario, seed))
    rng = np.random.RandomState(99)
    step = jax.jit(env.step)
    for t in range(steps):
        if mode == "discrete_input":
            acts = rng.randint(0, 5, (n, 1))
            ref_acts = [int(a[0]) for a in acts]
        elif mode == "discrete_onehot":
            acts = rng.uniform(0, 1, (n, 5))
            ref_acts = [a.copy() for a in acts]
        else:
            acts = rng.uniform(-1, 1, (n, 2))
            ref_acts = [a.copy() for a in acts]
        ref_obs, ref_rew, _, _ = ref_env.step(ref_acts)
        state, out = step(state, jnp.asarray(acts))
        np.testing.assert_allclose(
            np.asarray(out.obs), np.stack(ref_obs), atol=1e-9, err_msg=f"{mode} obs@{t}"
        )
        np.testing.assert_allclose(
            np.asarray(out.reward),
            np.asarray(ref_rew).reshape(-1),
            atol=1e-9,
            err_msg=f"{mode} reward@{t}",
        )
