"""Scenario registry.

Replaces the reference's path-based plugin loading (``imp.load_source`` over
``formation_gym/envs/<name>.py`` — ``/root/reference/formation_gym/__init__.py:8-9``)
with an explicit registry keyed by the same scenario names.
"""

from __future__ import annotations

from typing import Callable, Dict

from .scenario import Scenario
from .basic_formation import BasicFormationScenario
from .formation_hd import FormationHDScenario, generate_shape, DEFAULT_LAYER_SHAPES
from .formation_hd_obs import FormationHDObsScenario
from .formation_hd_partial import (
    FormationHDPartialScenario,
    FormationHDPartialRangeScenario,
)

SCENARIOS: Dict[str, Callable[..., Scenario]] = {
    "basic_formation_env": BasicFormationScenario,
    "formation_hd_env": FormationHDScenario,
    "formation_hd_obs_env": FormationHDObsScenario,
    "formation_hd_partial_env": FormationHDPartialScenario,
    "formation_hd_partial_range_env": FormationHDPartialRangeScenario,
}


def register(name: str, factory: Callable[..., Scenario]) -> None:
    """Register a custom scenario factory under ``name``."""
    SCENARIOS[name] = factory


def make_scenario(name: str, **kwargs) -> Scenario:
    """Instantiate a scenario by reference-compatible name, with scenario
    kwargs (num_agents, episode_length, …) first-class — fixing the
    reference's unreachable ``make_world`` defaults (SURVEY §8.6)."""
    try:
        factory = SCENARIOS[name]
    except KeyError:
        raise ValueError(
            f"Unknown scenario {name!r}; available: {sorted(SCENARIOS)}"
        ) from None
    return factory(**kwargs)


__all__ = [
    "Scenario",
    "SCENARIOS",
    "register",
    "make_scenario",
    "generate_shape",
    "DEFAULT_LAYER_SHAPES",
    "BasicFormationScenario",
    "FormationHDScenario",
    "FormationHDObsScenario",
    "FormationHDPartialScenario",
    "FormationHDPartialRangeScenario",
]
