"""Import harness for the reference implementation at /root/reference.

The reference needs ``gym`` (not installed) and the ``imp`` module (removed
in Python 3.12).  This shim registers minimal stand-ins in ``sys.modules`` so
the reference's *numpy* code — the golden oracle for parity tests — can be
imported unmodified and read-only.  ``multiagent`` (the external MPE package
imported by ``basic_formation_env.py:3-4``) is aliased to ``formation_gym``'s
own core/scenario so the basic scenario runs on the live core.
"""

from __future__ import annotations

import importlib.util
import sys
import types

import numpy as np

REFERENCE_PATH = "/root/reference"


class _Space:
    pass


class _Box(_Space):
    def __init__(self, low=None, high=None, shape=None, dtype=np.float32):
        self.low, self.high, self.shape, self.dtype = low, high, shape, dtype


class _Discrete(_Space):
    def __init__(self, n):
        self.n = n


class _Tuple(_Space):
    def __init__(self, spaces):
        self.spaces = tuple(spaces)


def _install_gym_shim():
    if "gym" in sys.modules:
        return
    gym = types.ModuleType("gym")
    gym.Env = type("Env", (), {"metadata": {}})
    gym.Space = _Space
    spaces_mod = types.ModuleType("gym.spaces")
    spaces_mod.Box = _Box
    spaces_mod.Discrete = _Discrete
    spaces_mod.Tuple = _Tuple
    gym.spaces = spaces_mod
    envs_mod = types.ModuleType("gym.envs")
    reg_mod = types.ModuleType("gym.envs.registration")
    reg_mod.EnvSpec = type("EnvSpec", (), {})
    envs_mod.registration = reg_mod
    gym.envs = envs_mod
    sys.modules["gym"] = gym
    sys.modules["gym.spaces"] = spaces_mod
    sys.modules["gym.envs"] = envs_mod
    sys.modules["gym.envs.registration"] = reg_mod


def _install_imp_shim():
    if "imp" in sys.modules:
        return
    imp_mod = types.ModuleType("imp")

    def load_source(name, pathname):
        spec = importlib.util.spec_from_file_location(name or "refmod", pathname)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    imp_mod.load_source = load_source
    sys.modules["imp"] = imp_mod


def load_reference():
    """Import and return the reference ``formation_gym`` package (or raise)."""
    _install_gym_shim()
    _install_imp_shim()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import formation_gym  # noqa: F401
    import formation_gym.core
    import formation_gym.scenario

    # Alias the external `multiagent` package used by basic_formation_env to
    # the reference's own live core.
    if "multiagent" not in sys.modules:
        ma = types.ModuleType("multiagent")
        ma.core = sys.modules["formation_gym.core"]
        ma.scenario = sys.modules["formation_gym.scenario"]
        sys.modules["multiagent"] = ma
        sys.modules["multiagent.core"] = ma.core
        sys.modules["multiagent.scenario"] = ma.scenario
    return formation_gym


def reference_available() -> bool:
    try:
        load_reference()
        return True
    except Exception:
        return False
