"""Config system: dataclass trees ⇄ YAML / CLI overrides.

Unifies the reference's heterogeneous flag surfaces (argparse per trainer,
``maddpg-v1/common/arguments.py``; ~70 flags in ``maddpg-v5/config.py:4-194``;
YAML in ``maddpg-v4/parameters.yaml`` loaded by ``utils.py:32-38``) into one
mechanism: every algo/env config is a frozen dataclass; ``load_config`` merges
YAML and ``key=value`` overrides onto the defaults.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Mapping, Optional, Sequence, Type, TypeVar

T = TypeVar("T")


def to_dict(cfg: Any) -> Dict[str, Any]:
    return dataclasses.asdict(cfg)


def from_dict(cls: Type[T], d: Mapping[str, Any]) -> T:
    """Build a dataclass from a mapping, rejecting unknown keys."""
    fields = {f.name: f for f in dataclasses.fields(cls)}
    unknown = set(d) - set(fields)
    if unknown:
        raise ValueError(f"unknown config keys for {cls.__name__}: {sorted(unknown)}")
    kwargs = {}
    for k, v in d.items():
        ftype = fields[k].type
        if isinstance(v, list):
            v = tuple(v)
        kwargs[k] = v
    return cls(**kwargs)


def _parse_scalar(s: str) -> Any:
    for cast in (int, float):
        try:
            return cast(s)
        except ValueError:
            pass
    if s.lower() in ("true", "false"):
        return s.lower() == "true"
    return s


def load_config(
    cls: Type[T],
    yaml_path: Optional[str] = None,
    overrides: Sequence[str] = (),
) -> T:
    """Defaults ← YAML file ← ``key=value`` override strings."""
    d: Dict[str, Any] = {}
    if yaml_path:
        import yaml

        with open(yaml_path) as f:
            d.update(yaml.safe_load(f) or {})
    for ov in overrides:
        k, _, v = ov.partition("=")
        if not _:
            raise ValueError(f"override must be key=value: {ov!r}")
        d[k.strip()] = _parse_scalar(v.strip())
    return from_dict(cls, d)


def save_config(cfg: Any, yaml_path: str) -> None:
    import yaml

    with open(yaml_path, "w") as f:
        yaml.safe_dump(to_dict(cfg), f, sort_keys=True)
