"""Explicit class registry for config-driven dispatch.

The reference dispatches policy/algorithm classes with ``eval(class_name)``
(reference: rsl_rl/runners/on_policy_runner.py:418,424) — a footgun this build
replaces with a named registry. Downstream users register custom classes via
``register("policy", "MyPolicy")`` decorators or pass classes directly.
"""

from __future__ import annotations

from typing import Any, Callable

_REGISTRIES: dict[str, dict[str, Any]] = {
    "policy": {},
    "algorithm": {},
    "env": {},
}


def register(kind: str, name: str | None = None) -> Callable:
    """Class decorator registering ``cls`` under ``kind``/``name``."""

    def deco(cls):
        key = name or cls.__name__
        _REGISTRIES.setdefault(kind, {})[key] = cls
        return cls

    return deco


def resolve(kind: str, name_or_cls: str | type) -> Any:
    """Look up a registered class by name, or pass a class through."""
    if not isinstance(name_or_cls, str):
        return name_or_cls
    registry = _REGISTRIES.get(kind, {})
    if name_or_cls not in registry:
        raise ValueError(
            f"Unknown {kind} class '{name_or_cls}'. Registered: {sorted(registry)}."
            f" Register custom classes with rsl_rl_tpu.utils.register('{kind}', name)."
        )
    return registry[name_or_cls]


def registered(kind: str) -> dict[str, Any]:
    return dict(_REGISTRIES.get(kind, {}))
