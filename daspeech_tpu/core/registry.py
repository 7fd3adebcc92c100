"""Minimal name -> class registries (replacing fairseq's
``register_task``/``register_model``/``register_criterion`` triplex,
``fairseq/fairseq/registry.py``)."""

from __future__ import annotations

from typing import Callable, Dict, Type

_REGISTRIES: Dict[str, Dict[str, type]] = {}


def register(kind: str, name: str) -> Callable[[type], type]:
    def deco(cls):
        _REGISTRIES.setdefault(kind, {})
        if name in _REGISTRIES[kind]:
            raise ValueError(f"{kind} {name!r} already registered")
        _REGISTRIES[kind][name] = cls
        cls.registry_name = name
        return cls
    return deco


def lookup(kind: str, name: str) -> type:
    try:
        return _REGISTRIES[kind][name]
    except KeyError:
        avail = sorted(_REGISTRIES.get(kind, {}))
        raise KeyError(f"unknown {kind} {name!r}; available: {avail}")


def register_task(name):
    return register("task", name)


def register_model(name):
    return register("model", name)


def register_criterion(name):
    return register("criterion", name)
