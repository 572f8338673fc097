"""Unified model registry.

Replaces the reference's per-project timm @register_model factories
(EfficientViT/classification/model/build.py:71-80, TinyViT/models/tiny_vit.py:641-703)
and TinyCLIP's JSON-config create_model (TinyCLIP/src/open_clip/factory.py:89-213)
with one registry for the whole zoo.
"""
from __future__ import annotations

from typing import Callable

_REGISTRY: dict[str, Callable] = {}


def register_model(fn: Callable | None = None, *, name: str | None = None):
    def _register(f: Callable):
        key = name or f.__name__
        if key in _REGISTRY:
            raise ValueError(f"model '{key}' already registered")
        _REGISTRY[key] = f
        return f
    if fn is not None:
        return _register(fn)
    return _register


def create_model(name: str, **kwargs):
    """Instantiate a registered model definition (a flax Module)."""
    if name not in _REGISTRY:
        raise KeyError(f"unknown model '{name}'; known: {sorted(_REGISTRY)}")
    return _REGISTRY[name](**kwargs)


def list_models(prefix: str = "") -> list[str]:
    return sorted(k for k in _REGISTRY if k.startswith(prefix))
