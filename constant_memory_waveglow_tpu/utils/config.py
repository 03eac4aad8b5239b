"""Config / registry plumbing.

The reference drives every experiment from a JSON file with uniform
``{"type": ClassName, "args": {...}}`` blocks instantiated by reflection
(``utils.py:5-6`` in the reference, consumed at ``model/lightning.py:33-49``).
We keep the exact same JSON schema so reference config files work unmodified,
but resolve class names through explicit registries instead of ``getattr``
reflection.
"""

from __future__ import annotations

import json
from typing import Any, Callable, Dict


class Registry:
    """Name -> constructor registry (the TPU build's answer to reflection)."""

    def __init__(self, kind: str):
        self.kind = kind
        self._entries: Dict[str, Callable] = {}

    def register(self, name: str = None):
        def deco(fn):
            self._entries[name or fn.__name__] = fn
            return fn

        return deco

    def __contains__(self, name: str) -> bool:
        return name in self._entries

    def __getitem__(self, name: str) -> Callable:
        try:
            return self._entries[name]
        except KeyError:
            raise KeyError(
                f"Unknown {self.kind} type {name!r}; known: {sorted(self._entries)}"
            ) from None

    def names(self):
        return sorted(self._entries)


def get_instance(registry: Registry, config: Dict[str, Any], *args, **extra):
    """Instantiate ``config = {"type": ..., "args": {...}}`` from a registry.

    Mirrors reference ``utils.py:5-6`` (``get_instance(module, config)``).
    """
    kwargs = dict(config.get("args", {}))
    kwargs.update(extra)
    return registry[config["type"]](*args, **kwargs)


def load_config(path: str) -> Dict[str, Any]:
    with open(path) as f:
        return json.load(f)
