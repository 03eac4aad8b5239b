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
        return normalize_config(json.load(f))


def normalize_config(cfg: Dict[str, Any]) -> Dict[str, Any]:
    """Accept both the current config schema and the legacy pytorch-template
    schema (reference ``configs/musicnet_config.json``: ``n_gpu``, nested
    ``data_loader.type/args``, ``sr``/``window_size`` inside arch args, no
    ``conditioner`` block, ``lr_scheduler``/``trainer``/``visualization``
    blocks).  Unknown top-level blocks are simply carried along; legacy
    quirks are rewritten into the current schema."""
    import copy

    cfg = copy.deepcopy(cfg)
    arch_args = cfg.get("arch", {}).get("args", {})
    legacy = {}
    for k in ("sr", "window_size"):
        if k in arch_args:
            legacy[k] = arch_args.pop(k)
    if cfg.get("arch", {}).get("type") in ("WaveGlow", "MelGlow", "MRWaveGlow") \
            and "memory_efficient" not in arch_args:
        arch_args["memory_efficient"] = False

    dl = cfg.get("data_loader", {})
    if "type" in dl:  # legacy nested loader block
        args = dl.get("args", {})
        cfg["dataset"] = {"type": "RandomWAVDataset", "args": {
            "data_dir": args.get("data_dir", "."),
            "size": args.get("size", 10000),
            "segment": args.get("segment", 16000)}}
        cfg["data_loader"] = {
            "batch_size": args.get("batch_size", 1),
            "num_workers": args.get("num_workers", 4)}

    if "conditioner" not in cfg and "arch" in cfg:
        cfg["conditioner"] = {"type": "MelSpec", "args": {
            "sr": legacy.get("sr", 22050),
            "n_fft": legacy.get("window_size", 1024),
            "hop_length": arch_args.get("hop_size", 256),
            "n_mels": arch_args.get("n_mels", 80)}}
    return cfg
