"""Config system: defaults + YAML file merge + dotted-key overrides.

Mirrors the reference's ``cfg_from_file`` / ``cfg_from_list`` public API
(reference: libs/configs/config.py, py-faster-rcnn pattern) on top of
``ml_collections.ConfigDict``.
"""

from __future__ import annotations

from typing import Iterable, Mapping

import ml_collections
import yaml

from detectron_tpu.config.defaults import base_config

__all__ = ["base_config", "get_config", "cfg_from_file", "cfg_from_list"]


def _merge(cfg: ml_collections.ConfigDict, other: Mapping) -> None:
    for key, value in other.items():
        if key not in cfg:
            raise KeyError(f"unknown config key: {key!r}")
        current = cfg[key]
        if isinstance(current, ml_collections.ConfigDict):
            if not isinstance(value, Mapping):
                raise TypeError(f"config key {key!r} expects a mapping")
            _merge(current, value)
        else:
            if isinstance(current, tuple) and isinstance(value, list):
                value = tuple(value)
            cfg[key] = value


def cfg_from_file(path: str, cfg: ml_collections.ConfigDict | None = None):
    """Load a YAML config file and merge it over the defaults."""
    cfg = cfg if cfg is not None else base_config()
    with open(path) as f:
        loaded = yaml.safe_load(f) or {}
    _merge(cfg, loaded)
    return cfg


def cfg_from_list(pairs: Iterable[str], cfg: ml_collections.ConfigDict | None = None):
    """Apply ``key.subkey=value`` override strings (CLI)."""
    cfg = cfg if cfg is not None else base_config()
    for pair in pairs:
        key, _, raw = pair.partition("=")
        if not _:
            raise ValueError(f"override must be key=value, got {pair!r}")
        node = cfg
        parts = key.strip().split(".")
        for part in parts[:-1]:
            node = node[part]
        leaf = parts[-1]
        old = node[leaf]
        value = yaml.safe_load(raw)
        if isinstance(old, tuple) and isinstance(value, list):
            value = tuple(value)
        if isinstance(old, str) and not isinstance(value, str):
            # YAML 1.1 coerces on/off/yes/no to bool (and bare numbers to
            # int): string-typed knobs like model.fused_roi_align=on must
            # keep the literal text
            value = raw.strip()
        node[leaf] = value
    return cfg


def get_config(path: str | None = None, overrides: Iterable[str] = ()):
    """defaults -> optional YAML -> optional CLI overrides."""
    cfg = base_config()
    if path:
        cfg_from_file(path, cfg)
    if overrides:
        cfg_from_list(overrides, cfg)
    return cfg
