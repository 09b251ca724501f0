"""Layered YAML config system over the frozen config dataclasses.

The TPU answer to the reference's OmegaConf stack (OmniRe tools/train.py:
31-52: base yaml -> dataset yaml indirection -> CLI dotlist overrides;
S3's BaseOptions auto-argparse, arguments/gaussian_options.py:3-17):
YAML trees (with `_base_` includes) + "a.b.c=value" dotlist overrides are
deep-merged and materialized into the nested frozen dataclass/NamedTuple
configs, with unknown keys rejected (typo safety the reference lacks).
"""
from __future__ import annotations

import dataclasses
import os
import typing
from typing import Any, get_args, get_origin

import yaml


def load_yaml(path: str) -> dict:
    """Load a YAML file, resolving a `_base_` include chain (child wins)."""
    with open(path) as f:
        data = yaml.safe_load(f) or {}
    base = data.pop("_base_", None)
    if base:
        base_path = os.path.join(os.path.dirname(path), base)
        merged = load_yaml(base_path)
        return deep_merge(merged, data)
    return data


def deep_merge(base: dict, override: dict) -> dict:
    out = dict(base)
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def apply_dotlist(cfg: dict, dotlist: list[str]) -> dict:
    """CLI overrides: ["trainer.lr_means=1e-3", ...] (train.py:31-52)."""
    out = dict(cfg)
    for item in dotlist:
        key, _, raw = item.partition("=")
        val = yaml.safe_load(raw)
        if isinstance(val, str):
            # yaml 1.1 parses "3e-4" as a string; accept C-style floats
            try:
                val = int(val)
            except ValueError:
                try:
                    val = float(val)
                except ValueError:
                    pass
        node = out
        parts = key.strip().split(".")
        for p in parts[:-1]:
            nxt = dict(node.get(p) or {})
            node[p] = nxt
            node = nxt
        node[parts[-1]] = val
    return out


def _is_config_type(t) -> bool:
    return dataclasses.is_dataclass(t) or (
        isinstance(t, type) and issubclass(t, tuple)
        and hasattr(t, "_fields"))


def build(cls, data: dict | None):
    """Materialize a nested dataclass/NamedTuple from a dict tree."""
    data = data or {}
    if dataclasses.is_dataclass(cls):
        fields = {f.name: f for f in dataclasses.fields(cls)}
        defaults = cls()
    else:  # NamedTuple
        fields = {name: None for name in cls._fields}
        defaults = cls()
    unknown = set(data) - set(fields)
    if unknown:
        raise KeyError(
            f"unknown config keys for {cls.__name__}: {sorted(unknown)}")
    kwargs = {}
    try:
        # resolve string annotations (`from __future__ import annotations`)
        hints = typing.get_type_hints(cls)
    except Exception:
        hints = getattr(cls, "__annotations__", {})
    for name in fields:
        if name not in data:
            continue
        v = data[name]
        t = hints.get(name)
        origin = get_origin(t)
        if origin is not None and type(None) in get_args(t):
            inner = [a for a in get_args(t) if a is not type(None)]
            t = inner[0] if inner else None
        if isinstance(v, dict) and t is not None and _is_config_type(t):
            kwargs[name] = build(t, v)
        else:
            kwargs[name] = v
    if dataclasses.is_dataclass(cls):
        return dataclasses.replace(defaults, **kwargs)
    return defaults._replace(**kwargs)


def config_from_files(cls, paths: list[str], dotlist: list[str] = ()):
    data: dict = {}
    for p in paths:
        data = deep_merge(data, load_yaml(p))
    data = apply_dotlist(data, list(dotlist))
    return build(cls, data)
