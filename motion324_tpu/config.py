"""Configuration system: YAML files + ``key.path=value`` CLI overrides.

Capability parity with the reference's OmegaConf-based ``init_config`` /
``process_overrides`` (reference: setup.py:52-89) without the OmegaConf dependency:

- load a YAML file into an attribute-accessible nested dict (:class:`ConfigDict`);
- merge free-form ``a.b.c=value`` CLI overrides, values parsed with YAML semantics
  (``true`` -> bool, ``1e-4`` -> float, ``[1,2]`` -> list, ...);
- ``${a.b.c}`` string interpolation resolved against the merged config
  (reference: configs/dyscene.yaml:55 uses ``${training.wandb_exp_name}``);
- whitespace-normalisation of overrides (``lr = 3`` == ``lr=3``), mirroring the
  regex normalisation at reference setup.py:57-64.
"""

from __future__ import annotations

import copy
import re
from typing import Any, Iterable, Mapping

import yaml

__all__ = ["ConfigDict", "load_config", "merge_overrides", "parse_cli"]

_INTERP_RE = re.compile(r"\$\{([a-zA-Z0-9_.]+)\}")


class ConfigDict(dict):
    """A dict with attribute access and recursive wrapping of nested mappings."""

    def __init__(self, data: Mapping[str, Any] | None = None):
        super().__init__()
        if data:
            for k, v in data.items():
                self[k] = v

    def __setitem__(self, key: str, value: Any) -> None:
        if isinstance(value, Mapping) and not isinstance(value, ConfigDict):
            value = ConfigDict(value)
        elif isinstance(value, list):
            value = [ConfigDict(v) if isinstance(v, Mapping) else v for v in value]
        super().__setitem__(key, value)

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __delattr__(self, name: str) -> None:
        try:
            del self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __deepcopy__(self, memo):
        return ConfigDict({k: copy.deepcopy(v, memo) for k, v in self.items()})

    # ---- dotted-path helpers -------------------------------------------------
    def get_path(self, path: str, default: Any = None) -> Any:
        node: Any = self
        for part in path.split("."):
            if not isinstance(node, Mapping) or part not in node:
                return default
            node = node[part]
        return node

    def set_path(self, path: str, value: Any) -> None:
        parts = path.split(".")
        node = self
        for part in parts[:-1]:
            if part not in node or not isinstance(node[part], ConfigDict):
                node[part] = ConfigDict()
            node = node[part]
        node[parts[-1]] = value

    def to_dict(self) -> dict:
        out: dict = {}
        for k, v in self.items():
            if isinstance(v, ConfigDict):
                out[k] = v.to_dict()
            elif isinstance(v, list):
                out[k] = [x.to_dict() if isinstance(x, ConfigDict) else x for x in v]
            else:
                out[k] = v
        return out


def _parse_value(text: str) -> Any:
    """Parse an override value with YAML scalar semantics.

    YAML 1.1 does not recognise ``4e-4`` (no dot) as a float, so values that
    round-trip through ``float()`` but not YAML are parsed as floats explicitly.
    """
    try:
        value = yaml.safe_load(text)
    except yaml.YAMLError:
        return text
    if isinstance(value, str):
        try:
            return int(value)
        except ValueError:
            pass
        try:
            return float(value)
        except ValueError:
            pass
    return value


def parse_cli(argv: Iterable[str]) -> dict[str, Any]:
    """Turn ``["a.b=1", "c", "=", "2"]``-style args into {path: value}.

    Tokens are first re-joined and whitespace around ``=`` collapsed so that
    ``lr = 3e-4`` and ``lr=3e-4`` are equivalent (reference setup.py:57-64).
    """
    joined = " ".join(argv)
    joined = re.sub(r"\s*=\s*", "=", joined)
    overrides: dict[str, Any] = {}
    for tok in joined.split():
        if "=" not in tok:
            raise ValueError(f"Override {tok!r} is not of the form key=value")
        key, _, raw = tok.partition("=")
        overrides[key] = _parse_value(raw)
    return overrides


def merge_overrides(cfg: ConfigDict, overrides: Mapping[str, Any]) -> ConfigDict:
    for path, value in overrides.items():
        cfg.set_path(path, value)
    return cfg


def _resolve_interpolations(cfg: ConfigDict) -> None:
    """Resolve ``${a.b}`` references in string values, in place (multi-pass)."""

    def resolve_str(s: str) -> Any:
        m = _INTERP_RE.fullmatch(s)
        if m:  # whole-string reference: preserve referenced type
            return cfg.get_path(m.group(1), s)

        def sub(match: re.Match) -> str:
            v = cfg.get_path(match.group(1))
            return s if v is None else str(v)

        return _INTERP_RE.sub(sub, s)

    def walk(node: Any) -> Any:
        if isinstance(node, ConfigDict):
            for k, v in list(node.items()):
                node[k] = walk(v)
            return node
        if isinstance(node, list):
            return [walk(v) for v in node]
        if isinstance(node, str) and "${" in node:
            return resolve_str(node)
        return node

    for _ in range(4):  # bounded passes handle chained references
        walk(cfg)


def load_config(path: str, overrides: Iterable[str] | Mapping[str, Any] | None = None) -> ConfigDict:
    """Load a YAML config, apply CLI overrides, resolve interpolations."""
    with open(path) as f:
        data = yaml.safe_load(f) or {}
    cfg = ConfigDict(data)
    if overrides is not None:
        if not isinstance(overrides, Mapping):
            overrides = parse_cli(overrides)
        merge_overrides(cfg, overrides)
    _resolve_interpolations(cfg)
    return cfg
