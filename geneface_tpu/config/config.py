"""Hierarchical YAML configuration for geneface_tpu.

Provides the same *capabilities* as the reference config system
(``/root/reference/utils/commons/hparams.py:17-132``): YAML files that inherit
from one or more ``base_config`` parents (depth-first, later parents and the
child override earlier ones), relative-path resolution of parents, dot-path CLI
overrides (``a.b.c=1``), and persistence of the resolved config into the
experiment work dir so a checkpointed experiment is reproducible.

Unlike the reference there is no global mutable ``hparams`` dict: ``Config`` is
an explicit (frozen-by-convention) mapping passed to tasks/models, which keeps
jitted train steps functionally pure.
"""

from __future__ import annotations

import ast
import copy
import json
import os
import re
from typing import Any, Iterator, Mapping

import yaml

__all__ = ["Config", "load_config", "parse_overrides", "save_config"]


class Config(dict):
    """A dict with attribute access and dot-path get/set.

    ``cfg.lr``, ``cfg["lr"]`` and ``cfg.get("lr")`` are equivalent.
    Nested dicts are wrapped into ``Config`` on access so that
    ``cfg.optimizer.beta1`` works.
    """

    def __getattr__(self, key: str) -> Any:
        try:
            val = self[key]
        except KeyError as e:  # pragma: no cover - attribute protocol
            raise AttributeError(key) from e
        if isinstance(val, dict) and not isinstance(val, Config):
            val = Config(val)
            self[key] = val
        return val

    def __setattr__(self, key: str, value: Any) -> None:
        self[key] = value

    # ---- dot-path helpers -------------------------------------------------
    def get_path(self, path: str, default: Any = None) -> Any:
        node: Any = self
        for part in path.split("."):
            if not isinstance(node, Mapping) or part not in node:
                return default
            node = node[part]
        return node

    def set_path(self, path: str, value: Any) -> None:
        parts = path.split(".")
        node: dict = self
        for part in parts[:-1]:
            nxt = node.get(part)
            if not isinstance(nxt, dict):
                nxt = Config()
                node[part] = nxt
            node = nxt
        node[parts[-1]] = value

    def copy(self) -> "Config":
        return Config(copy.deepcopy(dict(self)))

    def to_dict(self) -> dict:
        out = {}
        for k, v in self.items():
            out[k] = v.to_dict() if isinstance(v, Config) else copy.deepcopy(v)
        return out


def _deep_merge(dst: dict, src: Mapping) -> dict:
    """Merge ``src`` into ``dst`` (src wins); nested dicts merge recursively."""
    for k, v in src.items():
        if isinstance(v, Mapping) and isinstance(dst.get(k), dict):
            _deep_merge(dst[k], v)
        else:
            dst[k] = copy.deepcopy(v)
    return dst


def _resolve_parent(parent: str, child_path: str) -> str:
    """Resolve a ``base_config`` entry relative to the child file or the CWD."""
    if os.path.isabs(parent):
        return parent
    rel = os.path.join(os.path.dirname(child_path), parent)
    if os.path.exists(rel):
        return rel
    return parent  # relative to CWD


def _load_yaml_chain(path: str, _seen: tuple = ()) -> dict:
    if path in _seen:
        raise ValueError(f"base_config cycle detected at {path} (chain: {_seen})")
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    parents = raw.pop("base_config", [])
    if isinstance(parents, str):
        parents = [parents]
    merged: dict = {}
    for parent in parents:
        ppath = _resolve_parent(parent, path)
        _deep_merge(merged, _load_yaml_chain(ppath, _seen + (path,)))
    _deep_merge(merged, raw)
    return merged


_LITERAL_RE = re.compile(r"^[\[\(\{\-\+0-9]")


def _parse_value(text: str) -> Any:
    """Parse a CLI override value: python literal if possible, else string."""
    t = text.strip()
    if t.lower() in ("true", "false"):
        return t.lower() == "true"
    if t.lower() in ("none", "null"):
        return None
    try:
        return ast.literal_eval(t)
    except (ValueError, SyntaxError):
        # support the reference's space-separated list syntax: "[1 1 1]"
        if t.startswith("[") and t.endswith("]") and "," not in t:
            try:
                return ast.literal_eval("[" + ",".join(t[1:-1].split()) + "]")
            except (ValueError, SyntaxError):
                pass
        return t


def parse_overrides(spec: str | list[str] | None) -> dict[str, Any]:
    """Parse ``"a.b=1,c=[1 2 3]"`` (or a list of ``k=v``) into a flat dict."""
    if not spec:
        return {}
    if isinstance(spec, str):
        # split on commas not inside brackets
        items, depth, cur = [], 0, []
        for ch in spec:
            if ch in "[({":
                depth += 1
            elif ch in "])}":
                depth -= 1
            if ch == "," and depth == 0:
                items.append("".join(cur))
                cur = []
            else:
                cur.append(ch)
        if cur:
            items.append("".join(cur))
    else:
        items = list(spec)
    out: dict[str, Any] = {}
    for item in items:
        if not item.strip():
            continue
        if "=" not in item:
            raise ValueError(f"override {item!r} is not of the form key=value")
        k, v = item.split("=", 1)
        out[k.strip()] = _parse_value(v)
    return out


def load_config(
    path: str,
    overrides: str | list[str] | dict | None = None,
    work_dir: str | None = None,
    use_saved: bool = True,
) -> Config:
    """Load a YAML config with ``base_config`` inheritance and overrides.

    If ``work_dir`` contains a previously saved ``config.yaml`` and
    ``use_saved`` is true, the saved config overrides the on-disk YAML chain
    (so a resumed experiment keeps its frozen hyperparameters), and CLI
    overrides win over both — matching the reference's priority order
    ``chain < saved < overrides`` (``hparams.py:84-92``); pass
    ``use_saved=False`` for the reference's ``--reset`` behavior.
    """
    cfg: dict = _load_yaml_chain(path)
    saved = os.path.join(work_dir, "config.yaml") if work_dir else None
    if saved and use_saved and os.path.exists(saved):
        with open(saved) as f:
            _deep_merge(cfg, yaml.safe_load(f) or {})
    if isinstance(overrides, Mapping):
        ov = dict(overrides)
    else:
        ov = parse_overrides(overrides)
    out = Config(cfg)
    for k, v in ov.items():
        out.set_path(k, v)
    if work_dir:
        out["work_dir"] = work_dir
    return out


def save_config(cfg: Config, work_dir: str) -> str:
    os.makedirs(work_dir, exist_ok=True)
    path = os.path.join(work_dir, "config.yaml")
    tmp = path + ".part"
    with open(tmp, "w") as f:
        yaml.safe_dump(cfg.to_dict(), f, sort_keys=True)
    os.replace(tmp, path)
    return path
