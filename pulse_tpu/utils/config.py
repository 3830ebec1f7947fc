"""Hydra-style YAML config tree with group selection and dotted overrides.

≙ the reference's config layer (phc/run_hydra.py:270-345 hydra compose +
phc/data/cfg/** groups env/learning/robot/sim). `load_config` reads the root
defaults, swaps groups via `group=name` args, and applies `a.b.c=value`
overrides — no external dependency beyond pyyaml.
"""

from __future__ import annotations

import copy
import os
from typing import Any

import yaml

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "configs")
GROUPS = ("env", "learning", "robot", "sim")


def _load_yaml(path: str) -> dict:
    with open(path) as fh:
        return yaml.safe_load(fh) or {}


def _parse_value(s: str) -> Any:
    return yaml.safe_load(s)


def _set_dotted(cfg: dict, dotted: str, value: Any) -> None:
    """Strict override: every path component must already exist in the
    composed config (a typoed override must ERROR, not train the wrong
    config silently — round-1 VERDICT weak #5; hydra behaves the same)."""
    keys = dotted.split(".")
    node = cfg
    for i, k in enumerate(keys[:-1]):
        if not isinstance(node, dict) or k not in node:
            raise KeyError(
                f"unknown config key {'.'.join(keys[: i + 1])!r} "
                f"(from override {dotted!r}); available: {sorted(node)[:20]}"
            )
        node = node[k]
    if not isinstance(node, dict) or keys[-1] not in node:
        raise KeyError(
            f"unknown config key {dotted!r}; "
            f"available under {'.'.join(keys[:-1]) or 'root'}: {sorted(node)[:30]}"
        )
    node[keys[-1]] = value


def _load_group_yaml(config_dir: str, group: str, name: str, _seen: tuple = ()) -> dict:
    """Load one group YAML with hydra-style group-level `defaults:` inheritance
    (≙ phc/data/cfg group defaults semantics): a group file may name one or
    more base files in the SAME group; bases compose first (in order), then
    the file's own keys win. Chains are followed; cycles error."""
    if name in _seen:
        raise ValueError(f"cyclic defaults in {group}/: {' -> '.join(_seen + (name,))}")
    node = _load_yaml(os.path.join(config_dir, group, f"{name}.yaml"))
    bases = node.pop("defaults", None)
    if bases is None:
        return node
    if isinstance(bases, str):
        bases = [bases]
    merged: dict = {}
    for base in bases:
        merged.update(_load_group_yaml(config_dir, group, base, _seen + (name,)))
    merged.update(node)
    return merged


def load_config(overrides: list[str] | None = None, config_dir: str | None = None) -> dict:
    config_dir = config_dir or CONFIG_DIR
    root = _load_yaml(os.path.join(config_dir, "config.yaml"))
    defaults = root.pop("defaults", {})
    overrides = list(overrides or [])

    # group selections: env=im_vae etc.
    selections = dict(defaults)
    rest = []
    for ov in overrides:
        key, _, val = ov.partition("=")
        if key in GROUPS:
            selections[key] = val
        else:
            rest.append(ov)

    cfg = dict(root)
    for group, name in selections.items():
        cfg[group] = _load_group_yaml(config_dir, group, name)
        cfg[group]["_name"] = name

    for ov in rest:
        key, _, val = ov.partition("=")
        _set_dotted(cfg, key, _parse_value(val))
    return cfg
