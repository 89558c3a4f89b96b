"""Hierarchical config trees with composition and CLI overrides.

The reference's third config tier is a Hydra YAML tree
(training/configs/: a root ``config.yaml`` whose ``defaults:`` list
composes group files like ``trainer/default.yaml``,
``optimizer/adamw.yaml``, ``experiment/owt/gpt2s-flash.yaml``, plus
command-line dotlist overrides such as ``trainer.devices=8``;
reference training/run.py:1-30 + configs/config.yaml). This module is
the dependency-free equivalent: the same composition semantics for the
subset the reference's tree actually uses.

Supported (mirroring Hydra where the reference relies on it):
- ``defaults:`` list composition. Entries are ``- group: name`` (loads
  ``<config_dir>/<group>/<name>.yaml`` and merges it under the
  ``group`` key), ``- _self_`` (merges the file's own body at that
  point; appended last when absent, so the file's own keys win), and
  ``- group: null`` (skipped). A composed file may carry a
  ``# @package _global_`` header, in which case it merges at the root
  instead of under its group (Hydra's package directive — the
  reference's ``experiment/*`` files use this to override across
  groups).
- Nested groups (``- experiment/owt: gpt2s`` or group names containing
  ``/``).
- ``${a.b.c}`` interpolation resolved against the composed tree
  (Hydra/OmegaConf-style; unresolvable references — e.g. Hydra runtime
  resolvers like ``${hydra:runtime.cwd}`` — are left as-is rather than
  erroring, since they are meaningless off-Hydra).
- Dotlist overrides with Hydra's grammar subset: ``a.b=v`` (set),
  ``+a.b=v`` (add a key that need not exist), ``~a.b`` (delete).
  Values are parsed as YAML scalars (``true``, ``3e-4``, ``[1,2]``,
  ``null`` all do what they look like).

Not supported (unused by the reference's own configs or meaningless
here): config search-path plugins, ``override hydra/...`` entries
(silently ignored), sweeps/multirun, structured-config schemas.
"""

from __future__ import annotations

import copy
import os
import re
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import yaml

__all__ = [
    "load_config",
    "compose",
    "apply_overrides",
    "merge_trees",
    "resolve_interpolations",
    "select",
    "to_flat_kwargs",
]

_GLOBAL_PKG_RE = re.compile(r"^#\s*@package\s+_global_\s*$", re.MULTILINE)
_INTERP_RE = re.compile(r"\$\{([A-Za-z0-9_.]+)\}")


def _load_yaml(path: str) -> Tuple[Dict[str, Any], bool]:
    """Load one YAML file; returns (tree, is_global_package)."""
    with open(path) as f:
        text = f.read()
    tree = yaml.safe_load(text) or {}
    if not isinstance(tree, dict):
        raise ValueError(f"{path}: top level must be a mapping")
    return tree, bool(_GLOBAL_PKG_RE.search(text))


def merge_trees(dst: Dict[str, Any], src: Dict[str, Any]) -> Dict[str, Any]:
    """Deep-merge ``src`` into ``dst`` (src wins; dicts merge, all other
    values — including lists — replace, matching OmegaConf.merge)."""
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(dst.get(k), dict):
            merge_trees(dst[k], v)
        else:
            dst[k] = copy.deepcopy(v)
    return dst


def _place(tree: Dict[str, Any], group: str, sub: Dict[str, Any],
           is_global: bool) -> None:
    if is_global:
        merge_trees(tree, sub)
        return
    node = tree
    parts = group.split("/")
    for p in parts[:-1]:
        node = node.setdefault(p, {})
        if not isinstance(node, dict):
            raise ValueError(f"group path {group!r} collides with a leaf")
    leaf = parts[-1]
    if isinstance(node.get(leaf), dict):
        merge_trees(node[leaf], sub)
    else:
        node[leaf] = copy.deepcopy(sub)


def compose(path: str,
            group_overrides: Optional[Dict[str, str]] = None
            ) -> Dict[str, Any]:
    """Compose one config file: process its ``defaults:`` list, then (or
    at the ``_self_`` position) its own body. Recursive — composed group
    files may have ``defaults:`` of their own. ``group_overrides`` remap
    which file a group composes (the ``group=name`` CLI form, e.g.
    ``experiment=gpt2s-moe``; ``group=null`` drops the group)."""
    group_overrides = group_overrides or {}
    config_dir = os.path.dirname(os.path.abspath(path))
    body, _ = _load_yaml(path)
    defaults = body.pop("defaults", None)
    if defaults is None:
        return body

    if not isinstance(defaults, list):
        raise ValueError(f"{path}: 'defaults' must be a list")
    if not any(d == "_self_" for d in defaults):
        defaults = list(defaults) + ["_self_"]

    tree: Dict[str, Any] = {}
    for entry in defaults:
        if entry == "_self_":
            # The file's own body merges at root level (its placement
            # under a group, if any, is the CALLER's job via _place).
            merge_trees(tree, body)
            continue
        if isinstance(entry, str):
            # Bare names ('override hydra/...' etc.) — Hydra-internal
            # entries are ignored; a bare group name means group/name
            # syntax was not used, which the reference tree never does.
            if entry.startswith("override"):
                continue
            raise ValueError(f"{path}: unsupported defaults entry {entry!r}")
        if not isinstance(entry, dict) or len(entry) != 1:
            raise ValueError(f"{path}: malformed defaults entry {entry!r}")
        (group, name), = entry.items()
        if group.startswith("override hydra") or group.startswith("hydra"):
            continue
        name = group_overrides.get(group, name)
        if name is None or name == "null":
            continue
        sub_path = os.path.join(config_dir, group, f"{name}.yaml")
        if not os.path.exists(sub_path):
            raise FileNotFoundError(
                f"{path}: defaults entry '{group}: {name}' -> missing "
                f"{sub_path}"
            )
        sub = compose(sub_path, group_overrides)
        _, sub_global = _load_yaml(sub_path)
        _place(tree, group, sub, sub_global)
    return tree


def select(tree: Dict[str, Any], dotted: str, default: Any = None) -> Any:
    """``select(cfg, "optimizer.lr")`` — dotted-path lookup."""
    node: Any = tree
    for p in dotted.split("."):
        if not isinstance(node, dict) or p not in node:
            return default
        node = node[p]
    return node


def _set(tree: Dict[str, Any], dotted: str, value: Any,
         must_exist: bool) -> None:
    parts = dotted.split(".")
    node = tree
    for p in parts[:-1]:
        if p not in node:
            if must_exist:
                raise KeyError(
                    f"override path {dotted!r}: {p!r} not in config "
                    f"(prefix with '+' to add new keys)"
                )
            node[p] = {}
        node = node[p]
        if not isinstance(node, dict):
            raise KeyError(f"override path {dotted!r} crosses leaf {p!r}")
    leaf = parts[-1]
    if must_exist and leaf not in node:
        raise KeyError(
            f"override {dotted!r}: key does not exist "
            f"(prefix with '+' to add new keys)"
        )
    node[leaf] = value


def _delete(tree: Dict[str, Any], dotted: str) -> None:
    parts = dotted.split(".")
    node = tree
    for p in parts[:-1]:
        node = node.get(p)
        if not isinstance(node, dict):
            return
    node.pop(parts[-1], None)


def apply_overrides(tree: Dict[str, Any],
                    overrides: Sequence[str]) -> Dict[str, Any]:
    """Apply a Hydra-style dotlist: ``a.b=v``, ``+a.b=v``, ``~a.b``."""
    for ov in overrides:
        if ov.startswith("~"):
            _delete(tree, ov[1:])
            continue
        add = ov.startswith("+")
        if add:
            ov = ov[1:]
        if "=" not in ov:
            raise ValueError(f"override {ov!r} is not key=value")
        key, _, raw = ov.partition("=")
        _set(tree, key.strip(), _parse_scalar(raw), must_exist=not add)
    return tree


def _parse_scalar(raw: str) -> Any:
    """YAML-parse an override value, with a numeric fallback: YAML 1.1
    reads ``1e-4`` as a string (no dot in the mantissa), but override
    grammars treat it as a float — so do we."""
    if raw == "":
        return ""
    value = yaml.safe_load(raw)
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


def resolve_interpolations(tree: Dict[str, Any]) -> Dict[str, Any]:
    """Resolve ``${a.b}`` references against the tree root. A reference
    that makes up the ENTIRE string keeps the target's type; embedded
    references stringify. Unresolvable references stay literal."""

    def resolve_value(v: Any, depth: int = 0) -> Any:
        if depth > 10:  # interpolation cycle guard
            return v
        if isinstance(v, str):
            m = _INTERP_RE.fullmatch(v)
            if m:
                tgt = select(tree, m.group(1), default=_MISSING)
                if tgt is _MISSING:
                    return v
                return resolve_value(tgt, depth + 1)

            def sub(mm):
                tgt = select(tree, mm.group(1), default=_MISSING)
                return mm.group(0) if tgt is _MISSING else str(tgt)

            return _INTERP_RE.sub(sub, v)
        if isinstance(v, dict):
            return {k: resolve_value(x, depth) for k, x in v.items()}
        if isinstance(v, list):
            return [resolve_value(x, depth) for x in v]
        return v

    _MISSING = object()
    out = resolve_value(tree)
    tree.clear()
    tree.update(out)
    return tree


def load_config(path: str,
                overrides: Sequence[str] = ()) -> Dict[str, Any]:
    """Compose ``path``, apply ``overrides``, resolve interpolations.
    The one-call entry point (≙ ``@hydra.main``).

    An override ``group=name`` whose ``<dir>/<group>/<name>.yaml``
    exists (or whose value is null) is a GROUP override: it swaps which
    file the defaults list composes, like Hydra's ``model=gpt2m``.
    Everything else is a dotlist leaf override.
    """
    config_dir = os.path.dirname(os.path.abspath(path))
    group_ovs: Dict[str, str] = {}
    leaf_ovs: List[str] = []
    for ov in overrides:
        if "=" in ov and not ov.startswith(("+", "~")):
            key, _, val = ov.partition("=")
            if "." not in key and (
                val in ("null", "None")
                or os.path.exists(
                    os.path.join(config_dir, key, f"{val}.yaml")
                )
            ):
                group_ovs[key] = None if val in ("null", "None") else val
                continue
        leaf_ovs.append(ov)
    tree = compose(path, group_ovs)
    apply_overrides(tree, leaf_ovs)
    resolve_interpolations(tree)
    return tree


def to_flat_kwargs(section: Optional[Dict[str, Any]],
                   allowed: Sequence[str]) -> Dict[str, Any]:
    """Project a config section onto a dataclass's field names, so
    ``TrainConfig(**to_flat_kwargs(cfg.get("trainer"), fields))`` works
    with extra keys present in the tree (they are ignored, like Hydra
    targets consuming partial configs)."""
    if not section:
        return {}
    allowed_set = set(allowed)
    return {k: v for k, v in section.items() if k in allowed_set}
