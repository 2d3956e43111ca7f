"""YAML config system with hyperpyyaml-style ``!ref`` interpolation.

The reference drives everything from hyperpyyaml files with sections
``log / training / model / data / task / debug`` and references like
``max_seqlen: !ref <data[chunk_size]>``
(/root/reference/FS-EEND/conf/spk_onl_tfm_enc_dec_nonautoreg.yaml:36,
SURVEY.md §5.6).  This module re-implements that surface without the
hyperpyyaml dependency: plain yaml + a resolver for ``!ref <a[b][c]>``
strings (also understood inline without the tag) and simple arithmetic
(``!ref <a[b]> * 2``).
"""

from __future__ import annotations

import copy
import re
from pathlib import Path
from typing import Any

import yaml

_REF_RE = re.compile(r"<([A-Za-z0-9_]+(?:\[[A-Za-z0-9_]+\])*)>")


def _ref_constructor(loader, node):
    return "!ref " + loader.construct_scalar(node)


class _ConfigLoader(yaml.SafeLoader):
    pass


_ConfigLoader.add_constructor("!ref", _ref_constructor)
# tolerate other hyperpyyaml tags by stringifying them
for tag in ("!new:", "!name:", "!apply:"):
    _ConfigLoader.add_multi_constructor(
        tag, lambda loader, suffix, node, _t=tag: f"{_t}{suffix}"
    )


def _lookup(root: dict, path: str) -> Any:
    head, *rest = re.split(r"[\[\]]+", path.strip("[]"))
    cur = root[head]
    for key in rest:
        if key == "":
            continue
        if isinstance(cur, list):
            cur = cur[int(key)]
        else:
            cur = cur[key]
    return cur


def _resolve_value(value: Any, root: dict) -> Any:
    if isinstance(value, str) and value.startswith("!ref "):
        expr = value[len("!ref "):].strip()
        matches = list(_REF_RE.finditer(expr))
        if not matches:
            return expr
        # pure single reference: return the referenced object (any type)
        if len(matches) == 1 and matches[0].group(0) == expr:
            return _resolve_value(_lookup(root, matches[0].group(1)), root)
        # arithmetic expression over references, e.g. "<a[b]> * 2"
        def sub(m):
            v = _resolve_value(_lookup(root, m.group(1)), root)
            return repr(v)
        return eval(_REF_RE.sub(sub, expr), {"__builtins__": {}}, {})  # noqa: S307
    if isinstance(value, dict):
        return {k: _resolve_value(v, root) for k, v in value.items()}
    if isinstance(value, list):
        return [_resolve_value(v, root) for v in value]
    return value


def resolve_refs(cfg: dict) -> dict:
    """Resolve all !ref interpolations against the document root (fixpoint)."""
    cfg = copy.deepcopy(cfg)
    for _ in range(10):
        new = _resolve_value(cfg, cfg)
        if new == cfg:
            return new
        cfg = new
    return cfg


def load_config(path: str | Path, overrides: dict | None = None) -> dict:
    """Load a yaml config file, resolve !ref interpolation, apply overrides.

    Overrides use dotted paths: ``{"training.batch_size": 4}``.
    """
    with open(path) as f:
        cfg = yaml.load(f, Loader=_ConfigLoader)
    if overrides:
        for dotted, val in overrides.items():
            cur = cfg
            *parents, leaf = dotted.split(".")
            for p in parents:
                cur = cur.setdefault(p, {})
            cur[leaf] = val
    return resolve_refs(cfg)


def dump_config(cfg: dict, path: str | Path) -> None:
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f, sort_keys=False)
