"""Checkpoint save/load/average for param/state pytrees (SURVEY.md §5.4).

Self-contained npz format (no orbax version coupling): leaves are stored
under their "/".joined tree paths; static_int metadata is reconstructed from
a template at load.  Includes the reference's uniform checkpoint averaging
(FS-EEND/utlis/avg_ckpt.py:6-22, post-train averaging train_dia.py:166-184).
"""

from __future__ import annotations

import io
import os
import re
from pathlib import Path

import jax
import numpy as np


def _key_str(p) -> str:
    """One path entry -> string: DictKey(.key) / SequenceKey(.idx) /
    GetAttrKey(.name — optax NamedTuple states) / FlattenedIndexKey."""
    if hasattr(p, "key"):
        return str(p.key)
    if hasattr(p, "idx"):
        return str(p.idx)
    if hasattr(p, "name"):
        return str(p.name)
    return str(p)


def _path_key(path) -> str:
    return "/".join(_key_str(p) for p in path)


def _flatten(tree):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {_path_key(path): np.asarray(leaf) for path, leaf in flat}


def save_pytree(path: str | Path, tree, extra: dict | None = None) -> None:
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    data = _flatten(tree)
    if extra:
        for k, v in extra.items():
            data[f"__extra__/{k}"] = np.asarray(v)
    np.savez(path, **data)


def load_flat(path: str | Path) -> dict:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def load_pytree(path: str | Path, template):
    """Load into the structure of `template` (which supplies static metadata
    and tree structure)."""
    flat = load_flat(path)

    def fill(p, leaf):
        key = _path_key(p)
        if key not in flat:
            raise KeyError(f"checkpoint missing leaf {key}")
        arr = flat[key]
        assert arr.shape == tuple(leaf.shape), f"{key}: {arr.shape} vs {leaf.shape}"
        return arr

    return jax.tree_util.tree_map_with_path(fill, template)


def has_subtree(path: str | Path, prefix: str) -> bool:
    """True if the checkpoint stores any leaf under `prefix/` (lets callers
    restore optional subtrees — model_state, opt_state — only when saved)."""
    with np.load(path) as z:
        return any(k.startswith(prefix + "/") for k in z.files)


def load_extra(path: str | Path) -> dict:
    return {k[len("__extra__/"):]: v for k, v in load_flat(path).items()
            if k.startswith("__extra__/")}


def average_checkpoints(paths: list[str | Path], template):
    """Uniform average over checkpoint files (the reference's DER-critical
    10-epoch parameter average, FS-EEND/README.md:56)."""
    flats = [load_flat(p) for p in paths]

    def avg(p, leaf):
        key = _path_key(p)
        stack = np.stack([f[key].astype(np.float64) for f in flats])
        return stack.mean(0).astype(flats[0][key].dtype)

    return jax.tree_util.tree_map_with_path(avg, template)


def find_epoch_checkpoints(folder: str | Path, start_epoch: int | None = None,
                           end_epoch: int | None = None) -> list[Path]:
    """Epoch-range checkpoint selection (train_dia.py:166-184 filters
    'epoch=N' from filenames)."""
    out = []
    for p in sorted(Path(folder).glob("*.npz")):
        m = re.search(r"epoch=?(\d+)", p.name)
        if m is None:
            continue
        ep = int(m.group(1))
        if start_epoch is not None and ep < start_epoch:
            continue
        if end_epoch is not None and ep > end_epoch:
            continue
        out.append(p)
    return out
