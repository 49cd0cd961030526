"""Checkpoint / resume for arbitrary JAX state pytrees.

The reference advertises a ``train.py -r checkpoint.pth`` resume flow that
does not exist in its tree (README.md:28-31; SURVEY.md §5.4) — this module
implements it for real, as a capability upgrade.  Checkpoints are plain
``.npz`` archives; every leaf of the state pytree is stored **keyed by its
pytree path** (format v2), plus a JSON metadata record (format version,
phase, step, config name).  Restore requires a template state with the same
tree structure (always available: build the initial state, then load into
it), which keeps the format free of pickled code.

Keying by path — instead of the v1 positional ``leaf_%05d`` scheme — means
a reordered or renamed pytree is *rejected* with a precise error rather
than silently loaded into the wrong parameters when shapes happen to match
(e.g. the rank-1 factor ``u`` and the mean ``mu`` share a shape).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

import jax

FORMAT_VERSION = 2
_META_KEY = "__meta__"
_LEAF_PREFIX = "leaf::"


def _path_keys(state) -> tuple[list[str], list, object]:
    """Flatten ``state`` with stable string keys per leaf path."""
    leaves_with_paths, treedef = jax.tree_util.tree_flatten_with_path(state)
    keys = [jax.tree_util.keystr(path) for path, _ in leaves_with_paths]
    leaves = [leaf for _, leaf in leaves_with_paths]
    if len(set(keys)) != len(keys):  # cannot happen for real pytrees
        raise ValueError("state pytree has duplicate path keys")
    return keys, leaves, treedef


def save_checkpoint(path, state, meta: dict | None = None) -> None:
    """Serialise ``state`` (any pytree of arrays) + ``meta`` to ``path``."""
    keys, leaves, _ = _path_keys(state)
    payload = {
        _LEAF_PREFIX + k: np.asarray(leaf) for k, leaf in zip(keys, leaves)
    }
    meta = dict(meta or {})
    meta.setdefault("format_version", FORMAT_VERSION)
    payload[_META_KEY] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    )
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(path.suffix + ".tmp")
    with open(tmp, "wb") as f:
        np.savez(f, **payload)
    tmp.replace(path)


def peek_meta(path) -> dict:
    """Read only the metadata record of a checkpoint (cheap dispatch)."""
    with np.load(path) as archive:
        if _META_KEY in archive:
            return json.loads(bytes(archive[_META_KEY]).decode())
    return {}


def load_checkpoint(path, like):
    """Load a checkpoint into the structure of the template pytree ``like``.

    :return: ``(state, meta)`` where ``state`` has the tree structure of
        ``like``, and ``meta`` is the stored dict.
    :raises ValueError: when the stored leaf paths don't exactly cover the
        template's (missing / unexpected keys listed), or any shape differs.
    """
    with np.load(path) as archive:
        meta = (
            json.loads(bytes(archive[_META_KEY]).decode())
            if _META_KEY in archive else {}
        )
        stored_keys = [k for k in archive.files if k.startswith(_LEAF_PREFIX)]
        if not stored_keys and any(
            k.startswith("leaf_") for k in archive.files
        ):
            return _load_v1(path, archive, meta, like)

        template_keys, template_leaves, treedef = _path_keys(like)
        want = {k: tpl for k, tpl in zip(template_keys, template_leaves)}
        have = {k[len(_LEAF_PREFIX):] for k in stored_keys}
        missing = sorted(set(want) - have)
        unexpected = sorted(have - set(want))
        if missing or unexpected:
            raise ValueError(
                f"{path}: checkpoint does not match the template state "
                f"pytree — missing keys {missing[:8]}, "
                f"unexpected keys {unexpected[:8]}"
            )
        leaves = []
        for k, tpl in zip(template_keys, template_leaves):
            arr = archive[_LEAF_PREFIX + k]
            tpl = np.asarray(tpl)
            if tuple(arr.shape) != tuple(tpl.shape):
                raise ValueError(
                    f"{path}: leaf {k!r} shape mismatch "
                    f"{arr.shape} vs template {tpl.shape}"
                )
            leaves.append(arr.astype(tpl.dtype, copy=False))
    return jax.tree_util.tree_unflatten(treedef, leaves), meta


def _load_v1(path, archive, meta, like):
    """Positional v1 (``leaf_%05d``) fallback for round-1 checkpoints."""
    template_leaves, treedef = jax.tree_util.tree_flatten(like)
    n = len(template_leaves)
    n_stored = len([k for k in archive.files if k.startswith("leaf_")])
    if n_stored != n:
        raise ValueError(
            f"{path}: v1 checkpoint has a different number of leaves than "
            f"the template state ({n_stored} vs {n})"
        )
    leaves = []
    for i, tpl in enumerate(template_leaves):
        arr = archive[f"leaf_{i:05d}"]
        tpl = np.asarray(tpl)
        if tuple(arr.shape) != tuple(tpl.shape):
            raise ValueError(
                f"{path}: leaf shape mismatch {arr.shape} vs template "
                f"{tpl.shape}"
            )
        leaves.append(arr.astype(tpl.dtype, copy=False))
    return jax.tree_util.tree_unflatten(treedef, leaves), meta
