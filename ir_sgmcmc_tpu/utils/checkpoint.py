"""Checkpoint / resume for arbitrary JAX state pytrees.

The reference advertises a ``train.py -r checkpoint.pth`` resume flow that
does not exist in its tree (README.md:28-31; SURVEY.md §5.4) — this module
implements it for real, as a capability upgrade.  Checkpoints are plain
``.npz`` archives: every leaf of the state pytree is stored by its flattened
index, plus a JSON metadata record (phase, step, pair index, config name).
Restore requires a template state with the same tree structure (always
available: build the initial state, then load into it), which keeps the
format free of pickled code.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

import jax


def save_checkpoint(path, state, meta: dict | None = None) -> None:
    """Serialise ``state`` (any pytree of arrays) + ``meta`` to ``path``."""
    leaves = jax.tree_util.tree_leaves(state)
    payload = {f"leaf_{i:05d}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    payload["__meta__"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8
    )
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(path.suffix + ".tmp")
    with open(tmp, "wb") as f:
        np.savez(f, **payload)
    tmp.replace(path)


def load_checkpoint(path, like):
    """Load a checkpoint into the structure of the template pytree ``like``.

    :return: ``(state, meta)`` where ``state`` has the tree structure of
        ``like`` with device arrays, and ``meta`` is the stored dict.
    """
    with np.load(path) as archive:
        meta = json.loads(bytes(archive["__meta__"]).decode()) if "__meta__" in archive else {}
        template_leaves, treedef = jax.tree_util.tree_flatten(like)
        n = len(template_leaves)
        n_stored = len([k for k in archive.files if k.startswith("leaf_")])
        if n_stored != n:
            raise ValueError(
                f"{path}: checkpoint has a different number of leaves than "
                f"the template state ({n_stored} vs {n})"
            )
        stored = [archive[f"leaf_{i:05d}"] for i in range(n)]
    leaves = []
    for tpl, arr in zip(template_leaves, stored):
        tpl = np.asarray(tpl)
        if tuple(arr.shape) != tuple(tpl.shape):
            raise ValueError(
                f"{path}: leaf shape mismatch {arr.shape} vs template {tpl.shape}"
            )
        leaves.append(arr.astype(tpl.dtype, copy=False))
    return jax.tree_util.tree_unflatten(treedef, leaves), meta
