"""Pytree checkpointing.

Replaces the reference's in-loop ``tf.train.Checkpoint`` under
``./.tf_ckpts/<uuid>/`` and its dill whole-model pickles (SURVEY.md §5.4)
with flat-npz pytree snapshots (dill-free, portable). Orbax is available in
the environment for users who want async/multi-host checkpointing of very
large states; these helpers stay dependency-light.
"""
from __future__ import annotations

import json
import os

import jax
import numpy as np

__all__ = ["save_pytree", "load_pytree"]


def save_pytree(path: str, tree) -> str:
    flat, treedef = jax.tree_util.tree_flatten(tree)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(
        path,
        __treedef__=json.dumps(str(treedef)),
        **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)},
    )
    return path


def load_pytree(path: str, like):
    """Load leaves saved by save_pytree into the structure of ``like``."""
    treedef = jax.tree_util.tree_structure(like)
    with np.load(path, allow_pickle=False) as zf:
        flat = []
        i = 0
        while f"leaf_{i}" in zf:
            flat.append(zf[f"leaf_{i}"])
            i += 1
    if len(flat) != treedef.num_leaves:
        raise ValueError(
            f"Checkpoint has {len(flat)} leaves, structure wants {treedef.num_leaves}"
        )
    return jax.tree_util.tree_unflatten(treedef, flat)
