"""Pytree checkpointing.

Replaces the reference's in-loop ``tf.train.Checkpoint`` under
``./.tf_ckpts/<uuid>/`` and its dill whole-model pickles (SURVEY.md §5.4)
with flat-npz pytree snapshots (dill-free, portable). For very large or
sharded states, ``OrbaxCheckpointer`` wraps orbax (async-capable,
multi-host-aware, restores with sharding) behind the same save/load shape.
"""
from __future__ import annotations

import json
import os

import jax
import numpy as np

__all__ = ["save_pytree", "load_pytree", "save_fit_state", "load_fit_state",
           "OrbaxCheckpointer"]


class OrbaxCheckpointer:
    """Orbax-backed pytree checkpointing (async, multi-host, sharded
    restore). Use for large fp/dp-sharded surrogate states where host-numpy
    snapshots would gather and serialize through one process.

        ckpt = OrbaxCheckpointer("/path/ckpts")
        ckpt.save(step, params)               # async by default
        params = ckpt.restore(step, like=params)   # keeps shardings of like
    """

    def __init__(self, directory: str, async_save: bool = True):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckpt = (
            ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
            if async_save
            else ocp.Checkpointer(ocp.StandardCheckpointHandler())
        )

    def _path(self, step) -> str:
        return os.path.join(self.directory, f"step_{step}")

    def save(self, step, tree, force: bool = True):
        self._ckpt.save(self._path(step), tree, force=force)
        return self._path(step)

    def wait(self):
        """Block until any in-flight async save completes."""
        if hasattr(self._ckpt, "wait_until_finished"):
            self._ckpt.wait_until_finished()

    def restore(self, step, like):
        """Restore into the dtypes/shardings of ``like``."""
        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(
                jnp_shape(x), x.dtype, sharding=getattr(x, "sharding", None)
            ),
            like,
        )
        return self._ckpt.restore(
            self._path(step),
            args=self._ocp.args.StandardRestore(abstract),
        )

    def steps(self):
        out = []
        for name in os.listdir(self.directory):
            if name.startswith("step_"):
                try:
                    out.append(int(name.split("_", 1)[1]))
                except ValueError:
                    pass
        return sorted(out)

    def close(self):
        self.wait()
        self._ckpt.close()


def jnp_shape(x):
    return tuple(np.shape(x))


def _leaf_entries(tree, prefix: str):
    flat, treedef = jax.tree_util.tree_flatten(tree)
    return {f"{prefix}{i}": np.asarray(x) for i, x in enumerate(flat)}, treedef


def _read_leaves(zf, prefix: str):
    flat = []
    i = 0
    while f"{prefix}{i}" in zf:
        flat.append(zf[f"{prefix}{i}"])
        i += 1
    return flat


def _unflatten_like(flat, like):
    treedef = jax.tree_util.tree_structure(like)
    if len(flat) != treedef.num_leaves:
        raise ValueError(
            f"Checkpoint has {len(flat)} leaves, structure wants {treedef.num_leaves}"
        )
    return jax.tree_util.tree_unflatten(treedef, flat)


def save_pytree(path: str, tree) -> str:
    entries, treedef = _leaf_entries(tree, "leaf_")
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, __treedef__=json.dumps(str(treedef)), **entries)
    return path


def load_pytree(path: str, like):
    """Load leaves saved by save_pytree into the structure of ``like``."""
    with np.load(path, allow_pickle=False) as zf:
        flat = _read_leaves(zf, "leaf_")
    return _unflatten_like(flat, like)


def save_fit_state(path: str, params, opt_state, meta: dict) -> str:
    """Save a full fit-engine state: surrogate params + optimizer state +
    control metadata (lr, best_loss, stall, global epoch).

    The params keep ``save_pytree``'s ``leaf_{i}`` naming, so the file
    remains loadable by ``load_pytree(path, like=params)`` — params-only
    consumers (and pre-full-state engines) read it unchanged. The optimizer
    leaves ride as ``opt_{i}`` and the metadata as a ``__fit_state__``
    JSON blob; ``load_fit_state`` returns all three.
    """
    p_entries, treedef = _leaf_entries(params, "leaf_")
    o_entries, _ = _leaf_entries(opt_state, "opt_")
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(
        path,
        __treedef__=json.dumps(str(treedef)),
        __fit_state__=json.dumps(meta),
        **p_entries,
        **o_entries,
    )
    return path


def load_fit_state(path: str, params_like):
    """Load a checkpoint written by either saver.

    Returns ``(params, opt_leaves, meta)`` where ``params`` has the
    structure of ``params_like``; ``opt_leaves`` is the flat list of
    optimizer-state arrays (``None`` for params-only checkpoints — the
    caller unflattens with its own optimizer treedef, which is not
    serializable); ``meta`` is the control-state dict (``None`` when
    absent).
    """
    with np.load(path, allow_pickle=False) as zf:
        flat = _read_leaves(zf, "leaf_")
        opt = _read_leaves(zf, "opt_")
        meta = (json.loads(str(zf["__fit_state__"]))
                if "__fit_state__" in zf else None)
    params = _unflatten_like(flat, params_like)
    return params, (opt or None), meta
