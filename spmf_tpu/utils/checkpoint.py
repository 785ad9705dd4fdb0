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

__all__ = ["save_pytree", "load_pytree", "OrbaxCheckpointer"]


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
