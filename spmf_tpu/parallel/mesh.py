"""Device-mesh sharding utilities.

TPU-native replacement for the reference's ``tf.distribute`` strategy hook
(reference: mederrata_spmf/poisson.py:60 — a ``strategy`` kwarg threaded into
variable builders, only ever used as single-host MirroredStrategy). Here the
parallelism is explicit and orthogonal to the models:

- **dp** (rows): minibatch rows are sharded across the mesh; the scalar ELBO
  reduction makes XLA insert gradient ``psum`` over ICI automatically.
- **fp** (features): for very wide matrices (20k+ genes) the feature dim D of
  ``u, v, w, s`` (and the data columns) can additionally be sharded; the
  encode contraction ``(B,D)@(D,K)`` then becomes a mesh-contracted einsum
  with a ``psum`` over the fp axis (SURVEY.md §5.7/§5.8).

Multi-host: build the mesh from ``jax.devices()`` after
``jax.distributed.initialize()`` — nothing else changes.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "make_multislice_mesh",
    "data_parallel_mesh",
    "shard_batch",
    "replicate",
    "shard_params_feature_dim",
]


def make_mesh(shape=None, axis_names=("dp",), devices=None) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)


def make_multislice_mesh(ici_shape=None, ici_axis_names=("dp",),
                         dcn_axis="dcn", devices=None) -> Mesh:
    """Mesh for multi-slice TPU pods (SURVEY.md §5.8: "psum over ICI, and
    DCN for multi-slice"): the OUTER ``dcn`` axis enumerates slices so that
    only the data-parallel gradient psum crosses the data-center network,
    while the inner ICI axes (dp/fp within a slice) carry the
    bandwidth-hungry contraction collectives.

    Devices are grouped by ``slice_index`` (real multi-slice TPU) or, when
    absent, by ``process_index`` (CPU/multi-host stand-ins — a process
    boundary is the DCN stand-in jax.distributed's Gloo backend provides,
    tests/test_multiprocess.py). Each group reshapes to ``ici_shape``
    (default: all of the slice's devices on the first ICI axis). The
    engine shards batch rows over ``(dcn, dp)`` jointly and replicates
    parameters over ``dcn`` — see vi/minibatch.py data_axis handling and
    docs/API.md "Multi-slice (DCN) recipe"."""
    devices = list(devices) if devices is not None else jax.devices()

    def group_by(keyfn):
        groups = {}
        for d in devices:
            groups.setdefault(keyfn(d), []).append(d)
        return [groups[k] for k in sorted(groups)]

    slices = (group_by(lambda d: d.slice_index)
              if getattr(devices[0], "slice_index", None) is not None
              else [])
    if len(slices) <= 1:
        # no real slice topology (CPU stand-ins report slice_index 0 for
        # every device): a PROCESS is the slice stand-in — its boundary is
        # where jax.distributed's collectives leave shared memory, the
        # closest analogue of DCN available off-pod
        slices = group_by(lambda d: d.process_index)
    per = len(slices[0])
    if any(len(s) != per for s in slices):
        raise ValueError(
            "multislice mesh needs equally-sized slices; got "
            f"{[len(s) for s in slices]} devices per slice"
        )
    if ici_shape is None:
        ici_shape = (per,) + (1,) * (len(ici_axis_names) - 1)
    arr = np.asarray(slices).reshape((len(slices),) + tuple(ici_shape))
    return Mesh(arr, (dcn_axis,) + tuple(ici_axis_names))


def data_parallel_mesh(num_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()[: num_devices or len(jax.devices())]
    return make_mesh((len(devices),), ("dp",), devices)


def shard_batch(batch: dict, mesh: Mesh, axis: str = "dp") -> dict:
    """Place a dict batch with rows sharded over ``axis`` (replicated on any
    other mesh axes)."""
    out = {}
    for k, v in batch.items():
        arr = jax.numpy.asarray(v)
        spec = P(axis, *([None] * (arr.ndim - 1))) if arr.ndim >= 1 else P()
        out[k] = jax.device_put(arr, NamedSharding(mesh, spec))
    return out


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


# Feature-dim axis position per variable of the factorization models:
# u (D,K) -> 0, v (K,D) -> 1, w (1,D) -> 1, s (2,D) -> 1, and the same for
# every horseshoe auxiliary (they share their primary's shape).
_FEATURE_AXIS = {"u": 0, "v": 1, "w": 1, "s": 1}


def _feature_axis_for(name: str) -> Optional[int]:
    for stem, ax in _FEATURE_AXIS.items():
        if name == stem or name.startswith(stem + "_"):
            return ax
    return None


def shard_params_feature_dim(params: dict, mesh: Mesh, axis: str = "fp") -> dict:
    """Shard the feature dimension D of the surrogate parameter pytree over
    ``axis`` (u_tau* have latent-dim shapes (1,K) and stay replicated)."""
    out = {}
    for name, leafs in params.items():
        ax = _feature_axis_for(name)
        new = {}
        for pname, arr in leafs.items():
            if ax is None or arr.shape[ax] == 1 or (arr.shape[ax] % mesh.shape[axis]) != 0:
                spec = P()
            else:
                spec = P(*[axis if i == ax else None for i in range(arr.ndim)])
            new[pname] = jax.device_put(arr, NamedSharding(mesh, spec))
        out[name] = new
    return out
