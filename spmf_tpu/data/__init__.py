"""Data pipeline: numpy-backed datasets of dict batches.

Replaces the reference's ``tf.data.Dataset`` usage (reference:
tests/spmf_test.py:17-27, bin/factorize_csv.py:79-112): batches are dicts
``{'counts' | 'data', 'indices', optional 'normalization'}``. Host-side
numpy is deliberate — device transfer happens once per step in the fit
engine, where shards can be placed directly onto the mesh.
"""
from __future__ import annotations

from typing import Callable, Dict, Iterable, Optional

import numpy as np

__all__ = [
    "ArrayDataset",
    "DeviceArrayDataset",
    "DeviceSparseCounts",
    "as_data_factory",
    "load_csv_counts",
    "SparseCounts",
]


class ArrayDataset:
    """Minimal tf.data-like dataset over aligned arrays.

    Supports ``shuffle().batch().prefetch()`` chaining; each ``__iter__``
    re-shuffles (fresh permutation per epoch, like tf.data's
    reshuffle_each_iteration default).
    """

    def __init__(self, tensors: Dict[str, np.ndarray]):
        self.tensors = {k: np.asarray(v) for k, v in tensors.items()}
        lens = {k: v.shape[0] for k, v in self.tensors.items()}
        if len(set(lens.values())) != 1:
            raise ValueError(f"Misaligned leading dims: {lens}")
        self.num_rows = next(iter(lens.values()))
        self._shuffle = False
        self._seed = None
        self._batch_size: Optional[int] = None
        self._drop_remainder = False
        self._epoch = 0

    @classmethod
    def from_tensor_slices(cls, tensors):
        """tf.data API-parity constructor (reference: spmf_test.py:17)."""
        return cls(tensors)

    def _clone(self):
        new = ArrayDataset.__new__(ArrayDataset)
        new.__dict__.update(self.__dict__)
        new.tensors = self.tensors  # share storage
        return new

    def shuffle(self, buffer_size=None, seed=None):
        new = self._clone()
        new._shuffle = True
        new._seed = seed
        return new

    def batch(self, batch_size: int, drop_remainder: bool = False):
        new = self._clone()
        new._batch_size = int(batch_size)
        new._drop_remainder = drop_remainder
        return new

    def prefetch(self, n=None):
        return self

    def to_device(self, dtype=None):
        """Move the whole dataset into device HBM (DeviceArrayDataset),
        preserving shuffle/batch settings."""
        return DeviceArrayDataset(
            self.tensors, batch_size=self._batch_size, shuffle=self._shuffle,
            seed=self._seed or 0, drop_remainder=self._drop_remainder,
            dtype=dtype,
        )

    def __len__(self):
        if self._batch_size is None:
            return self.num_rows
        if self._drop_remainder:
            return self.num_rows // self._batch_size
        return -(-self.num_rows // self._batch_size)

    def __iter__(self):
        idx = np.arange(self.num_rows)
        if self._shuffle:
            seed = self._seed if self._seed is not None else 0
            rng = np.random.default_rng(seed + self._epoch)
            self._epoch += 1
            rng.shuffle(idx)
        bs = self._batch_size or self.num_rows
        stop = self.num_rows - (self.num_rows % bs) if self._drop_remainder else self.num_rows
        for start in range(0, stop, bs):
            sl = idx[start : start + bs]
            yield {k: v[sl] for k, v in self.tensors.items()}


class DeviceArrayDataset:
    """Device-resident dataset: the full tensors live in HBM once and each
    batch is an on-device gather — no per-step host->device transfer.

    For the scRNA-scale workload (50k x 20k f32 = 4 GB) the whole matrix
    fits v5e HBM comfortably; per-step H2D through the remote-device tunnel
    would otherwise dominate the 70 ms training step.
    """

    def __init__(self, tensors: Dict, batch_size: Optional[int] = None,
                 shuffle: bool = False, seed: int = 0, drop_remainder: bool = False,
                 dtype=None):
        import jax
        import jax.numpy as jnp

        self.tensors = {}
        for k, v in tensors.items():
            arr = jnp.asarray(v)
            if dtype is not None and jnp.issubdtype(arr.dtype, jnp.floating):
                arr = arr.astype(dtype)
            self.tensors[k] = arr
        lens = {k: v.shape[0] for k, v in self.tensors.items()}
        if len(set(lens.values())) != 1:
            raise ValueError(f"Misaligned leading dims: {lens}")
        self.num_rows = next(iter(lens.values()))
        self._batch_size = batch_size
        self._shuffle = shuffle
        self._seed = seed
        self._drop_remainder = drop_remainder
        self._epoch = 0

    def shuffle(self, buffer_size=None, seed=None):
        self._shuffle = True
        if seed is not None:
            self._seed = seed
        return self

    def batch(self, batch_size, drop_remainder=False):
        self._batch_size = int(batch_size)
        self._drop_remainder = drop_remainder
        return self

    def prefetch(self, n=None):
        return self

    def peek_batch(self):
        """First batch WITHOUT a shuffle gather: a contiguous [0:bs) slice.

        The engine's initial-loss eval (display-only; never seeds
        best_loss) used ``next(iter(ds))``, whose shuffled ``jnp.take``
        over the full device-resident tensor materializes a dataset-sized
        HBM temp (measured: a 7.3 GB dataset OOMs a 16 GB chip before
        training even compiles). A plain slice allocates only the batch.
        Does not consume a shuffle epoch."""
        import jax
        bs = min(self._batch_size or self.num_rows, self.num_rows)
        return {
            k: jax.lax.dynamic_slice_in_dim(v, 0, bs)
            for k, v in self.tensors.items()
        }

    def __iter__(self):
        import jax
        import jax.numpy as jnp

        bs = self._batch_size or self.num_rows
        n = self.num_rows
        stop = n - (n % bs) if self._drop_remainder else n
        if self._shuffle:
            key = jax.random.PRNGKey(self._seed + self._epoch)
            self._epoch += 1
            idx = jax.random.permutation(key, n)
        else:
            idx = None
        for start in range(0, stop, bs):
            if idx is not None:
                sl = jax.lax.dynamic_slice_in_dim(idx, start, min(bs, stop - start))
                yield {k: jnp.take(v, sl, axis=0) for k, v in self.tensors.items()}
            else:
                yield {
                    k: jax.lax.dynamic_slice_in_dim(v, start, min(bs, n - start))
                    for k, v in self.tensors.items()
                }


def as_data_factory(data) -> Callable[[], Iterable[dict]]:
    """Normalize any supported data input into a zero-arg factory returning
    an iterable of dict batches.

    Accepts: a factory callable, an ArrayDataset (already batched), any
    re-iterable of dict batches, a dict of arrays (single full batch), or a
    bare 2-D array (treated as counts)."""
    if data is None:
        return None
    if callable(data):
        return data

    def _factory_over(obj):
        f = lambda: iter(obj)  # noqa: E731
        # keep a handle on the source dataset so consumers can use its fast
        # paths (e.g. SparseCounts.col_stats in compute_scales)
        f.source = data
        return f

    if isinstance(data, ArrayDataset):
        return _factory_over(data)
    if isinstance(data, dict):
        batch = {k: np.asarray(v) for k, v in data.items()}
        return _factory_over([batch])
    if isinstance(data, np.ndarray) or hasattr(data, "__array__"):
        arr = np.asarray(data)
        batch = {"counts": arr, "indices": np.arange(arr.shape[0])}
        return _factory_over([batch])
    # assume re-iterable of dict batches
    return _factory_over(data)


def load_csv_counts(path: str, dtype=np.float64) -> np.ndarray:
    """Load a headerless CSV count matrix (reference:
    bin/factorize_csv.py:74-87 semantics, minus tf.data). Uses the native
    C++ parser (spmf_tpu/data/_native) when available, numpy otherwise."""
    from spmf_tpu.data.native import load_csv

    return load_csv(path, dtype=dtype)


from spmf_tpu.data.sparse import DeviceSparseCounts, SparseCounts  # noqa: E402
