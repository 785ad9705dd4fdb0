"""CSR-backed sparse count dataset.

Production scRNA matrices (50k cells x 20k genes, ~2-5% nonzero) do not fit
host RAM densely in float64; this stores CSR on host and densifies only the
row minibatch handed to the device — exactly the layout BASELINE.json's
north-star names ("sparse encoder matvec over CSR/segment-sum layouts" is
the device-side continuation; the model consumes dense (B, D) row slabs).
"""
from __future__ import annotations

from typing import Optional

import numpy as np

__all__ = ["DeviceSparseCounts", "SparseCounts"]


class SparseCounts:
    """Row-sliceable CSR counts with the ArrayDataset batching API."""

    def __init__(self, indptr, indices, data, shape, extras: Optional[dict] = None):
        self.indptr = np.asarray(indptr, np.int64)
        self.indices = np.asarray(indices, np.int64)
        self.data = np.asarray(data, np.float64)
        self.shape = tuple(shape)
        self.num_rows = self.shape[0]
        self.extras = dict(extras or {})
        self._shuffle = False
        self._seed = None
        self._batch_size = None
        self._drop_remainder = False
        self._epoch = 0
        self.count_key = "counts"
        self._coo = False
        self._max_nnz = None
        self._pad_bs = None  # batch size an auto-computed _max_nnz was sized for

    # ------------------------------------------------------------ builders
    @classmethod
    def from_dense(cls, x, extras=None):
        x = np.asarray(x)
        indptr = [0]
        indices, data = [], []
        for row in x:
            nz = np.nonzero(row)[0]
            indices.append(nz)
            data.append(row[nz])
            indptr.append(indptr[-1] + len(nz))
        return cls(
            np.asarray(indptr),
            np.concatenate(indices) if indices else np.zeros(0, np.int64),
            np.concatenate(data) if data else np.zeros(0),
            x.shape,
            extras,
        )

    @classmethod
    def from_coo(cls, rows, cols, vals, shape, extras=None):
        order = np.argsort(rows, kind="stable")
        rows, cols, vals = rows[order], cols[order], vals[order]
        indptr = np.zeros(shape[0] + 1, np.int64)
        np.add.at(indptr, rows + 1, 1)
        indptr = np.cumsum(indptr)
        return cls(indptr, cols, vals, shape, extras)

    @classmethod
    def from_mtx(cls, path, transpose=False, extras=None):
        """10x matrix.mtx (genes x cells) -> cells x genes when transpose."""
        from spmf_tpu.data.native import load_mtx_coo

        rows, cols, vals, shape = load_mtx_coo(path)
        if transpose:
            rows, cols = cols, rows
            shape = (shape[1], shape[0])
        return cls.from_coo(rows, cols, vals, shape, extras)

    # ----------------------------------------------------------- accessors
    def row_slab(self, row_ids) -> np.ndarray:
        """Densify selected rows into a (B, D) float64 slab.

        Fully vectorized: a single fancy-indexed scatter over the batch's
        nonzeros (the per-row Python loop was the host-side bottleneck at
        40k+ rows/sec on a 1-core host)."""
        row_ids = np.asarray(row_ids)
        lo = self.indptr[row_ids]
        counts = self.indptr[row_ids + 1] - lo
        total = int(counts.sum())
        out = np.zeros((len(row_ids), self.shape[1]))
        if total == 0:
            return out
        out_rows = np.repeat(np.arange(len(row_ids)), counts)
        # CSR positions of every nonzero in the batch: each row's run starts
        # at lo[k] and advances by its offset within the run
        run_starts = np.cumsum(counts) - counts
        pos = np.repeat(lo - run_starts, counts) + np.arange(total)
        out[out_rows, self.indices[pos]] = self.data[pos]
        return out

    def batch_coo(self, row_ids):
        """COO triplets (batch-local rows, cols, vals) of the selected rows —
        the device-side sparse training path consumes these directly
        (spmf_tpu.ops.sparse_encode) without densifying."""
        row_ids = np.asarray(row_ids)
        lo = self.indptr[row_ids]
        counts = self.indptr[row_ids + 1] - lo
        total = int(counts.sum())
        out_rows = np.repeat(np.arange(len(row_ids)), counts)
        run_starts = np.cumsum(counts) - counts
        pos = np.repeat(lo - run_starts, counts) + np.arange(total)
        return out_rows, self.indices[pos], self.data[pos]

    def col_stats(self):
        """One streaming pass: column sums + nonzero counts (compute_scales
        support without densifying; reference poisson.py:113-154)."""
        colsums = np.zeros(self.shape[1])
        col_nnz = np.zeros(self.shape[1])
        np.add.at(colsums, self.indices, self.data)
        np.add.at(col_nnz, self.indices, 1.0)
        return colsums[None, :], col_nnz[None, :]

    def row_sums(self):
        counts = np.diff(self.indptr)
        row_ids = np.repeat(np.arange(self.num_rows), counts)
        out = np.zeros(self.num_rows)
        np.add.at(out, row_ids, self.data)
        return out

    @property
    def density(self):
        return len(self.data) / (self.shape[0] * self.shape[1])

    # ------------------------------------------------------------ batching
    def shuffle(self, buffer_size=None, seed=None):
        self._shuffle = True
        self._seed = seed
        return self

    def batch(self, batch_size, drop_remainder=False):
        self._batch_size = int(batch_size)
        self._drop_remainder = drop_remainder
        return self

    def prefetch(self, n=None):
        return self

    def as_coo(self, max_nnz=None):
        """Switch batching to padded COO triplets — the device-side sparse
        training path: batches are {'coo_rows','coo_cols','coo_vals',
        'indices'} with a STATIC nnz padding (zero-valued entries are exact
        no-ops in the sparse energy, and a fixed size avoids per-batch
        recompiles). The model trains without ever densifying (B, D)."""
        self._coo = True
        self._max_nnz = max_nnz
        # a user-supplied pad is authoritative for ANY batch size; clearing
        # the auto-pad provenance also discards a stale auto pad sized for
        # an earlier batch size
        self._pad_bs = None
        return self

    def to_device(self, max_nnz=None, dtype=None, block_rows=None):
        """Move the whole CSR structure into device HBM
        (DeviceSparseCounts): per-batch COO assembly becomes one jitted
        on-device gather, eliminating the host-side repeat/cumsum/copy
        that serialized with the device step on a 1-core host (the r2
        sparse-path bottleneck). Preserves shuffle/batch settings.

        ``block_rows=R`` (r5): build the BLOCK-ALIGNED layout instead —
        rows are grouped into blocks of R CSR-adjacent rows, each block's
        triplets padded to one static per-dataset width. Epochs then
        shuffle BLOCKS (not individual rows): batch assembly is a single
        tiny 2-D row gather, and the blocked COO energy replaces every
        per-nnz scatter/segment op with MXU one-hot contractions
        (models/poisson._coo_log_prob_parts_blocked). Trade-off: rows
        that are CSR-adjacent within a block always share a batch —
        statistically identical for row-exchangeable data, coarser
        mixing when adjacent rows are correlated (shuffle the CSR row
        order once at build time if so). ``num_rows % R`` trailing rows
        are dropped (like drop_remainder)."""
        if max_nnz is None and self._pad_bs is None:
            # forward only a USER-supplied host pad (authoritative for any
            # batch size); an auto pad was sized for a specific batch size
            # and must be recomputed device-side per the batch actually used
            max_nnz = self._max_nnz
        return DeviceSparseCounts(
            self, batch_size=self._batch_size, shuffle=self._shuffle,
            seed=self._seed or 0, drop_remainder=self._drop_remainder,
            max_nnz=max_nnz, dtype=dtype, block_rows=block_rows,
        )

    def _coo_pad_size(self, bs):
        """Static padding: batch-mean nnz + 8 sigma + one max row, rounded
        up to 1024 (overflow falls back to the next multiple — rare, costs
        one recompile)."""
        if self._max_nnz is not None and self._pad_bs in (None, bs):
            # user-supplied (pad_bs None) or auto pad cached for this bs —
            # an auto pad computed for a SMALLER batch size must recompute,
            # not silently undersize
            return int(self._max_nnz)
        row_nnz = np.diff(self.indptr)
        est = bs * row_nnz.mean() + 8.0 * np.sqrt(bs) * row_nnz.std() \
            + row_nnz.max()
        self._max_nnz = int(-(-est // 1024) * 1024)
        self._pad_bs = bs
        return self._max_nnz

    def _coo_batch(self, sl, pad):
        rows, cols, vals = self.batch_coo(sl)
        nnz = len(vals)
        if nnz > pad:  # overflow: next 1024-multiple (recompile, rare)
            pad = int(-(-nnz // 1024) * 1024)
        out_r = np.zeros(pad, np.int32)
        out_c = np.zeros(pad, np.int32)
        out_v = np.zeros(pad, np.float64)
        out_r[:nnz] = rows
        out_c[:nnz] = cols
        out_v[:nnz] = vals
        return {"coo_rows": out_r, "coo_cols": out_c, "coo_vals": out_v,
                "indices": sl}

    def __iter__(self):
        idx = np.arange(self.num_rows)
        if self._shuffle:
            rng = np.random.default_rng((self._seed or 0) + self._epoch)
            self._epoch += 1
            rng.shuffle(idx)
        bs = self._batch_size or self.num_rows
        stop = (
            self.num_rows - (self.num_rows % bs)
            if self._drop_remainder
            else self.num_rows
        )
        pad = self._coo_pad_size(bs) if self._coo else None
        for start in range(0, stop, bs):
            sl = idx[start : start + bs]
            if self._coo:
                batch = self._coo_batch(sl, pad)
            else:
                batch = {"counts": self.row_slab(sl), "indices": sl}
            for k, v in self.extras.items():
                batch[k] = np.asarray(v)[sl]
            yield batch


class DeviceSparseCounts:
    """Device-resident CSR counts: the full nnz triplet arrays live in HBM
    once, and each epoch's shuffled COO stream is decoded ON DEVICE in one
    static-shape pass — the sparse counterpart of DeviceArrayDataset.

    Epoch-decode layout (r5): every epoch covers all rows, so the shuffled
    epoch's triplet stream has a STATIC length (total nnz). Once per epoch
    one jitted dispatch builds ``(erows, ecols, evals)`` in shuffled-row
    order via a scatter+cumsum run decode (slot j's owning row is
    ``cumsum(ones scattered at run starts)`` — O(nnz), no per-batch
    searchsorted) plus one flat gather of cols/vals. Each batch is then
    three ``dynamic_slice``s of the static pad at the batch's nnz offset —
    zero host work and zero H2D per batch (the r4 sparse floor was host
    COO assembly + per-batch transfer). Because every dispatch is
    asynchronous, epoch decode and batch slices pipeline behind the
    previous train step for free.

    Padding overflow (batch nnz > pad) cannot be checked per batch without
    a host sync, so entries would be silently truncated; the pad includes
    +8 sigma + one max row (p(overflow) ~ 1e-15 per batch for shuffled
    rows) and every yielded batch carries its on-device 'coo_nnz' total —
    ``check_overflow()`` (called automatically at each epoch end) raises if
    any batch overflowed.
    """

    def __init__(self, sparse: SparseCounts, batch_size=None, shuffle=False,
                 seed=0, drop_remainder=False, max_nnz=None, dtype=None,
                 block_rows=None):
        import jax.numpy as jnp

        self._host = sparse
        self.shape = sparse.shape
        self.num_rows = sparse.num_rows
        self.count_key = sparse.count_key
        if dtype is None:
            dtype = jnp.float32
        self.dtype = dtype
        self.block_rows = int(block_rows) if block_rows else None
        if self.block_rows:
            self._build_blocked(sparse)
        else:
            self.indptr = jnp.asarray(sparse.indptr, jnp.int32)
            self.indices = jnp.asarray(sparse.indices, jnp.int32)
            self.data = jnp.asarray(sparse.data, dtype)
        self.extras = {k: jnp.asarray(v) for k, v in sparse.extras.items()}
        self._batch_size = batch_size
        self._shuffle = shuffle
        self._seed = seed
        self._drop_remainder = drop_remainder
        self._max_nnz = max_nnz
        self._pad_bs = None  # stays None for a user-supplied max_nnz
        self._epoch = 0
        self._pending_nnz = []

    def _build_blocked(self, sparse):
        """Block-aligned layout (to_device(block_rows=R) docstring): one
        (n_blocks, NBLK) table per triplet component, each block's run
        padded with exact no-ops (val 0, col 0, row_local R-1 — keeps the
        within-block row sort). Built host-side once, vectorized."""
        import jax.numpy as jnp

        R = self.block_rows
        nb = self.num_rows // R
        if nb == 0:
            raise ValueError(
                f"block_rows={R} exceeds the dataset's {self.num_rows} rows")
        indptr = sparse.indptr
        blk_ptr = indptr[: nb * R + 1 : R]                  # (nb+1,)
        blk_nnz = np.diff(blk_ptr)
        nblk = int(-(-int(blk_nnz.max()) // 128) * 128)     # lane-aligned
        total = int(blk_ptr[-1] - blk_ptr[0])
        cols_blk = np.zeros((nb, nblk), np.int32)
        vals_blk = np.zeros((nb, nblk), np.float64)
        rowl_blk = np.full((nb, nblk), R - 1, np.int32)
        out_blk = np.repeat(np.arange(nb), blk_nnz)
        run_starts = np.cumsum(blk_nnz) - blk_nnz
        off = np.arange(total) - np.repeat(run_starts, blk_nnz)
        # block runs are contiguous in CSR position order, so source
        # positions are simply blk_ptr[0] + arange(total)
        src = np.arange(int(blk_ptr[0]), int(blk_ptr[0]) + total)
        cols_blk[out_blk, off] = sparse.indices[src]
        vals_blk[out_blk, off] = sparse.data[src]
        rows_global = np.repeat(
            np.arange(nb * R), np.diff(indptr[: nb * R + 1]))
        rowl_blk[out_blk, off] = rows_global % R
        self.n_blocks = nb
        self.block_nnz = nblk
        self.cols_blk = jnp.asarray(cols_blk)
        self.vals_blk = jnp.asarray(vals_blk, self.dtype)
        self.rowl_blk = jnp.asarray(rowl_blk)

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

    def col_stats(self):
        return self._host.col_stats()

    def row_sums(self):
        return self._host.row_sums()

    @property
    def density(self):
        return self._host.density

    def _pad(self, bs):
        # same contract as SparseCounts._coo_pad_size: a user-supplied pad
        # (ctor max_nnz, _pad_bs stays None) is authoritative for any batch
        # size; an auto pad recomputes when the batch size changes (a pad
        # sized for a smaller batch would silently undersize)
        if self._max_nnz is not None and self._pad_bs in (None, bs):
            return int(self._max_nnz)
        self._max_nnz = self._host._coo_pad_size(bs)
        self._pad_bs = bs
        return int(self._max_nnz)

    def _assemble_fn(self, pad, bs):
        # one cached jit per (pad, bs): a fresh wrapper per epoch would
        # retrace every epoch. The CSR arrays are passed as ARGUMENTS, not
        # closed over — closures bake the (possibly multi-100-MB) nnz
        # arrays into the traced computation, which the remote-compile
        # tunnel rejects (HTTP 413; CLAUDE.md)
        cache = getattr(self, "_assemble_cache", None)
        if cache is None:
            cache = self._assemble_cache = {}
        fn = cache.get((pad, bs))
        if fn is None:
            fn = cache[(pad, bs)] = self._make_assemble(pad, bs)
        return fn

    # ------------------------------------------------- blocked batches (r5)
    @staticmethod
    def _blocked_take_math(tables, ids, R):
        """Traced math: one batch of the block-aligned layout — a single
        2-D row gather per component (ids: (Rb,) block ids). The flat
        batch-local row of entry (j, n) is j*R + rowl[j, n] (sorted; pads
        are exact no-ops: val 0, col 0, row_local R-1)."""
        import jax.numpy as jnp

        return {
            "coo_cols": jnp.take(tables["cols"], ids, axis=0),
            "coo_vals": jnp.take(tables["vals"], ids, axis=0),
            "coo_rowl": jnp.take(tables["rowl"], ids, axis=0),
            "indices": (ids[:, None].astype(jnp.int32) * R
                        + jnp.arange(R, dtype=jnp.int32)).reshape(-1),
        }

    def _blocked_tables(self):
        return {"cols": self.cols_blk, "vals": self.vals_blk,
                "rowl": self.rowl_blk}

    def _iter_blocked(self):
        import jax
        import jax.numpy as jnp

        bs = self._batch_size or self.num_rows
        R = self.block_rows
        if bs % R:
            raise ValueError(
                f"batch size {bs} must be a multiple of block_rows={R}")
        Rb = bs // R
        n_use = (self.n_blocks // Rb) * Rb
        dropped = self.num_rows - n_use * R
        if dropped and not self._drop_remainder:
            raise ValueError(
                f"the blocked layout drops the {dropped}-row remainder "
                f"(N={self.num_rows}, batch={bs}, block_rows={R}): pass "
                "drop_remainder=True to batch() to accept this"
            )
        take = getattr(self, "_blocked_take_jit", None)
        if take is None:
            take = self._blocked_take_jit = jax.jit(
                lambda tables, ids: self._blocked_take_math(
                    tables, ids, R))
        idx = np.arange(self.n_blocks)
        if self._shuffle:
            rng = np.random.default_rng(self._seed + self._epoch)
            self._epoch += 1
            rng.shuffle(idx)
        tables = self._blocked_tables()
        for start in range(0, n_use, Rb):
            ids = jnp.asarray(idx[start:start + Rb], jnp.int32)
            batch = dict(take(tables, ids))
            sl = batch["indices"]
            for k, v in self.extras.items():
                batch[k] = v[sl]
            yield batch

    # ---------------------------------------------------- epoch decode (r5)
    @staticmethod
    def _epoch_decode_math(indptr, cols, vals, perm, pad):
        """Traced math: decode the WHOLE shuffled epoch's COO triplets in
        shuffled-row order. Static output size = total nnz (+pad zeros so
        any batch slice stays in bounds). Returns
        {erows (shuffled-row index per slot), ecols, evals, cum (per-row
        inclusive nnz cumsum), perm}."""
        import jax.numpy as jnp

        nnz = cols.shape[0]
        lo = indptr[perm]                              # (N,) CSR run starts
        counts = indptr[perm + 1] - lo                 # (N,)
        cum = jnp.cumsum(counts)                       # (N,) inclusive
        # run decode: scatter a 1 at each row's first slot (rows 1..N-1
        # start at cum[i-1]; zero-count rows stack their starts — add
        # handles duplicates; trailing empty rows scatter at nnz -> drop)
        starts = jnp.zeros(nnz, jnp.int32).at[cum[:-1]].add(
            1, mode="drop", indices_are_sorted=True)
        r = jnp.cumsum(starts)                         # (nnz,) row per slot
        # CSR position of slot j: row r's run begins at epoch offset
        # cum[r-1] and CSR offset lo[r] -> one fused shift gather
        shift = lo - (cum - counts)                    # (N,)
        pos = shift[r] + jnp.arange(nnz, dtype=jnp.int32)
        zpad = ((0, pad),)
        return {
            "erows": jnp.pad(r.astype(jnp.int32), zpad),
            "ecols": jnp.pad(cols[pos], zpad),
            "evals": jnp.pad(vals[pos], zpad),
            "cum": cum,
            "perm": perm,
        }

    @staticmethod
    def _epoch_take_math(ep, b, bs, pad):
        """Traced math: batch ``b`` of an epoch decode — three dynamic
        slices at the batch's nnz offset, masked past the batch's nnz
        (values to 0 = exact no-op in the sparse energy; rows clamped to 0
        so segment_sum(num_segments=bs) stays in range)."""
        import jax
        import jax.numpy as jnp

        start_row = b * bs
        off = jnp.where(b > 0, ep["cum"][jnp.maximum(start_row - 1, 0)], 0)
        end = ep["cum"][start_row + bs - 1]
        bn = end - off
        rows = jax.lax.dynamic_slice_in_dim(ep["erows"], off, pad) - start_row
        cols_ = jax.lax.dynamic_slice_in_dim(ep["ecols"], off, pad)
        vals_ = jax.lax.dynamic_slice_in_dim(ep["evals"], off, pad)
        valid = jnp.arange(pad, dtype=jnp.int32) < bn
        return {
            "coo_rows": jnp.where(valid, rows, 0).astype(jnp.int32),
            "coo_cols": jnp.where(valid, cols_, 0),
            "coo_vals": jnp.where(valid, vals_,
                                  jnp.zeros((), vals_.dtype)),
            "coo_nnz": bn,
            "indices": jax.lax.dynamic_slice_in_dim(
                ep["perm"], start_row, bs),
        }

    def _epoch_fns(self, pad, bs):
        """Cached jitted (decode, take) pair for the iterator path. The
        CSR arrays ride as ARGUMENTS (closures serialize multi-100-MB nnz
        arrays into the remote-compile request — HTTP 413; CLAUDE.md)."""
        import jax

        cache = getattr(self, "_epoch_fn_cache", None)
        if cache is None:
            cache = self._epoch_fn_cache = {}
        fns = cache.get((pad, bs))
        if fns is None:
            decode = jax.jit(
                lambda indptr, cols, vals, perm: self._epoch_decode_math(
                    indptr, cols, vals, perm, pad))
            take = jax.jit(
                lambda ep, b: self._epoch_take_math(ep, b, bs, pad))
            fns = cache[(pad, bs)] = (decode, take)
        return fns

    @staticmethod
    def _make_assemble(pad, bs):
        import jax
        import jax.numpy as jnp

        @jax.jit
        def assemble(indptr, cols, vals, row_ids):
            lo = indptr[row_ids]                       # (B,)
            counts = indptr[row_ids + 1] - lo
            cum = jnp.cumsum(counts)
            total = cum[-1]
            j = jnp.arange(pad, dtype=jnp.int32)
            r = jnp.searchsorted(cum, j, side="right").astype(jnp.int32)
            rc = jnp.minimum(r, bs - 1)
            pos = lo[rc] + (j - (cum[rc] - counts[rc]))
            valid = j < total
            pos = jnp.where(valid, pos, 0)
            return {
                "coo_rows": jnp.where(valid, rc, 0),
                "coo_cols": jnp.where(valid, cols[pos], 0),
                "coo_vals": jnp.where(valid, vals[pos],
                                      jnp.zeros((), vals.dtype)),
                "coo_nnz": total,
            }

        return assemble

    def check_overflow(self):
        """One host fetch for all accumulated per-batch nnz totals; raises
        if any batch exceeded the static pad (silently-truncated energy)."""
        if self.block_rows or not self._pending_nnz:
            # block-aligned layout: the pad is exact by construction
            # (build-time), nothing can overflow
            self._pending_nnz = []
            return
        # entries are per-batch scalars (iterator) and/or per-epoch arrays
        # (the engine's sparse whole-epoch scan); one fetch each
        totals = np.concatenate(
            [np.atleast_1d(np.asarray(t)) for t in self._pending_nnz])
        self._pending_nnz = []
        if (totals > self._max_nnz).any():
            raise ValueError(
                f"device COO batch overflowed the static pad "
                f"(max nnz {int(totals.max())} > pad {self._max_nnz}); "
                "pass a larger max_nnz to to_device()"
            )

    def __iter__(self):
        import jax.numpy as jnp

        if self.block_rows:
            yield from self._iter_blocked()
            return
        bs = self._batch_size or self.num_rows
        n = self.num_rows
        # remainder batches would need their own row-count compile; this
        # dataset always drops the remainder — REFUSE silently-dropped
        # rows unless the caller opted in (an unshuffled remainder would
        # never be trained on at all)
        if n % bs and not self._drop_remainder:
            raise ValueError(
                f"DeviceSparseCounts drops the {n % bs}-row remainder "
                f"(N={n}, batch={bs}, static per-batch compile): pass "
                "drop_remainder=True to batch() to accept this, or a "
                "batch size dividing N"
            )
        stop = n - (n % bs)
        nb = stop // bs
        pad = self._pad(bs)
        decode, take = self._epoch_fns(pad, bs)
        idx = np.arange(n)
        if self._shuffle:
            rng = np.random.default_rng(self._seed + self._epoch)
            self._epoch += 1
            rng.shuffle(idx)
        # truncate the permutation to the consumed rows so the epoch decode
        # is exactly the concatenation of the yielded batches (static size
        # = their total nnz); ONE H2D upload (N int32) per epoch
        perm = jnp.asarray(idx[:stop], jnp.int32)
        ep = decode(self.indptr, self.indices, self.data, perm)
        for b in range(nb):
            # one tiny jitted dispatch per batch (3 dynamic slices + mask);
            # asynchronous, so it pipelines behind the previous train step
            batch = dict(take(ep, b))
            self._pending_nnz.append(batch.pop("coo_nnz"))
            sl = batch["indices"]
            for k, v in self.extras.items():
                batch[k] = v[sl]
            yield batch
        self.check_overflow()
