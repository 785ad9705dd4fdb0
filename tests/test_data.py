"""Data layer: ArrayDataset semantics, native CSV/MTX ingest, CSR dataset."""
import os

import numpy as np
import pytest

from spmf_tpu.data import ArrayDataset, as_data_factory
from spmf_tpu.data.native import load_csv, load_mtx_coo, native_available
from spmf_tpu.data.sparse import SparseCounts

RNG = np.random.default_rng(0)


def test_array_dataset_batching():
    x = RNG.poisson(1.0, (25, 4))
    ds = ArrayDataset({"counts": x, "indices": np.arange(25)}).batch(10)
    batches = list(ds)
    assert [b["counts"].shape[0] for b in batches] == [10, 10, 5]
    ds2 = ArrayDataset({"counts": x, "indices": np.arange(25)}).batch(
        10, drop_remainder=True
    )
    assert [b["counts"].shape[0] for b in ds2] == [10, 10]
    assert len(ds2) == 2


def test_array_dataset_shuffle_reshuffles_each_epoch():
    ds = ArrayDataset({"indices": np.arange(100)}).shuffle(seed=0).batch(100)
    e1 = next(iter(ds))["indices"]
    e2 = next(iter(ds))["indices"]
    assert not np.array_equal(e1, e2)
    assert sorted(e1) == list(range(100))


def test_as_data_factory_accepts_arrays_and_dicts():
    x = RNG.poisson(1.0, (6, 3))
    f = as_data_factory(x)
    b = next(iter(f()))
    assert b["counts"].shape == (6, 3)
    f2 = as_data_factory({"counts": x})
    assert next(iter(f2()))["counts"].shape == (6, 3)


def test_native_csv_matches_numpy(tmp_path):
    x = RNG.poisson(2.0, (40, 7)).astype(float)
    path = str(tmp_path / "m.csv")
    np.savetxt(path, x, delimiter=",")
    out = load_csv(path)
    np.testing.assert_allclose(out, x)
    assert native_available()  # g++ is baked into the image


def test_native_mtx_roundtrip(tmp_path):
    dense = RNG.poisson(0.3, (15, 9)).astype(float)
    rows, cols = np.nonzero(dense)
    path = str(tmp_path / "m.mtx")
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real general\n% comment\n")
        f.write(f"15 9 {len(rows)}\n")
        for r, c in zip(rows, cols):
            f.write(f"{r+1} {c+1} {dense[r,c]}\n")
    r2, c2, v2, shape = load_mtx_coo(path)
    assert shape == (15, 9)
    rebuilt = np.zeros((15, 9))
    rebuilt[r2, c2] = v2
    np.testing.assert_allclose(rebuilt, dense)


def test_sparse_counts_matches_dense_pipeline():
    dense = RNG.poisson(0.2, (30, 12)).astype(float)
    sp = SparseCounts.from_dense(dense)
    assert sp.density == np.count_nonzero(dense) / dense.size
    np.testing.assert_allclose(sp.row_slab(np.arange(30)), dense)
    colsums, col_nnz = sp.col_stats()
    np.testing.assert_allclose(colsums[0], dense.sum(0))
    np.testing.assert_allclose(col_nnz[0], (dense > 0).sum(0))
    batches = list(sp.batch(8))
    assert batches[0]["counts"].shape == (8, 12)
    np.testing.assert_allclose(
        np.concatenate([b["counts"] for b in batches]), dense
    )


def test_sparse_counts_feeds_model():
    from spmf_tpu import PoissonFactorization

    dense = RNG.poisson(0.5, (60, 10)).astype(float)
    sp = SparseCounts.from_dense(dense).batch(20)
    m = PoissonFactorization(
        latent_dim=3, feature_dim=10, u_tau_scale=0.1, dtype="float64", data=sp
    )
    losses = m.fit(batched_data_factory=sp, num_steps=2, learning_rate=0.1,
                   sample_size=4, verbose=False)
    assert np.isfinite(losses).all()


def test_device_dataset_matches_host():
    from spmf_tpu.data import DeviceArrayDataset

    x = RNG.poisson(1.0, (23, 5)).astype(np.float64)
    host = ArrayDataset({"counts": x, "indices": np.arange(23)}).batch(10)
    dev = DeviceArrayDataset({"counts": x, "indices": np.arange(23)}).batch(10)
    hb = [b["counts"] for b in host]
    db = [np.asarray(b["counts"]) for b in dev]
    assert len(hb) == len(db)
    for a, b in zip(hb, db):
        np.testing.assert_allclose(a, b)


def test_device_dataset_shuffles_and_feeds_fit():
    from spmf_tpu import PoissonFactorization
    from spmf_tpu.data import DeviceArrayDataset

    x = RNG.poisson(1.0, (120, 6)).astype(np.float64)
    dev = DeviceArrayDataset({"counts": x, "indices": np.arange(120)},
                             batch_size=40, shuffle=True)
    first = np.asarray(next(iter(dev))["indices"])
    second = np.asarray(next(iter(dev))["indices"])
    assert not np.array_equal(first, second)
    m = PoissonFactorization(latent_dim=2, feature_dim=6, u_tau_scale=0.1,
                             dtype="float64", data=dev)
    losses = m.fit(batched_data_factory=dev, num_steps=2, learning_rate=0.1,
                   sample_size=4, verbose=False)
    assert np.isfinite(losses).all()


def test_device_dataset_peek_batch_is_contiguous_slice():
    """peek_batch returns rows [0:bs) with no shuffle gather and without
    consuming a shuffle epoch — the engine's display-only initial-loss
    eval uses it so a device-resident dataset never pays a dataset-sized
    gather temp at startup (a 7.3 GB dataset OOMed a 16 GB chip)."""
    from spmf_tpu.data import DeviceArrayDataset

    x = RNG.poisson(1.0, (50, 4)).astype(np.float64)
    dev = DeviceArrayDataset({"counts": x, "indices": np.arange(50)},
                             batch_size=20, shuffle=True, seed=7)
    peek = dev.peek_batch()
    np.testing.assert_allclose(np.asarray(peek["counts"]), x[:20])
    np.testing.assert_allclose(np.asarray(peek["indices"]), np.arange(20))
    # peek does not advance the shuffle epoch: a peeked dataset's first
    # real iteration sees the same epoch-0 permutation as a fresh one
    fresh = DeviceArrayDataset({"counts": x, "indices": np.arange(50)},
                               batch_size=20, shuffle=True, seed=7)
    np.testing.assert_array_equal(
        np.asarray(next(iter(dev))["indices"]),
        np.asarray(next(iter(fresh))["indices"]),
    )


def test_native_csv_header_row_falls_back_and_raises(tmp_path):
    """A header row must NOT silently become a data row (ADVICE.md r1):
    the native parser rejects non-numeric tokens and the numpy fallback
    raises."""
    path = str(tmp_path / "h.csv")
    with open(path, "w") as f:
        f.write("gene1,gene2\n1.0,2.0\n")
    with pytest.raises(ValueError):
        load_csv(path)


def test_native_mtx_pattern_file_falls_back_to_scipy(tmp_path):
    """'pattern' MatrixMarket files (no value column) must not be parsed by
    the native scanner (it would consume row indices as values)."""
    path = str(tmp_path / "p.mtx")
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix coordinate pattern general\n")
        f.write("3 3 2\n1 2\n3 1\n")
    r, c, v, shape = load_mtx_coo(path)  # scipy fallback path
    assert shape == (3, 3)
    assert len(r) == 2
    np.testing.assert_allclose(v, 1.0)


def test_native_mtx_truncated_file_falls_back(tmp_path):
    path = str(tmp_path / "t.mtx")
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real general\n")
        f.write("3 3 5\n1 1 2.0\n2 2 3.0\n")  # header says 5 nnz, only 2
    from scipy.io._mmio import MMFile  # scipy will also raise on this
    with pytest.raises(Exception):
        load_mtx_coo(path)


def test_row_slab_vectorized_shuffled_subsets():
    dense = RNG.poisson(0.4, (50, 17)).astype(float)
    dense[7] = 0.0  # an all-zero row inside the batch
    sp = SparseCounts.from_dense(dense)
    ids = RNG.permutation(50)[:23]
    np.testing.assert_allclose(sp.row_slab(ids), dense[ids])
    rows, cols, vals = sp.batch_coo(ids)
    rebuilt = np.zeros((23, 17))
    rebuilt[rows, cols] = vals
    np.testing.assert_allclose(rebuilt, dense[ids])


def test_coo_energy_matches_dense_energy():
    """The sparse COO energy must equal the dense-path energy exactly
    (identity decode; the clip is interior so it is a no-op on both)."""
    import jax
    import jax.numpy as jnp
    from spmf_tpu import PoissonFactorization

    dense = RNG.poisson(0.8, (40, 12)).astype(float)
    sp = SparseCounts.from_dense(dense)
    m = PoissonFactorization(latent_dim=3, feature_dim=12, u_tau_scale=0.1,
                             dtype="float64", data=sp.batch(40))
    key = jax.random.PRNGKey(0)
    samples, _ = m._surrogate.sample_and_log_prob(m.surrogate_params, key, (3,))

    dense_batch = {"counts": dense, "indices": np.arange(40)}
    rows, cols, vals = sp.batch_coo(np.arange(40))
    pad = len(vals) + 37  # deliberately padded: zeros must be exact no-ops
    coo_batch = {
        "coo_rows": np.zeros(pad, np.int32),
        "coo_cols": np.zeros(pad, np.int32),
        "coo_vals": np.zeros(pad),
        "indices": np.arange(40),
    }
    coo_batch["coo_rows"][:len(vals)] = rows
    coo_batch["coo_cols"][:len(vals)] = cols
    coo_batch["coo_vals"][:len(vals)] = vals

    d = m.unormalized_log_prob(data=dense_batch, **samples)
    c = m.unormalized_log_prob(data=coo_batch, **samples)
    np.testing.assert_allclose(np.asarray(c), np.asarray(d), rtol=1e-10)


def test_sparse_coo_training_never_densifies():
    """End-to-end fit on COO batches (device-side sparse path)."""
    from spmf_tpu import PoissonFactorization

    dense = RNG.poisson(0.3, (200, 16)).astype(float)
    sp = SparseCounts.from_dense(dense).shuffle(seed=1).batch(50).as_coo()
    m = PoissonFactorization(latent_dim=3, feature_dim=16, u_tau_scale=0.1,
                             dtype="float64", data=sp)
    losses = m.fit(batched_data_factory=sp, num_steps=3, learning_rate=0.1,
                   sample_size=4, verbose=False, rel_tol=None)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # compute_scales used the CSR fast path (eta from col stats)
    assert np.asarray(m.eta_i).shape == (1, 16)


def test_coo_energy_matches_dense_energy_log_transform():
    """Sparse COO energy with the exp (log_transform) decode link equals the
    dense-path energy (f64 CPU: direct exp-total fallback)."""
    import jax
    import jax.numpy as jnp
    from spmf_tpu import PoissonFactorization

    dense = RNG.poisson(0.8, (40, 12)).astype(float)
    sp = SparseCounts.from_dense(dense)
    m = PoissonFactorization(latent_dim=3, feature_dim=12, u_tau_scale=0.1,
                             dtype="float64", data=sp.batch(40),
                             log_transform=True)
    key = jax.random.PRNGKey(0)
    samples, _ = m._surrogate.sample_and_log_prob(m.surrogate_params, key, (3,))

    dense_batch = {"counts": dense, "indices": np.arange(40)}
    rows, cols, vals = sp.batch_coo(np.arange(40))
    pad = len(vals) + 21
    coo_batch = {
        "coo_rows": np.zeros(pad, np.int32),
        "coo_cols": np.zeros(pad, np.int32),
        "coo_vals": np.zeros(pad),
        "indices": np.arange(40),
    }
    coo_batch["coo_rows"][:len(vals)] = rows
    coo_batch["coo_cols"][:len(vals)] = cols
    coo_batch["coo_vals"][:len(vals)] = vals

    d = m.unormalized_log_prob(data=dense_batch, **samples)
    c = m.unormalized_log_prob(data=coo_batch, **samples)
    np.testing.assert_allclose(np.asarray(c), np.asarray(d), rtol=1e-10)


def test_device_sparse_matches_host_coo():
    """DeviceSparseCounts' jitted on-device COO assembly must produce the
    same triplets (in CSR batch order) as the host path."""
    from spmf_tpu.data import DeviceSparseCounts

    dense = RNG.poisson(0.4, (50, 14)).astype(float)
    sp = SparseCounts.from_dense(dense)
    dev = DeviceSparseCounts(sp, batch_size=20, drop_remainder=True,
                             dtype=np.float64)
    host_iter = iter(SparseCounts.from_dense(dense).batch(20).as_coo())
    n_batches = 0
    for db in dev:
        hb = next(host_iter)
        nnz = int(np.count_nonzero(hb["coo_vals"]))
        np.testing.assert_array_equal(
            np.asarray(db["coo_rows"])[:nnz], hb["coo_rows"][:nnz])
        np.testing.assert_array_equal(
            np.asarray(db["coo_cols"])[:nnz], hb["coo_cols"][:nnz])
        np.testing.assert_allclose(
            np.asarray(db["coo_vals"])[:nnz], hb["coo_vals"][:nnz])
        # padding is zero-valued (exact no-op in the sparse energy)
        assert (np.asarray(db["coo_vals"])[nnz:] == 0).all()
        np.testing.assert_array_equal(db["indices"], hb["indices"])
        n_batches += 1
    assert n_batches == 2  # 50 rows / 20 per batch, remainder dropped


def test_device_sparse_feeds_fit():
    from spmf_tpu import PoissonFactorization
    from spmf_tpu.data import SparseCounts

    dense = RNG.poisson(0.3, (200, 16)).astype(float)
    dev = SparseCounts.from_dense(dense).shuffle(seed=3).batch(50) \
        .to_device(dtype=np.float64)
    m = PoissonFactorization(latent_dim=3, feature_dim=16, u_tau_scale=0.1,
                             dtype="float64", data=dev)
    losses = m.fit(batched_data_factory=dev, num_steps=3, learning_rate=0.1,
                   sample_size=4, verbose=False, rel_tol=None)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_device_sparse_overflow_raises():
    from spmf_tpu.data import DeviceSparseCounts

    dense = RNG.poisson(2.0, (12, 10)).astype(float)
    sp = SparseCounts.from_dense(dense)
    dev = DeviceSparseCounts(sp, batch_size=6, max_nnz=4)  # deliberately tiny
    with pytest.raises(ValueError, match="overflowed the static pad"):
        list(dev)


def test_prefetch_batches_order_transform_and_errors():
    from spmf_tpu.data.prefetch import prefetch_batches

    items = list(range(20))
    out = list(prefetch_batches(iter(items), size=3, transform=lambda x: x * 2))
    assert out == [x * 2 for x in items]
    # size=0: synchronous passthrough
    assert list(prefetch_batches(iter(items), size=0)) == items

    def boom():
        yield 1
        raise RuntimeError("worker failed")

    gen = prefetch_batches(boom(), size=2)
    assert next(gen) == 1
    with pytest.raises(RuntimeError, match="worker failed"):
        list(gen)


def test_coo_dense_scatter_matches_dense_energy():
    """sparse_dense_scatter=True: a COO batch is scattered into a dense
    slab on device and must produce EXACTLY the dense-batch energy
    (including the reference clip frame) — the TPU sparse path
    (docs/sparse_bench.json: the gather-dot COO energy is gather-bound
    on TPU; the MXU-dense kernel wins below ~1% density)."""
    import jax
    import jax.numpy as jnp
    from spmf_tpu import PoissonFactorization

    dense = RNG.poisson(0.5, (40, 12)).astype(float)
    sp = SparseCounts.from_dense(dense)
    m = PoissonFactorization(latent_dim=3, feature_dim=12, u_tau_scale=0.1,
                             dtype="float64", data=sp.batch(40),
                             sparse_dense_scatter=True)
    key = jax.random.PRNGKey(0)
    samples, _ = m._surrogate.sample_and_log_prob(m.surrogate_params, key, (3,))

    rows, cols, vals = sp.batch_coo(np.arange(40))
    pad = len(vals) + 29
    coo_batch = {
        "coo_rows": np.zeros(pad, np.int32),
        "coo_cols": np.zeros(pad, np.int32),
        "coo_vals": np.zeros(pad),
        "indices": np.arange(40),
    }
    coo_batch["coo_rows"][:len(vals)] = rows
    coo_batch["coo_cols"][:len(vals)] = cols
    coo_batch["coo_vals"][:len(vals)] = vals
    dense_batch = {"counts": dense, "indices": np.arange(40)}

    d = m.unormalized_log_prob(data=dense_batch, **samples)
    c = m.unormalized_log_prob(data=coo_batch, **samples)
    np.testing.assert_array_equal(np.asarray(c), np.asarray(d))

    # and it trains end-to-end through fit()
    spb = SparseCounts.from_dense(dense).shuffle(seed=2).batch(20).as_coo()
    losses = m.fit(batched_data_factory=spb, num_steps=2, learning_rate=0.1,
                   sample_size=4, verbose=False, rel_tol=None)
    assert np.isfinite(losses).all()


def test_waic_over_coo_batches_matches_dense():
    """WAIC must accept sparse COO factories (the scRNA production data)
    and agree with the dense evaluation. On CPU the COO batches take the
    flat-gather COO row scorer (r4) — an exact but differently-ordered
    summation, so agreement is to f64 accumulation-order noise rather
    than bitwise."""
    from spmf_tpu import PoissonFactorization

    dense = RNG.poisson(0.5, (60, 10)).astype(float)
    sp = SparseCounts.from_dense(dense).batch(30, drop_remainder=True).as_coo()
    m = PoissonFactorization(latent_dim=3, feature_dim=10, u_tau_scale=0.1,
                             dtype="float64", data=sp)
    w_coo = m.waic(sp, num_samples=6, sample_chunk=3)
    dd = ArrayDataset({"counts": dense, "indices": np.arange(60)}).batch(30)
    w_dense = m.waic(dd, num_samples=6, sample_chunk=3)
    for k in w_dense:
        np.testing.assert_allclose(w_coo[k], w_dense[k], rtol=1e-7)


def test_waic_scores_coo_when_slab_exceeds_ceiling():
    """Wide-D sparse data whose dense slab exceeds
    _DENSE_SCATTER_MAX_SLAB_BYTES previously could not be scored at all
    (the scorer densified unconditionally); the COO row scorer handles it
    without materializing (B, D), and log_likelihood agrees with the
    unrestricted evaluation."""
    from spmf_tpu import PoissonFactorization

    dense = RNG.poisson(0.4, (40, 12)).astype(float)
    sp = SparseCounts.from_dense(dense).batch(20, drop_remainder=True).as_coo()
    m = PoissonFactorization(latent_dim=2, feature_dim=12, u_tau_scale=0.1,
                             dtype="float64", data=sp)
    ll_free = m.log_likelihood(sp, num_samples=4, sample_chunk=2)
    m._DENSE_SCATTER_MAX_SLAB_BYTES = 0   # force the "slab can't fit" corner
    ll_coo = m.log_likelihood(sp, num_samples=4, sample_chunk=2)
    np.testing.assert_allclose(ll_coo["total"], ll_free["total"], rtol=1e-7)
    assert ll_coo["n_rows"] == ll_free["n_rows"]


def test_device_sparse_refuses_silent_remainder_drop():
    from spmf_tpu.data import DeviceSparseCounts

    dense = RNG.poisson(0.5, (50, 8)).astype(float)
    dev = DeviceSparseCounts(SparseCounts.from_dense(dense), batch_size=20)
    with pytest.raises(ValueError, match="drops the 10-row remainder"):
        next(iter(dev))


def test_coo_auto_pad_tracks_batch_size():
    """An auto-computed nnz pad is sized for a specific batch size; asking
    for a different bs must recompute (a pad cached for a smaller batch
    would silently undersize), while a user-supplied max_nnz is
    authoritative for ANY batch size."""
    dense = RNG.poisson(0.5, (60, 9)).astype(float)
    sp = SparseCounts.from_dense(dense)
    p_small = sp._coo_pad_size(8)
    p_large = sp._coo_pad_size(32)
    assert p_large >= p_small
    # recomputed exactly as a fresh object would size it
    assert p_large == SparseCounts.from_dense(dense)._coo_pad_size(32)
    sp2 = SparseCounts.from_dense(dense).batch(8).as_coo(max_nnz=4096)
    assert sp2._coo_pad_size(8) == 4096
    assert sp2._coo_pad_size(32) == 4096


def test_device_sparse_pad_tracks_batch_size_and_user_override():
    """DeviceSparseCounts: an auto pad recomputes for a different batch
    size (same undersize hazard as the host path), a user-supplied max_nnz
    is authoritative for any batch size, and to_device() must NOT forward
    a host auto pad as if the user had chosen it."""
    from spmf_tpu.data import DeviceSparseCounts

    dense = RNG.poisson(0.5, (60, 9)).astype(float)

    sp = SparseCounts.from_dense(dense).batch(8).as_coo()
    sp._coo_pad_size(8)  # simulate prior iteration at bs=8
    dev = sp.to_device()
    assert dev._max_nnz is None  # auto pad not forwarded as user-supplied
    p8 = dev._pad(8)
    p32 = dev._pad(32)
    assert p32 >= p8
    assert p32 == SparseCounts.from_dense(dense)._coo_pad_size(32)

    dev_u = SparseCounts.from_dense(dense).batch(8).as_coo(
        max_nnz=4096).to_device()
    assert dev_u._pad(8) == 4096
    assert dev_u._pad(32) == 4096

    dev_kw = DeviceSparseCounts(SparseCounts.from_dense(dense),
                                batch_size=8, max_nnz=2048)
    assert dev_kw._pad(8) == 2048
    assert dev_kw._pad(32) == 2048


def test_as_coo_user_pad_overrides_stale_auto_pad():
    """as_coo(max_nnz=...) after an auto pad was computed for some batch
    size must be honored for ANY batch size (the stale auto-pad provenance
    is cleared)."""
    dense = RNG.poisson(0.5, (60, 9)).astype(float)
    sp = SparseCounts.from_dense(dense).batch(8).as_coo()
    sp._coo_pad_size(8)  # auto pad cached for bs=8
    sp.as_coo(max_nnz=65536).batch(32)
    assert sp._coo_pad_size(32) == 65536
    assert sp._coo_pad_size(8) == 65536


def test_blocked_layout_matches_host_coo_content():
    """to_device(block_rows=R): every yielded blocked batch must contain
    exactly the rows' triplets (pads exact no-ops: val 0, col 0,
    row_local R-1), and the flat adapter view must reproduce the dense
    rows."""
    from spmf_tpu.models.poisson import PoissonFactorization

    dense = RNG.poisson(0.5, (48, 12)).astype(float)
    dev = SparseCounts.from_dense(dense).batch(16, drop_remainder=True) \
        .to_device(dtype=np.float64, block_rows=8)
    assert dev.n_blocks == 6 and dev.block_nnz % 128 == 0
    n_batches = 0
    for b in dev:
        idx = np.asarray(b["indices"])
        flat = PoissonFactorization._flatten_blocked_coo(b)
        rows = np.asarray(flat["coo_rows"])
        cols = np.asarray(flat["coo_cols"])
        vals = np.asarray(flat["coo_vals"])
        rebuilt = np.zeros((16, 12))
        np.add.at(rebuilt, (rows, cols), vals)
        np.testing.assert_allclose(rebuilt, dense[idx])
        # rows sorted (the blocked energy's one-hot math assumes it)
        assert (np.diff(rows) >= 0).all()
        n_batches += 1
    assert n_batches == 3


def test_blocked_layout_refuses_silent_remainder_drop():
    dense = RNG.poisson(0.5, (50, 8)).astype(float)
    dev = SparseCounts.from_dense(dense).batch(16).to_device(block_rows=8)
    with pytest.raises(ValueError, match="drops the 2-row remainder"):
        next(iter(dev))
    with pytest.raises(ValueError, match="multiple of block_rows"):
        next(iter(SparseCounts.from_dense(dense).batch(12,
             drop_remainder=True).to_device(block_rows=8)))


def test_blocked_fit_and_scorer(tmp_path):
    """Blocked batches train through the public fit (scan path) and score
    through waic/log_likelihood (flattened adapter)."""
    from spmf_tpu import PoissonFactorization

    dense = RNG.poisson(0.4, (192, 16)).astype(float)
    dev = SparseCounts.from_dense(dense).shuffle(seed=3) \
        .batch(48, drop_remainder=True).to_device(dtype=np.float64,
                                                  block_rows=8)
    m = PoissonFactorization(latent_dim=3, feature_dim=16, u_tau_scale=0.1,
                             dtype="float64", data=dev,
                             sparse_dense_scatter=False)
    losses = m.fit(batched_data_factory=dev, num_steps=3, learning_rate=0.1,
                   sample_size=4, verbose=False, rel_tol=None)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert m.last_fit.extras.get("epoch_scan") is True
    ll = m.log_likelihood(dev, num_samples=4, sample_chunk=2)
    assert np.isfinite(ll["total"])


def test_blocked_energy_matches_dense_energy():
    """The blocked COO energy (one-hot MXU contractions + fused table
    gather) must reproduce the dense energy exactly, for both decode
    links and both row scalings."""
    import jax
    import jax.numpy as jnp

    from spmf_tpu import PoissonFactorization

    dense = RNG.poisson(0.6, (64, 24)).astype(float)
    dev = SparseCounts.from_dense(dense).shuffle(seed=1) \
        .batch(16, drop_remainder=True).to_device(dtype=np.float64,
                                                  block_rows=8)
    for log_t in (False, True):
        for scale_rows in (False, True):
            m = PoissonFactorization(
                latent_dim=3, feature_dim=24, u_tau_scale=0.1,
                dtype="float64", scale_columns=True, scale_rows=scale_rows,
                log_transform=log_t,
                data={"counts": dense, "indices": np.arange(64)})
            samples, _ = m._surrogate.sample_and_log_prob(
                m.surrogate_params, jax.random.PRNGKey(2), (4,))
            batch = next(iter(dev))
            idx = np.asarray(batch["indices"])
            dense_batch = {"counts": jnp.asarray(dense[idx]),
                           "indices": jnp.asarray(idx)}
            lp_b = m.unormalized_log_prob(data=batch, **samples)
            assert "blocked" in m.fusion_inactive_reason
            lp_d = m.unormalized_log_prob(data=dense_batch, **samples)
            np.testing.assert_allclose(np.asarray(lp_b), np.asarray(lp_d),
                                       rtol=1e-9)
