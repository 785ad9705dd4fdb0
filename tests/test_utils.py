"""Utility subsystems: pytree checkpoints, finite checks, distributed
no-op path, predictive distribution."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spmf_tpu.utils import check_finite, debug_nans, load_pytree, save_pytree


def test_pytree_checkpoint_roundtrip(tmp_path):
    tree = {"a": {"x": jnp.arange(5.0), "y": jnp.ones((2, 3))}, "b": jnp.zeros(1)}
    path = save_pytree(str(tmp_path / "ck.npz"), tree)
    loaded = load_pytree(path, tree)
    for (p1, l1), (p2, l2) in zip(
        jax.tree_util.tree_flatten_with_path(tree)[0],
        jax.tree_util.tree_flatten_with_path(loaded)[0],
    ):
        assert p1 == p2
        np.testing.assert_allclose(l1, l2)


def test_check_finite_raises():
    ok = {"a": jnp.ones(3)}
    check_finite(ok)
    bad = {"a": jnp.array([1.0, jnp.nan])}
    with pytest.raises(FloatingPointError, match="a"):
        check_finite(bad)


def test_debug_nans_context():
    prev = jax.config.jax_debug_nans
    with debug_nans(True):
        assert jax.config.jax_debug_nans is True
        # fresh jit fn: a dispatch-cache hit from earlier tests would bypass
        # the nan check (known jax_debug_nans caveat)
        f = jax.jit(lambda t: jnp.log(t) * 2.0)
        with pytest.raises(FloatingPointError):
            f(jnp.array(-1.2345))
    assert jax.config.jax_debug_nans == prev


def test_distributed_single_host_noop():
    from spmf_tpu.parallel.distributed import (
        initialize_distributed,
        process_local_rows,
    )

    assert initialize_distributed() is False
    start, stop = process_local_rows(100)
    assert (start, stop) == (0, 100)


def test_predictive_distribution_reduces_sample_dims():
    from spmf_tpu import PoissonFactorization
    from spmf_tpu.data import ArrayDataset

    rng = np.random.default_rng(0)
    X = rng.poisson(1.0, (40, 6))
    data = ArrayDataset({"counts": X, "indices": np.arange(40)}).batch(40)
    m = PoissonFactorization(latent_dim=2, feature_dim=6, u_tau_scale=0.1,
                             dtype="float64", data=data)
    s = m._surrogate.sample(m.surrogate_params, jax.random.PRNGKey(0), (3,))
    batch = next(iter(data))
    # reference poisson.py:204-208 raised KeyError here ('ll' never set);
    # repaired semantics: reduce over the sample dims of 'log_likelihood'
    pred = m.predictive_distribution(data=batch, **s)
    assert pred["log_likelihood"].shape == (40, 6)
    assert pred["rate"].shape == (3, 40, 6)


def test_bound_surrogate_api():
    from spmf_tpu import PoissonFactorization

    m = PoissonFactorization(latent_dim=2, feature_dim=5, u_tau_scale=0.1,
                             dtype="float64", scale_columns=False)
    s = m.surrogate_distribution.sample(4)
    assert s["u"].shape == (4, 5, 2)
    vals, lq = m.surrogate_distribution.sample_and_log_prob((2,), seed=1)
    assert lq.shape == (2,)
    assert m.surrogate_distribution.variables is m.surrogate_params


def test_waic_subsample_batch_unit():
    """waic(subsample='batch') evaluates over the first minibatch only —
    the forensically recovered reference unit (docs/waic_forensics.json)."""
    import numpy as np
    from spmf_tpu import PoissonFactorization
    from spmf_tpu.data import ArrayDataset

    rng = np.random.default_rng(0)
    X = rng.poisson(1.0, (60, 8))
    data = ArrayDataset({"counts": X, "indices": np.arange(60)}).batch(20)
    m = PoissonFactorization(latent_dim=2, feature_dim=8, u_tau_scale=0.1,
                             dtype="float64", data=data)
    full = m.waic(num_samples=20)
    sub = m.waic(num_samples=20, subsample="batch")
    # identity holds for both; the subsampled lppd is ~1/3 of the full one
    for w in (full, sub):
        np.testing.assert_allclose(w["waic"], -2 * (w["lppd"] - w["pwaic"]),
                                   rtol=1e-10)
    assert abs(sub["lppd"]) < abs(full["lppd"]) / 2


def test_orbax_checkpointer_roundtrip(tmp_path):
    import jax.numpy as jnp
    from spmf_tpu.utils.checkpoint import OrbaxCheckpointer

    tree = {"a": {"loc": jnp.arange(6.0).reshape(2, 3)},
            "b": {"raw": jnp.ones(4)}}
    ckpt = OrbaxCheckpointer(str(tmp_path / "ck"), async_save=False)
    ckpt.save(3, tree)
    out = ckpt.restore(3, like=tree)
    assert ckpt.steps() == [3]
    np.testing.assert_allclose(np.asarray(out["a"]["loc"]),
                               np.asarray(tree["a"]["loc"]))
    ckpt.close()


def test_process_local_rows_multi_process(monkeypatch):
    """Multi-host feeding seam: even split returns this host's row range;
    a non-divisible global batch is a hard error (silently flooring would
    drop the remainder rows from training with no signal)."""
    from spmf_tpu.parallel import distributed

    monkeypatch.setattr(distributed.jax, "process_count", lambda: 4)
    monkeypatch.setattr(distributed.jax, "process_index", lambda: 1)
    assert distributed.process_local_rows(8) == (2, 4)
    with pytest.raises(ValueError, match="divide"):
        distributed.process_local_rows(10)
