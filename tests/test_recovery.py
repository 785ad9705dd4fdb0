"""Planted-structure recovery: the notebook-derived acceptance tests
(reference README.md:27-31: noise -> encoding shrinks to ~zero; planted
linear structure -> encoding concentrates on the signal columns).
Scaled down for the 1-core CI host."""
import numpy as np
import pytest

from spmf_tpu import PoissonFactorization
from spmf_tpu.data import ArrayDataset


@pytest.mark.slow
def test_linear_structure_recovery():
    rng = np.random.default_rng(3)
    N, D, P = 4000, 12, 3
    n_signal = 4
    # planted: one latent factor drives the first n_signal columns
    z = rng.gamma(2.0, 1.0, size=(N, 1))
    rates = np.ones((N, D))
    rates[:, :n_signal] *= z
    X = rng.poisson(rates)
    data = ArrayDataset({"counts": X, "indices": np.arange(N)}).shuffle().batch(500)
    m = PoissonFactorization(
        latent_dim=P, feature_dim=D, u_tau_scale=1.0 / np.sqrt(N * D),
        dtype="float64", data=data,
    )
    m.fit(batched_data_factory=data, num_steps=25, learning_rate=0.05,
          sample_size=8, verbose=False, rel_tol=None, seed=0)
    A = np.asarray(m.encoding_matrix())  # (D, P)
    col_mass = np.abs(A).sum(axis=1)
    signal = col_mass[:n_signal].mean()
    noise = col_mass[n_signal:].mean()
    # at this scaled-down budget (25 epochs) separation reaches ~2.2x; the
    # full notebook config (200 epochs) separates much further
    assert signal > 1.8 * noise, (signal, noise, col_mass)


@pytest.mark.slow
def test_noise_shrinks_encoding():
    rng = np.random.default_rng(4)
    N, D, P = 4000, 10, 3
    X = rng.poisson(1.0, size=(N, D))
    data = ArrayDataset({"counts": X, "indices": np.arange(N)}).shuffle().batch(500)
    m = PoissonFactorization(
        latent_dim=P, feature_dim=D, u_tau_scale=1.0 / np.sqrt(N * D),
        dtype="float64", data=data,
    )
    m.fit(batched_data_factory=data, num_steps=25, learning_rate=0.05,
          sample_size=8, verbose=False, rel_tol=None, seed=0)
    A = np.asarray(m.encoding_matrix())
    # pure noise: the sparsifying prior should keep all encodings tiny
    # relative to the background-rate pathway (intercept ~= 1)
    assert np.abs(A).max() < 0.15, A.max()
