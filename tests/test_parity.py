"""Full-scale ELBO-trajectory parity vs the reference's recorded notebook
outputs (SURVEY.md §6 / BASELINE.md). Runs in the DEFAULT suite (~2 min with
a warm compile cache) so the headline parity claim stays continuously
guarded (VERDICT r1 #9); opt out with SPMF_SKIP_PARITY=1 for quick loops.

Smoke-scale equivalents live in tests/test_recovery.py; measured full-scale
results are recorded in docs/PARITY.md.
"""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    bool(os.environ.get("SPMF_SKIP_PARITY")),
    reason="skipped explicitly via SPMF_SKIP_PARITY=1",
)


def test_noise_config_matches_reference_optimum():
    """Reference: notebooks/factorizing_random_noise.ipynb converged
    avg-batch loss ~= 40.520 (epoch ~126). We require <= 40.60 within 80
    epochs (measured: 40.4956)."""
    from spmf_tpu import PoissonFactorization
    from spmf_tpu.data import ArrayDataset

    N, D, P = 50_000, 30, 4
    rng = np.random.default_rng(0)
    X = rng.poisson(1.0, size=(N, D))
    data = ArrayDataset({"counts": X, "indices": np.arange(N)}).batch(1000)
    m = PoissonFactorization(
        latent_dim=P, feature_dim=D, u_tau_scale=1 / np.sqrt(N * D),
        dtype="float64", data=data,
    )
    losses = m.calibrate_advi(
        num_steps=80, learning_rate=0.05, rel_tol=1e-4, clip_value=5.0,
        sample_size=8, seed=3, verbose=False,
    )
    assert losses[-1] <= 40.60, losses[-1]
    # WAIC identity: waic == -2 (lppd - pwaic)
    w = m.waic(num_samples=50)
    np.testing.assert_allclose(
        w["waic"], -2 * (w["lppd"] - w["pwaic"]), rtol=1e-10
    )
    # encoding shrinks to ~zero on noise (README.md:27-31 acceptance)
    assert np.abs(np.asarray(m.encoding_matrix())).max() < 0.1
