"""WAIC (widely applicable information criterion).

Rebuild of ``BayesianModel.waic()`` from bayesianquilts; target semantics
fixed by the recorded notebook output (SURVEY.md §6):
``waic = -2 * (lppd - pwaic)`` with
``lppd = sum_i log mean_s exp(ll_is)`` and ``pwaic = sum_i var_s(ll_is)``
over per-row log-likelihoods; ``se = sqrt(N * var_i(waic_i))``.
(Check vs reference values: -2*(-37090.95 - 135483.30) = 345148.50 ✓,
notebooks/factorizing_random_noise.ipynb cell 9.)
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import logsumexp

__all__ = ["waic"]


def waic(
    row_log_likelihood_fn: Callable,  # (batch, samples) -> (S, B) per-row ll
    surrogate,
    params,
    batched_data_factory: Callable,
    num_samples: int = 100,
    seed: int = 1,
    dtype=jnp.float64,
) -> dict:
    @jax.jit
    def batch_terms(key, batch):
        samples = surrogate.sample(params, key, (num_samples,))
        ll = row_log_likelihood_fn(batch, samples)  # (S, B)
        lppd_i = logsumexp(ll, axis=0) - jnp.log(jnp.asarray(float(num_samples), ll.dtype))
        pwaic_i = jnp.var(ll, axis=0, ddof=1)
        return lppd_i, pwaic_i

    key = jax.random.PRNGKey(seed)
    lppd_all, pwaic_all = [], []
    for batch in batched_data_factory():
        key, k = jax.random.split(key)
        batch = {k2: jnp.asarray(v) for k2, v in batch.items()}
        lppd_i, pwaic_i = batch_terms(k, batch)
        lppd_all.append(np.asarray(lppd_i, np.float64))
        pwaic_all.append(np.asarray(pwaic_i, np.float64))

    lppd_i = np.concatenate(lppd_all)
    pwaic_i = np.concatenate(pwaic_all)
    waic_i = -2.0 * (lppd_i - pwaic_i)
    n = waic_i.shape[0]
    return {
        "waic": float(waic_i.sum()),
        "se": float(np.sqrt(n * waic_i.var())),
        "lppd": float(lppd_i.sum()),
        "pwaic": float(pwaic_i.sum()),
    }
