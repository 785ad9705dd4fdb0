"""WAIC (widely applicable information criterion).

Rebuild of ``BayesianModel.waic()`` from bayesianquilts; target semantics
fixed by the recorded notebook output (SURVEY.md §6):
``waic = -2 * (lppd - pwaic)`` with
``lppd = sum_i log mean_s exp(ll_is)`` and ``pwaic = sum_i var_s(ll_is)``
over per-row log-likelihoods; ``se = sqrt(N * var_i(waic_i))``.
(Check vs reference values: -2*(-37090.95 - 135483.30) = 345148.50 ✓,
notebooks/factorizing_random_noise.ipynb cell 9.)

Posterior samples are drawn in CHUNKS (default 8) and reduced with
streaming moments, so WAIC at production scale (D=20k, 100 samples) never
holds more than one (chunk, B)-shaped ll block — composing with the fused
per-row Pallas kernel (ops/fused_poisson.fused_poisson_row_loglik), which
itself never materializes (S, B, D). With ``sample_chunk=num_samples`` the
single chunk consumes the per-batch key directly, so the draws (and the
result) are bit-identical to an unchunked evaluation.

The default chunk is 8, NOT 10: an XLA:TPU miscompilation was isolated
(r4) at sample dim S=10 on the production shape (B=4096, D=20000, K=32)
— the in-jit batched encode emitted negative theta from all-positive
operands, poisoning the per-row log-likelihoods with NaN. A 12-point
sweep (S = 1..7, 9, 10, 12, 16, 20; /tmp-probe recorded in
docs/mesh_scan_tpu_check.json and CLAUDE.md) corrupts ONLY at S=10;
the Pallas kernels were exonerated (pure-XLA path reproduces, and the
row kernel matches XLA at 4e-7 for S=10 standalone). ``waic`` also
warns when a log-likelihood block is non-finite, so a future
recurrence (or a genuinely degenerate model) is loud instead of a
silent NaN result. Fencing (r5): requesting a known-bad dim warns
upfront (utils.debug.warn_known_bad_sample_dim — fit(sample_size=10)
gets the same guard), and the bug is pinned by a TPU-backend
regression test that fails the day the stack fixes it
(tests/test_tpu_env.py::TestS10EncodeMiscompile).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["waic", "streaming_waic_terms"]


def streaming_waic_terms(ll_chunks) -> tuple:
    """Exact (lppd_i, pwaic_i) from an iterable of (S_c, B) per-row
    log-likelihood blocks over the SAME rows: accumulates the running
    log-sum-exp, sum, and sum-of-squares (float64), so the result equals
    the one-shot formulas on the concatenated (S, B) matrix. Warns once
    if a block contains non-finite entries (the downstream result will
    be non-finite) — see the module docstring's S=10 miscompile note."""
    from scipy.special import logsumexp as _host_lse

    lse = None
    s1 = s2 = 0.0
    n = 0
    warned = False
    for ll in ll_chunks:
        ll = np.asarray(ll, np.float64)
        if not warned and not np.isfinite(ll).all():
            import warnings

            warned = True
            warnings.warn(
                f"{int((~np.isfinite(ll)).sum())} non-finite per-row "
                "log-likelihood values entered WAIC (chunk shape "
                f"{ll.shape}); the result will be non-finite. If the "
                "model trains finite, suspect the sample-dim S="
                f"{ll.shape[0]} XLA:TPU miscompile (vi/waic.py docstring)"
                " — use a power-of-two sample_chunk.",
                RuntimeWarning,
            )
        c = _host_lse(ll, axis=0)  # host-side: no device round-trips
        lse = c if lse is None else np.logaddexp(lse, c)
        s1 = s1 + ll.sum(axis=0)
        s2 = s2 + (ll * ll).sum(axis=0)
        n += ll.shape[0]
    lppd_i = lse - np.log(float(n))
    mean = s1 / n
    pwaic_i = (s2 - n * mean * mean) / (n - 1)  # ddof=1
    return lppd_i, pwaic_i


def waic(
    row_log_likelihood_fn: Callable,  # (batch, samples) -> (S, B) per-row ll
    surrogate,
    params,
    batched_data_factory: Callable,
    num_samples: int = 100,
    seed: int = 1,
    dtype=jnp.float64,
    sample_chunk: int = 8,
) -> dict:
    sample_chunk = min(sample_chunk, num_samples)
    from spmf_tpu.utils.debug import warn_known_bad_sample_dim

    warn_known_bad_sample_dim(sample_chunk, "sample_chunk")
    n_chunks = num_samples // sample_chunk
    residual = num_samples - n_chunks * sample_chunk

    def make_fn(s):
        @jax.jit
        def batch_ll(key, batch):
            samples = surrogate.sample(params, key, (s,))
            return row_log_likelihood_fn(batch, samples)  # (s, B)

        return batch_ll

    batch_ll = make_fn(sample_chunk)
    batch_ll_res = make_fn(residual) if residual else None

    key = jax.random.PRNGKey(seed)
    lppd_all, pwaic_all = [], []
    for batch in batched_data_factory():
        key, k = jax.random.split(key)
        batch = {k2: jnp.asarray(v) for k2, v in batch.items()}
        if n_chunks == 1 and not residual:
            # single chunk: use the batch key itself (bit-identical to an
            # unchunked evaluation — r2 advisor finding)
            chunk_keys = [k]
        else:
            chunk_keys = jax.random.split(k, n_chunks + (1 if residual else 0))

        def chunks():
            for c in range(n_chunks):
                yield batch_ll(chunk_keys[c], batch)
            if residual:
                yield batch_ll_res(chunk_keys[-1], batch)

        lppd_i, pwaic_i = streaming_waic_terms(chunks())
        lppd_all.append(lppd_i)
        pwaic_all.append(pwaic_i)

    lppd_i = np.concatenate(lppd_all)
    pwaic_i = np.concatenate(pwaic_all)
    waic_i = -2.0 * (lppd_i - pwaic_i)
    n = waic_i.shape[0]
    return {
        "waic": float(waic_i.sum()),
        "se": float(np.sqrt(n * waic_i.var())),
        "lppd": float(lppd_i.sum()),
        "pwaic": float(pwaic_i.sum()),
        # row count of the evaluated data: lets callers report per-row
        # scores (model.log_likelihood) without a second data pass
        "n_rows": int(n),
    }
