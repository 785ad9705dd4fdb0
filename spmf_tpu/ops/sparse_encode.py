"""Sparse encoder contraction: z = g(x) @ A over COO counts.

BASELINE.json's north star names "the sparse encoder matvec (row-batch
counts x sparsified loading matrix) ... over CSR/segment-sum layouts".
Both encoder links satisfy g(0) = 0 (identity-scale: 0/eta = 0;
log-transform: log(0/eta + 1) = 0 — reference poisson.py:34-43), so the
contraction only touches nonzeros:

    z[r, k] = sum_{(r, c, v) in nnz} g(v; eta_c) * A[c, k]

implemented as a gather + ``segment_sum`` — XLA lowers this to efficient
one-pass scatter-adds on TPU, and it's exact (no densification), so the
full 50k x 20k scRNA matrix encodes without materializing 4 GB of zeros.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["sparse_encode_coo"]


def sparse_encode_coo(rows, cols, vals, num_rows, A, eta=1.0,
                      log_transform=False, xi_global=None):
    """Encode COO counts. Args:
      rows, cols, vals: (nnz,) COO triplets (zero-padding is exact: g(0)=0)
      num_rows: static row count of the output
      A: (..., D, K) encoding matrix (w1 * u); leading dims are ELBO samples
      eta: (1, D) or scalar column normalization
      xi_global: if given, apply the reference row scaling
        z *= rowsum(x) / xi_global (poisson.py:644-649)
    Returns z: (..., num_rows, K).
    """
    rows = jnp.asarray(rows)
    cols = jnp.asarray(cols)
    vals = jnp.asarray(vals, A.dtype)
    D, K = A.shape[-2], A.shape[-1]
    eta_full = jnp.broadcast_to(jnp.asarray(eta, A.dtype), (1, D))[0]
    eta_c = eta_full[cols]
    if log_transform:
        g = jnp.log(vals / eta_c + 1.0)
    else:
        g = vals / eta_c
    contrib = g[:, None] * jnp.take(A, cols, axis=-2)  # (..., nnz, K)
    z = jnp.zeros(A.shape[:-2] + (num_rows, K), A.dtype)
    z = z.at[..., rows, :].add(contrib)
    if xi_global is not None:
        rowsums = jax.ops.segment_sum(vals, rows, num_segments=num_rows)
        z = z * (rowsums / jnp.asarray(xi_global, A.dtype))[:, None]
    return z
