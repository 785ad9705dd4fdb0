"""Sparse encoder contraction: z = g(x) @ A over COO counts.

BASELINE.json's north star names "the sparse encoder matvec (row-batch
counts x sparsified loading matrix) ... over CSR/segment-sum layouts".
Both encoder links satisfy g(0) = 0 (identity-scale: 0/eta = 0;
log-transform: log(0/eta + 1) = 0 — reference poisson.py:34-43), so the
contraction only touches nonzeros:

    z[r, k] = sum_{(r, c, v) in nnz} g(v; eta_c) * A[c, k]

implemented as a gather + ``segment_sum``.

TPU layout note (docs/gather_probe.json, r4): gathers of per-sample
tables must flatten the ELBO sample dim INTO the gather width. A batched
``jnp.take`` over (S, D, K) materializes an (S, nnz, K) result whose
trailing K=16..32 pads to 128 lanes under XLA:TPU's T(8,128) tiling —
8x the bytes (and an HBM OOM at nnz=4.1M). Gathering from a (D, S*K)
table instead produces perfectly-tiled (nnz, S*K) rows: measured 27x
faster takes (1467 vs 53 Mnnz-samples/s) and 6.4x on the full nz-term
composite on a v5e chip.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["sparse_encode_coo"]


def sparse_encode_coo(rows, cols, vals, num_rows, A, eta=1.0,
                      log_transform=False, xi_global=None):
    """Encode COO counts. Args:
      rows, cols, vals: (nnz,) COO triplets (zero-padding is exact: g(0)=0
        and padded indices are in-bounds zeros — SparseCounts._coo_batch)
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
    lead = A.shape[:-2]
    L = int(np.prod(lead, dtype=np.int64)) if lead else 1
    eta_full = jnp.broadcast_to(jnp.asarray(eta, A.dtype), (1, D))[0]
    eta_c = eta_full[cols]
    if log_transform:
        g = jnp.log(vals / eta_c + 1.0)
    else:
        g = vals / eta_c
    # flatten samples into the gather width: (D, L*K) table -> (nnz, L*K)
    A_flat = jnp.moveaxis(A.reshape((L, D, K)), 0, 1).reshape(D, L * K)
    contrib = g[:, None] * jnp.take(A_flat, cols, axis=0, mode="clip")
    z_flat = jax.ops.segment_sum(contrib, rows, num_segments=num_rows)
    z = jnp.moveaxis(z_flat.reshape(num_rows, L, K), 1, 0)
    z = z.reshape(lead + (num_rows, K))
    if xi_global is not None:
        rowsums = jax.ops.segment_sum(vals, rows, num_segments=num_rows)
        z = z * (rowsums / jnp.asarray(xi_global, A.dtype))[:, None]
    return z
