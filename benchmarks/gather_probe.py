#!/usr/bin/env python3
"""Interleaved probe: TPU gather/segment-sum throughput for the COO energy.

The r3 diagnosis (docs/sparse_bench.json, docs/ROADMAP.md item 5) measured
the gather-dot COO energy at ~1.6M nnz/sec and concluded per-nnz gathers
lose to densify+fused-MXU below ~1% density. That measurement was of the
WHOLE energy; this probe isolates the gather primitives and their XLA
lowering knobs (indices_are_sorted / unique_indices / fill mode), because
if any formulation reaches >100M nnz/sec the algebraic sparse energy
(closed-form rate total + nz-only transcendentals) becomes ~100x less VPU
work than the dense slab at scRNA density.

Arms (nnz=4.1M ~ a B=8192 x D=50k batch at 1% density, K=16):
  take_vT           v.T[cols]           cols random      (D=50k table)
  take_vT_sorted    v.T[cols_sorted]    + indices_are_sorted
  take_theta        theta[rows]         rows sorted (CSR order, B=8192)
  segsum            segment_sum(vals, rows, B) sorted
  nzterm            full composite: both gathers + K-dot + x*log(rate)
                    + segment-sum into per-row partials

Interleaved rounds, value-fetch sync (CLAUDE.md probe hygiene).
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

B, D, K = 8192, 50000, 16
NNZ = 4_100_000
ROUNDS, ITERS = 5, 8


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/spmf_tpu_jax_cache")

    rng = np.random.default_rng(0)
    rows = np.sort(rng.integers(0, B, NNZ)).astype(np.int32)  # CSR order
    cols_r = rng.integers(0, D, NNZ).astype(np.int32)
    cols_s = np.sort(cols_r)
    vals = rng.poisson(3.0, NNZ).astype(np.float32) + 1.0

    rows_d = jnp.asarray(rows)
    cols_rd = jnp.asarray(cols_r)
    cols_sd = jnp.asarray(cols_s)
    vals_d = jnp.asarray(vals)
    vT = jnp.asarray(rng.normal(size=(D, K)).astype(np.float32))
    theta = jnp.asarray(rng.gamma(2.0, 1.0, (B, K)).astype(np.float32))
    phi = jnp.asarray(rng.gamma(1.0, 1.0, D).astype(np.float32))

    def _t(f):
        return jax.jit(f)

    arms = {
        "take_vT": (_t(lambda c: jnp.sum(jnp.take(vT, c, axis=0), axis=0)),
                    (cols_rd,)),
        "take_vT_sorted": (
            _t(lambda c: jnp.sum(
                jnp.take(vT, c, axis=0, indices_are_sorted=True,
                         mode="clip"), axis=0)),
            (cols_sd,)),
        "take_theta": (
            _t(lambda r: jnp.sum(
                jnp.take(theta, r, axis=0, indices_are_sorted=True,
                         mode="clip"), axis=0)),
            (rows_d,)),
        "segsum": (
            _t(lambda v, r: jax.ops.segment_sum(
                v, r, num_segments=B, indices_are_sorted=True)),
            (vals_d, rows_d)),
    }

    def nzterm(r, c, v):
        th = jnp.take(theta, r, axis=0, indices_are_sorted=True,
                      mode="clip")              # (nnz, K)
        vc = jnp.take(vT, c, axis=0, mode="clip")  # (nnz, K)
        rate = jnp.sum(th * vc, axis=-1) + jnp.take(
            phi, c, mode="clip")
        ll = v * jnp.log(jnp.maximum(rate, 1e-30))
        return jax.ops.segment_sum(ll, r, num_segments=B,
                                   indices_are_sorted=True)

    arms["nzterm"] = (_t(nzterm), (rows_d, cols_rd, vals_d))

    # compile + warmup
    outs = {}
    for name, (f, a) in arms.items():
        outs[name] = f(*a)
        jax.device_get(outs[name].ravel()[0])

    times = {n: [] for n in arms}
    for r in range(ROUNDS):
        for name, (f, a) in arms.items():
            t0 = time.perf_counter()
            o = None
            for _ in range(ITERS):
                o = f(*a)
            jax.device_get(o.ravel()[0])
            times[name].append((time.perf_counter() - t0) / ITERS)

    res = {}
    for name, ts in times.items():
        ms = float(np.median(ts)) * 1e3
        res[name] = {"ms_median": round(ms, 3),
                     "mnnz_per_sec": round(NNZ / (ms * 1e-3) / 1e6, 1),
                     "ms_span": [round(min(ts) * 1e3, 3),
                                 round(max(ts) * 1e3, 3)]}
        print(f"{name:>16s}: {ms:8.3f} ms  "
              f"{res[name]['mnnz_per_sec']:9.1f} Mnnz/s  span {res[name]['ms_span']}")
    print(json.dumps(res))


if __name__ == "__main__":
    main()
