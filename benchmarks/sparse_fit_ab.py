#!/usr/bin/env python3
"""Sparse fit-path A/B: host-assembled COO (+prefetch) vs the r4
device-resident sparse whole-epoch scan (DeviceSparseCounts inside
lax.scan) vs the device general loop.

Rep-interleaved in one process (A,B,C,A,B,C,...): the tunnel's ~1.7x
ambient drift makes sequential fit comparisons untrustworthy
(docs/ROADMAP.md). Steady epoch = min(epoch_seconds[1:]) per fit; the
per-arm median over reps is reported.

    python benchmarks/sparse_fit_ab.py [--reps 3] [--epochs 4]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

N, D, P, B = 100_000, 50_000, 16, 8192
DENSITY = 0.001


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/spmf_tpu_jax_cache")

    from spmf_tpu import PoissonFactorization
    from spmf_tpu.data import SparseCounts

    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--epochs", type=int, default=4)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    nnz = int(N * D * DENSITY)
    sp_base = SparseCounts.from_coo(
        rng.integers(0, N, nnz), rng.integers(0, D, nnz),
        rng.poisson(3.0, nnz) + 1.0, (N, D))
    print(f"CSR {N}x{D} nnz={nnz:,} density={sp_base.density:.2%}",
          flush=True)

    def fresh():
        return SparseCounts(sp_base.indptr, sp_base.indices, sp_base.data,
                            sp_base.shape)

    def run(kind):
        m = PoissonFactorization(
            latent_dim=P, feature_dim=D, u_tau_scale=1.0 / np.sqrt(N * D),
            dtype="float32", scale_rows=False, sparse_dense_scatter=False,
        )
        if kind == "host":
            data = fresh().shuffle(seed=0).batch(
                B, drop_remainder=True).as_coo()
            kw = {}
        else:
            data = fresh().shuffle(seed=0).batch(
                B, drop_remainder=True).to_device()
            kw = ({"epoch_scan": False} if kind == "device-general" else
                  {"epoch_chunk": 4} if kind == "device-chunk4" else {})
        losses = m.fit(batched_data_factory=data, num_steps=args.epochs,
                       learning_rate=0.05, sample_size=8, verbose=False,
                       rel_tol=None, remat_sampling=False, prefetch=2, **kw)
        secs = m.last_fit.extras["epoch_seconds"]
        scan = m.last_fit.extras["epoch_scan"]
        del m, data
        return min(secs[1:]), secs, float(losses[-1]), scan

    arms = ["host", "device-general", "device-scan", "device-chunk4"]
    steady = {a: [] for a in arms}
    for rep in range(args.reps):
        for a in arms:
            t0 = time.perf_counter()
            s, secs, loss, scan = run(a)
            steady[a].append(s)
            print(f"rep{rep} {a:>15s}: steady {s:.3f}s  "
                  f"epochs {[round(x, 2) for x in secs]}  loss {loss:.1f} "
                  f"scan={scan}  (wall {time.perf_counter()-t0:.0f}s)",
                  flush=True)
    out = {}
    rows = N - (N % B)
    for a in arms:
        med = float(np.median(steady[a]))
        out[a] = {"steady_epoch_s_median": round(med, 3),
                  "rows_per_sec": round(rows / med, 1),
                  "steady_span": [round(min(steady[a]), 3),
                                  round(max(steady[a]), 3)]}
        print(f"{a:>15s}: {out[a]['rows_per_sec']:>9.1f} rows/sec "
              f"(steady {med:.3f}s, span {out[a]['steady_span']})",
              flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
