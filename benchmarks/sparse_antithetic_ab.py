#!/usr/bin/env python3
"""Sparse x antithetic A/B: does the dense headline's estimator lever
(S=4 antithetic, measured-equal quality to S=8 independent on the noise
config — docs/antithetic_experiment.json) compose with the flat-gather
COO energy that holds the sparse headline?

Antithetic sampling lives entirely in the surrogate sampler
(vi/surrogates.py / ops/fused_ig.py mirrored pairs); the energy never
sees it, so composition is mechanical — but the sparse step's cost
decomposition differs from the dense one (nz-gather bytes AND the
D=50k-scale surrogate sampling both scale with S), so the speedup must
be measured, not assumed.

Rep-interleaved in one process (A,B,C,A,B,C,...): the tunnel's ~1.7x
ambient drift makes sequential fit comparisons untrustworthy
(docs/ROADMAP.md). Steady epoch = min(epoch_seconds[1:]) per fit;
per-arm median over reps is reported. Throughput-only: the estimator
quality evidence (S4-anti == S8-indep) is the dense-config experiment;
the objective and surrogate family are identical here.

    python benchmarks/sparse_antithetic_ab.py [--reps 3] [--epochs 4]
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

    def run(sample_size, antithetic):
        m = PoissonFactorization(
            latent_dim=P, feature_dim=D, u_tau_scale=1.0 / np.sqrt(N * D),
            dtype="float32", scale_rows=False, sparse_dense_scatter=False,
        )
        data = SparseCounts(sp_base.indptr, sp_base.indices, sp_base.data,
                            sp_base.shape).shuffle(seed=0).batch(
                                B, drop_remainder=True).as_coo()
        losses = m.fit(batched_data_factory=data, num_steps=args.epochs,
                       learning_rate=0.05, sample_size=sample_size,
                       antithetic=antithetic, verbose=False,
                       rel_tol=None, remat_sampling=False, prefetch=2)
        secs = m.last_fit.extras["epoch_seconds"]
        del m, data
        return min(secs[1:]), secs, float(losses[-1])

    arms = {"s8-independent": (8, False),
            "s4-antithetic": (4, True),
            "s2-antithetic": (2, True)}
    steady = {a: [] for a in arms}
    for rep in range(args.reps):
        for a, (s, anti) in arms.items():
            t0 = time.perf_counter()
            st, secs, loss = run(s, anti)
            steady[a].append(st)
            print(f"rep{rep} {a:>15s}: steady {st:.3f}s  "
                  f"epochs {[round(x, 2) for x in secs]}  loss {loss:.1f} "
                  f"(wall {time.perf_counter()-t0:.0f}s)", flush=True)
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
    path = os.path.join(os.path.dirname(__file__), "..", "docs",
                        "sparse_antithetic_ab.json")
    with open(path, "w") as f:
        json.dump({"config": dict(N=N, D=D, P=P, B=B, density=DENSITY,
                                  epochs=args.epochs, reps=args.reps,
                                  energy="flat-gather COO"),
                   "arms": out}, f, indent=2)
    print("wrote", os.path.abspath(path))


if __name__ == "__main__":
    main()
