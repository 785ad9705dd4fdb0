#!/usr/bin/env python3
"""Public-fit() throughput: epoch_chunk (K epochs per dispatch) vs the
single-epoch scan path, interleaved same-process (the tunnel's ~1.7x
ambient drift makes sequential comparisons untrustworthy; docs/ROADMAP.md).

Measures steady-state epoch seconds from FitResult.extras — for chunked
fits that is chunk_wall/K, which is exactly the amortized per-epoch cost
including the once-per-chunk dispatch + loss fetch.

    python benchmarks/fit_path_bench.py [--rows 49152] [--batch 16384]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

D = int(os.environ.get("FPB_D", 20000))
P = int(os.environ.get("FPB_P", 32))
S = 8


def run_fit(fit_kwargs, X, B, seed, samples=S, antithetic=False):
    from spmf_tpu import PoissonFactorization
    from spmf_tpu.data import DeviceArrayDataset

    model = PoissonFactorization(
        latent_dim=P, feature_dim=D, u_tau_scale=1.0 / np.sqrt(X.shape[0] * D),
        dtype="float32", scale_columns=False,
    )
    ds = DeviceArrayDataset({"counts": X}, batch_size=B, shuffle=True,
                            seed=seed, drop_remainder=True)
    model.fit(ds, sample_size=samples, antithetic=antithetic,
              learning_rate=0.01, rel_tol=None,
              verbose=False, seed=seed, **fit_kwargs)
    res = model.last_fit
    secs = res.extras["epoch_seconds"]
    del model, ds
    return secs, res.extras


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=49152)
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--samples", type=int, default=S,
                    help="ELBO sample size (pair with --antithetic for the "
                         "S4-antithetic operating point)")
    ap.add_argument("--antithetic", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/spmf_tpu_jax_cache")

    rng = np.random.default_rng(0)
    X = rng.poisson(1.0, size=(args.rows, D)).astype(np.float32)
    nb = args.rows // args.batch

    # label -> (fit_kwargs, steady-state epochs to skip for warmup/compile)
    K = 8
    variants = {
        "chunk8": (dict(num_steps=3 * K, epoch_chunk=K), K),
        "single": (dict(num_steps=9, epoch_chunk=1), 2),
        "general": (dict(num_steps=6, epoch_scan=False), 2),
    }
    results = {k: [] for k in variants}
    for rep in range(args.reps):
        for label, (fk, skip) in variants.items():
            t0 = time.perf_counter()
            secs, _ = run_fit(fk, X, args.batch, seed=rep,
                              samples=args.samples,
                              antithetic=args.antithetic)
            steady = float(np.median(secs[skip:]))
            rows_sec = nb * args.batch / steady
            results[label].append(rows_sec)
            print(f"rep {rep} {label:8s}: steady {steady*1000:8.1f} ms/epoch "
                  f"({steady*1000/nb:6.1f} ms/batch, {rows_sec:9,.0f} rows/sec)"
                  f"  [fit wall {time.perf_counter()-t0:.1f}s]", flush=True)

    summary = {
        k: {"median_rows_per_sec": float(np.median(v)), "reps": v}
        for k, v in results.items()
    }
    summary["config"] = {"rows": args.rows, "batch": args.batch, "D": D,
                         "P": P, "S": args.samples,
                         "antithetic": args.antithetic, "chunk": K}
    print(json.dumps(summary, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
