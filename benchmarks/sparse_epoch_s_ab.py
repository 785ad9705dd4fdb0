"""Sample-axis A/B on the r5 device-epoch sparse path.

The r4 verdict "antithetic does not pay on sparse"
(docs/sparse_antithetic_ab.json) was measured when the sparse epoch was
HOST-bound (COO assembly + H2D set the floor, so halving the S-scaled
device compute bought nothing). The r5 epoch-decode path removed all
per-batch host work — the epoch is now device compute, which IS S-scaled
(sampling + the per-sample encode/energy sweeps), so the dense headline's
antithetic lever should transfer. Rep-interleaved same-process arms on
the 100k x 50k 0.1% config, device_coo_epoch_scan at B=32768.

Writes docs/sparse_epoch_s_ab.json. TPU (~15 min incl. compiles):
    python benchmarks/sparse_epoch_s_ab.py
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/spmf_tpu_jax_cache")

from spmf_tpu import PoissonFactorization
from spmf_tpu.data import SparseCounts

N, D, P, B = 100_000, 50_000, 16, 32_768
DENSITY = 0.001
EPOCHS = 3
REPS = 3

rng = np.random.default_rng(0)
nnz = int(N * D * DENSITY)
sp_base = SparseCounts.from_coo(
    rng.integers(0, N, nnz), rng.integers(0, D, nnz),
    rng.poisson(3.0, nnz) + 1.0, (N, D))
print(f"CSR built: {N}x{D}, nnz={len(sp_base.data):,}", flush=True)


def fresh():
    s = SparseCounts(sp_base.indptr, sp_base.indices, sp_base.data,
                     sp_base.shape)
    return s.shuffle(seed=0).batch(B, drop_remainder=True).to_device()


def run(S, antithetic):
    data = fresh()
    m = PoissonFactorization(
        latent_dim=P, feature_dim=D, u_tau_scale=1.0 / np.sqrt(N * D),
        dtype="float32", data=data, scale_rows=False,
        sparse_dense_scatter=False,
    )
    losses = m.fit(batched_data_factory=data, num_steps=EPOCHS,
                   learning_rate=0.05, sample_size=S, verbose=False,
                   rel_tol=None, remat_sampling=False,
                   antithetic=antithetic)
    steady = min(m.last_fit.extras["epoch_seconds"][1:])
    del m, data
    return steady, [round(float(l), 4) for l in losses]


ARMS = {
    "S8_ind": (8, False),
    "S4_anti": (4, True),
    "S4_strat": (4, "stratified"),
    "S2_anti": (2, True),
}
steady = {a: [] for a in ARMS}
losses = {}
for rep in range(REPS):
    for label, (S, anti) in ARMS.items():
        t0 = time.time()
        s, ls = run(S, anti)
        steady[label].append(s)
        losses[label] = ls
        print(f"rep{rep} {label:>9s}: steady {s:.3f}s "
              f"(wall {time.time()-t0:.0f}s)", flush=True)

rows = N - (N % B)
out = {"config": {"N": N, "D": D, "P": P, "B": B, "density": DENSITY,
                  "path": "device_coo_epoch_scan"},
       "arms": {}}
for label in ARMS:
    med = float(np.median(steady[label]))
    out["arms"][label] = {
        "steady_epoch_s_median": round(med, 3),
        "steady_span": [round(min(steady[label]), 3),
                        round(max(steady[label]), 3)],
        "rows_per_sec": round(rows / med, 1),
        "losses": losses[label],
    }
    print(f"{label:>9s}: {out['arms'][label]['rows_per_sec']:>9.1f} rows/sec "
          f"(median {med:.3f}s span {out['arms'][label]['steady_span']})",
          flush=True)

path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                    "docs", "sparse_epoch_s_ab.json")
with open(path, "w") as f:
    json.dump(out, f, indent=2)
print("wrote", os.path.abspath(path))
