"""Sparse-path benchmark: train on a 100k x 50k CSR matrix without ever
densifying it (VERDICT r1 #5 acceptance).

Dense would be 100k x 50k x 4B = 20 GB per copy (untrainable with slab
batches through a 1-core host); the COO path ships ~nnz*16 bytes per batch
and runs the gather-dot/segment-sum energy on device. Prints a JSON line
with rows/sec and the implied dense-equivalent footprint.
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

N, D, P, B = 100_000, 50_000, 16, 2048
DENSITY = 0.001  # ~5M nonzeros

rng = np.random.default_rng(0)
nnz = int(N * D * DENSITY)
rows = rng.integers(0, N, nnz)
cols = rng.integers(0, D, nnz)
vals = rng.poisson(3.0, nnz) + 1.0
sp = SparseCounts.from_coo(rows, cols, vals, (N, D))
print(f"CSR built: {N}x{D}, nnz={len(sp.data):,} (density {sp.density:.2%}), "
      f"dense equivalent {N*D*4/2**30:.1f} GiB", flush=True)

sp = sp.shuffle(seed=0).batch(B, drop_remainder=True).as_coo()
m = PoissonFactorization(
    latent_dim=P, feature_dim=D, u_tau_scale=1.0 / np.sqrt(N * D),
    dtype="float32", data=sp, scale_rows=False,
)

losses = m.fit(batched_data_factory=sp, num_steps=3, learning_rate=0.05,
               sample_size=8, verbose=False, rel_tol=None, remat_sampling=False)
# first epoch pays the jit compile; steady-state = later epochs
epoch_s = m.last_fit.extras["epoch_seconds"]
steady = min(epoch_s[1:])
result = {
    "metric": "sparse_coo_train_rows_per_sec",
    "value": round((N // B) * B / steady, 1),
    "unit": f"rows/sec (N={N}, D={D}, nnz={nnz}, P={P}, batch={B}, f32, "
            "coo energy, steady-state epoch incl. host batch assembly)",
    "losses": [round(float(l), 4) for l in losses],
    "epoch_seconds": [round(s, 2) for s in epoch_s],
}
print(json.dumps(result), flush=True)
path = os.path.join(os.path.dirname(__file__), "..", "docs",
                    "sparse_bench.json")
with open(path, "w") as f:
    json.dump(result, f, indent=2)
