"""Sparse-path benchmark: 100k x 50k CSR training (VERDICT r1 #5
acceptance; r2 #1 / r3 performance work). Full dense storage would be
100k x 50k x 4B = 20 GB per copy; here storage stays sparse (host CSR /
~nnz*16 bytes shipped per batch).

Configurations measured (one process; the tunnel's ambient drift makes
cross-process comparisons untrustworthy — CLAUDE.md):
  host-coo-gather-*        the COO gather-dot energy
                           (sparse_dense_scatter=False). The r2 version was
                           gather-bound at ~3.2 s/epoch (its batched
                           per-sample gathers materialize (nnz, S, K),
                           which TPU tiling pads 16->128 lanes = 8x bytes);
                           the r4 flat-gather rewrite folds samples into
                           the gather width (docs/gather_probe.json) and
                           is 3-4x faster — at this 0.1% density it now
                           BEATS the dense-scatter path while never
                           materializing the (B, D) slab.
  host-scatter-dense-b*    the r3 default TPU path: each COO batch is
                           scattered into a transient dense (B, D) slab on
                           device and fed to the fused MXU kernel (epoch
                           cost ~ N x D cells through the MXU, constant in
                           batch size). Still the default: it wins above
                           the ~0.3% density crossover (benchmarks/
                           sparse_ab.py interleaved A/B).
  device-coo-epoch-*       DeviceSparseCounts (r5): the whole shuffled
                           epoch's COO stream is decoded ON DEVICE once
                           (scatter+cumsum run decode, one flat gather);
                           each batch is three dynamic slices — zero host
                           work / zero per-batch H2D. The *-scan arms add
                           fit(epoch_scan=True): the entire epoch is ONE
                           jitted lax.scan dispatch.
  device-blocked-*         r5 block-aligned layout (block_rows=128): each
                           128-row block's triplets padded to one static
                           width at BUILD time; epochs shuffle blocks,
                           batches are one 2-D row gather, and the
                           blocked energy replaces every per-nnz
                           scatter/segment op with one fused table gather
                           + one-hot MXU contractions
                           (docs/sparse_epoch_decomp.json probes).
  device-scatter-dense     the same device assembly feeding the
                           dense-scatter + fused MXU path.
Writes docs/sparse_bench.json; the headline value is the best arm.
Since r4 the arms are REP-INTERLEAVED in one process (A,B,...,A,B,...)
with the per-arm median reported — the tunnel's ~1.7x ambient drift plus
its first-config warmup bias made the earlier sequential-arm rankings
untrustworthy (the first arms systematically lost; CLAUDE.md).
NOTE the host-* arms are additionally sensitive to host CPU load
(single-core host does the batch assembly): a contended run collapses
them 2-3x while the device-* arms hold steady — only run this benchmark
on a quiet host.
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
EPOCHS = 3

rng = np.random.default_rng(0)
nnz = int(N * D * DENSITY)
rows = rng.integers(0, N, nnz)
cols = rng.integers(0, D, nnz)
vals = rng.poisson(3.0, nnz) + 1.0
sp_base = SparseCounts.from_coo(rows, cols, vals, (N, D))
print(f"CSR built: {N}x{D}, nnz={len(sp_base.data):,} "
      f"(density {sp_base.density:.2%}), "
      f"dense equivalent {N*D*4/2**30:.1f} GiB", flush=True)


def run(label, data, prefetch, bs, scatter=None, epoch_scan=None):
    m = PoissonFactorization(
        latent_dim=P, feature_dim=D, u_tau_scale=1.0 / np.sqrt(N * D),
        dtype="float32", data=data, scale_rows=False,
        sparse_dense_scatter=scatter,
    )
    kw = {} if epoch_scan is None else {"epoch_scan": epoch_scan}
    losses = m.fit(batched_data_factory=data, num_steps=EPOCHS,
                   learning_rate=0.05, sample_size=8, verbose=False,
                   rel_tol=None, remat_sampling=False, prefetch=prefetch,
                   **kw)
    epoch_s = m.last_fit.extras["epoch_seconds"]
    steady = min(epoch_s[1:])
    out = {
        "steady_epoch_s": steady,
        "epoch_seconds": [round(s, 2) for s in epoch_s],
        "losses": [round(float(l), 4) for l in losses],
    }
    del m, data
    return out


def fresh_host(bs=B):
    s = SparseCounts(sp_base.indptr, sp_base.indices, sp_base.data,
                     sp_base.shape)
    return s.shuffle(seed=0).batch(bs, drop_remainder=True).as_coo()


# arm -> (batch, data builder, sparse_dense_scatter)
# host-coo-gather-*: the flat-gather COO energy (r4 rewrite: folds
#   samples into the gather width, docs/gather_probe.json — the r2
#   version's batched per-sample gathers padded (nnz, S, K) 8x under TPU
#   tiling). Larger batches amortize the batch-count-scaled sampling
#   cost (the nz gather work per epoch is fixed at nnz).
# device-coo-gather: DeviceSparseCounts (HBM CSR + jitted on-device COO
#   assembly) feeding the flat-gather energy.
# *-scatter-dense-*: the dense-slab path — scatter the COO batch into a
#   transient dense (B, D) slab on device, run the fused MXU kernel;
#   wins above the ~0.17% interleaved density crossover
#   (benchmarks/sparse_ab.py).
ARMS = {
    "host_coo_gather_b8192": (8192, lambda: fresh_host(8192), False, None),
    "device_coo_epoch_b8192": (
        8192, lambda: fresh_host(8192).to_device(), False, None),
    "device_coo_epoch_scan_b8192": (
        8192, lambda: fresh_host(8192).to_device(), False, True),
    "device_coo_epoch_scan_b32768": (
        32768, lambda: fresh_host(32768).to_device(), False, True),
    # r5 headline arm: block-aligned layout (to_device(block_rows=128)) +
    # the blocked COO energy — one fused per-nnz table gather, every
    # segment op a one-hot MXU contraction; epochs shuffle 128-row blocks
    "device_blocked_b8192": (
        8192, lambda: fresh_host(8192).to_device(block_rows=128),
        False, None),
    "device_blocked_b32768": (
        32768, lambda: fresh_host(32768).to_device(block_rows=128),
        False, None),
    "host_scatter_dense_b8192": (8192, lambda: fresh_host(8192), None, None),
    "device_scatter_dense_b8192": (
        8192, lambda: fresh_host(8192).to_device(), None, None),
}
REPS = 3

steady = {a: [] for a in ARMS}
detail = {}
for rep in range(REPS):
    for label, (bs, build, scatter, escan) in ARMS.items():
        t0 = time.time()
        out = run(label, build(), 2, bs, scatter=scatter, epoch_scan=escan)
        steady[label].append(out["steady_epoch_s"])
        detail[label] = out
        print(f"rep{rep} {label:>26s}: steady {out['steady_epoch_s']:.3f}s "
              f"epochs {out['epoch_seconds']} (wall {time.time()-t0:.0f}s)",
              flush=True)

configs = {}
for label, (bs, _, _, _) in ARMS.items():
    med = float(np.median(steady[label]))
    configs[label] = {
        "batch": bs,
        "rows_per_sec": round((N // bs) * bs / med, 1),
        "steady_epoch_s_median": round(med, 3),
        "steady_span": [round(min(steady[label]), 3),
                        round(max(steady[label]), 3)],
        "epoch_seconds": detail[label]["epoch_seconds"],
        "losses": detail[label]["losses"],
    }
    print(f"{label:>26s}: {configs[label]['rows_per_sec']:>9.1f} rows/sec "
          f"(median {med:.3f}s, span {configs[label]['steady_span']})",
          flush=True)

best_label = max(configs, key=lambda k: configs[k]["rows_per_sec"])
result = {
    "metric": "sparse_coo_train_rows_per_sec",
    "value": configs[best_label]["rows_per_sec"],
    "unit": f"rows/sec (N={N}, D={D}, nnz={nnz}, P={P}, "
            f"batch={configs[best_label]['batch']}, f32, "
            f"{best_label.replace('_', '-')}, steady-state epoch)",
    "configs": configs,
    "r2_baseline_rows_per_sec": 30789.4,
}
print(json.dumps({k: result[k] for k in ("metric", "value", "unit")}),
      flush=True)
path = os.path.join(os.path.dirname(__file__), "..", "docs",
                    "sparse_bench.json")
with open(path, "w") as f:
    json.dump(result, f, indent=2)
print("wrote", os.path.abspath(path))
