#!/usr/bin/env python3
"""scRNA-seq (pbmc3k-style) walkthrough.

Script equivalent of reference notebooks/rnaseq.ipynb: end-to-end on a
preprocessed count matrix — if the real pbmc3k npy triplet is unavailable, a
synthetic stand-in with realistic sparsity is generated so the walkthrough
always runs. For real data, run bin/preprocess_scrnaseq_counts.py first and
point --datapath at its output, then bin/factorize_scrnaseq_counts.py (this
script is the annotated library-level version of that pipeline).
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from spmf_tpu import PoissonMatrixFactorization
from spmf_tpu.data import ArrayDataset

ap = argparse.ArgumentParser()
ap.add_argument("--datapath", default=None)
ap.add_argument("--dataset", default="pbmc3k")
ap.add_argument("-d", "--dimension", type=int, default=3)
ap.add_argument("-e", "--num-steps", type=int, default=100)
args = ap.parse_args()

if args.datapath and os.path.exists(
    os.path.join(args.datapath, args.dataset + "_counts.npy")
):
    X = np.load(os.path.join(args.datapath, args.dataset + "_counts.npy"))
    gene_names = np.load(
        os.path.join(args.datapath, args.dataset + "_genenames.npy"),
        allow_pickle=True,
    )
else:
    print("no real data found — generating a synthetic sparse count matrix")
    rng = np.random.default_rng(0)
    N, D, P_true = 2638, 1000, 5
    lib = rng.lognormal(0, 0.5, size=(N, 1))
    loadings = rng.gamma(0.3, 1.0, size=(P_true, D))
    z = rng.gamma(0.5, 1.0, size=(N, P_true))
    X = rng.poisson(lib * (z @ loadings) / 5.0)
    gene_names = np.array([f"GENE{i}" for i in range(D)])

P = args.dimension
N, D = X.shape
BATCH_SIZE = 256

after = np.median(X.sum(1))
row_size_factors = X.sum(1) / after
col_norm = X.mean(0)

data = (
    ArrayDataset(
        {"data": X, "indices": np.arange(N), "normalization": row_size_factors}
    )
    .shuffle(buffer_size=N)
    .batch(BATCH_SIZE, drop_remainder=True)
)

factor = PoissonMatrixFactorization(
    data, latent_dim=P, strategy=None, scale_rates=True,
    column_norms=col_norm, log_transform=True,
    u_tau_scale=1.0 / np.sqrt(D * N),
)
losses = factor.calibrate_advi(
    num_steps=args.num_steps, learning_rate=0.01,
    abs_tol=1e-3, rel_tol=1e-3, clip_value=10.0,
)

gene_score = np.asarray(factor.decoding_matrix()) * col_norm[None, :]
cell_score = np.asarray(factor.encode(X)) * row_size_factors[:, None]
print("top genes per factor:")
for j in range(P):
    top = np.argsort(-gene_score[j])[:8]
    print(f"  factor {j}:", ", ".join(str(g) for g in gene_names[top]))
print("cell score shape:", cell_score.shape)
