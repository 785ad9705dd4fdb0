#!/usr/bin/env python3
"""Three-model comparison figure: noise vs linear vs nonlinear structure.

Script equivalent of reference notebooks/simulation_figure.ipynb (cells 1-2:
fits three PoissonMatrixFactorization models with scale_rates=True and
renders side-by-side encoding heatmaps).
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from spmf_tpu import PoissonMatrixFactorization
from spmf_tpu.data import ArrayDataset

N, D_factor, D_noise, P = 50_000, 10, 20, 3
D = D_factor + D_noise
STEPS = int(os.environ.get("SIM_STEPS", "100"))

rng = np.random.default_rng(0)
V = np.abs(rng.normal(1.5, 0.5, size=(P, D_factor)))
Z = np.abs(rng.normal(0, 1, size=(N, P)))
ZV = Z.dot(V)

X_lin = rng.poisson(1.0, size=(N, D))
X_lin[:, ::3] = rng.poisson(ZV)
X_nonlin = rng.poisson(1.0, size=(N, D))
X_nonlin[:, ::3] = rng.poisson(
    ZV * np.exp(ZV / ZV.mean() / 10) + (ZV / ZV.mean() / 10) ** 2
)
X_noise = rng.poisson(1.0, size=(N, D))

results = {}
for label, X in [("noise", X_noise), ("linear", X_lin), ("nonlinear", X_nonlin)]:
    data = ArrayDataset(
        {"data": X, "indices": np.arange(N), "normalization": np.ones(N)}
    ).batch(1000)
    factor = PoissonMatrixFactorization(
        data, latent_dim=P, strategy=None, scale_rates=True, with_s=True,
        u_tau_scale=1.0 / np.sqrt(D * N),
    )
    factor.calibrate_advi(num_steps=STEPS, rel_tol=1e-4, learning_rate=0.05)
    results[label] = np.asarray(factor.encoding_matrix())

try:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 3, figsize=(15, 5))
    for ax, (label, A) in zip(axes, results.items()):
        im = ax.imshow(A, vmin=0, cmap="Blues", aspect="auto")
        ax.set_title(label)
        ax.set_xlabel("factor dimension")
        ax.set_ylabel("item")
        fig.colorbar(im, ax=ax)
    plt.savefig("simulation_figure.png", bbox_inches="tight")
    print("wrote simulation_figure.png")
except ImportError:
    for label, A in results.items():
        print(label, "encoding col mass:", np.abs(A).sum(1).round(3))
