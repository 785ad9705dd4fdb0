#!/usr/bin/env python3
"""Factorize counts with planted nonlinear-manifold structure.

Script equivalent of reference notebooks/factorize_nonlinear_structure.ipynb
(data generation: cell 2; recorded: initial loss 54.6769 -> ~46.96, WAIC
1352797.96; batch=10000). NOTE: "nonlinear" names the DATA generation —
the notebook's model is the stock identity-link factorizer (cell 4 passes
no ``log_transform``; the reference default is False, poisson.py:61). An
earlier revision of this script added ``log_transform=True``, which is a
DIFFERENT model and converges to ~49.0 instead of the recorded ~46.96-47.1
(docs/nonlinear_init_experiment.json; docs/PARITY.md).
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from spmf_tpu import PoissonMatrixFactorization
from spmf_tpu.data import ArrayDataset

N, D_factor, D_noise, P = 50_000, 10, 20, 3
D = D_factor + D_noise

rng = np.random.default_rng(0)
V = np.abs(rng.normal(1.5, 0.5, size=(P, D_factor)))
Z = np.abs(rng.normal(0.5, 1.0, size=(N, P)))
ZV = Z.dot(V)

X = rng.poisson(1.0, size=(N, D))
X[:, ::3] = rng.poisson(ZV * np.exp(ZV / ZV.mean() / 10) + (ZV / ZV.mean() / 10) ** 2)

data = ArrayDataset({"counts": X, "indices": np.arange(N)}).batch(10_000)
factor = PoissonMatrixFactorization(
    data, latent_dim=P, strategy=None,
    u_tau_scale=1.0 / np.sqrt(D * N),
)
losses = factor.calibrate_advi(num_steps=450, rel_tol=3e-5, learning_rate=0.05)
print(factor.waic())

A = np.asarray(factor.encoding_matrix())
col_mass = np.abs(A).sum(1)
print("signal col mass:", col_mass[::3].mean(), "noise col mass:",
      np.delete(col_mass, np.s_[::3]).mean())

try:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(1, 2, figsize=(12, 4))
    im = ax[0].imshow(A.T, vmin=0, cmap="Blues", aspect="auto")
    ax[0].set_xlabel("item")
    ax[0].set_ylabel("dimension")
    fig.colorbar(im, ax=ax[0], orientation="horizontal")
    ax[1].plot(losses)
    ax[1].set_xlabel("epoch")
    ax[1].set_ylabel("avg-batch loss")
    plt.savefig("factorize_nonlinear_structure.png", bbox_inches="tight")
    print("wrote factorize_nonlinear_structure.png")
except ImportError:
    pass
