#!/usr/bin/env python3
"""Factorize pure Poisson noise — the model should shrink the encoding to ~0.

Script equivalent of reference notebooks/factorizing_random_noise.ipynb
(the first README-linked acceptance example, README.md:27-31). Recorded
reference results: initial loss 44.13 -> converged ~40.520; WAIC cell 9.
See docs/PARITY.md for the initialization caveat on the initial loss.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from spmf_tpu import PoissonMatrixFactorization
from spmf_tpu.data import ArrayDataset

N, D, P = 50_000, 30, 4

data = ArrayDataset.from_tensor_slices(
    {"counts": np.random.default_rng(0).poisson(1.0, size=(N, D)),
     "indices": np.arange(N)}
).batch(1000)

factor = PoissonMatrixFactorization(
    data, latent_dim=P, strategy=None,
    u_tau_scale=1.0 / np.sqrt(D * N),
)

losses = factor.calibrate_advi(num_steps=200, rel_tol=1e-4, learning_rate=0.05)

waic = factor.waic()
print(waic)

A = np.asarray(factor.encoding_matrix())
print("max |encoding| (should be ~0 for noise):", np.abs(A).max())

try:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 4))
    im = ax.imshow(A.T, vmin=0, cmap="Blues")
    ax.set_xlabel("item")
    ax.set_ylabel("dimension")
    fig.colorbar(im, orientation="horizontal")
    plt.savefig("noise_encoding.png", bbox_inches="tight")
    print("wrote noise_encoding.png")
except ImportError:
    pass
