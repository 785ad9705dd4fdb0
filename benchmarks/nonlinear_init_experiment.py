#!/usr/bin/env python3
"""Demonstrate (or falsify) the nonlinear-structure initialization attribution.

The reference notebook (notebooks/factorize_nonlinear_structure.ipynb cells
5-6) records initial loss 54.68 -> converged ~46.96; the rebuild converges to
~49.0 from HEAD's tiny softplus(-6) surrogate initializations
(docs/PARITY.md). The standing attribution: the notebook ran an OLD code
version whose surrogates initialized at the data scale, landing in a
different mode of a multi-modal (misspecified-model) ELBO landscape. That
attribution was asserted from seed/f64 controls, never demonstrated
(VERDICT r2, Missing #1 / task #2).

This script runs the CURRENT model on the exact nonlinear config with a
sweep of data-scale surrogate initializations (softplus-space loc set so the
post-bijector mean is `value`), records initial/converged losses, and writes
docs/nonlinear_init_experiment.json. Success criterion: some data-scale init
reproduces BOTH the recorded initial-loss magnitude (~55) and the recorded
optimum (~46.96). Runs on the default backend (TPU f32 fused; the r2
controls showed f32-TPU and f64-CPU land on the same optimum).
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/spmf_tpu_jax_cache")

import jax.numpy as jnp  # noqa: E402

from spmf_tpu import PoissonMatrixFactorization  # noqa: E402
from spmf_tpu.data import ArrayDataset  # noqa: E402

N, D_factor, D_noise, P = 50_000, 10, 20, 3
D = D_factor + D_noise
NUM_STEPS = 250
RECORDED = {"initial": 54.6769, "converged": 46.96}


def make_data():
    # identical generation to examples/factorize_nonlinear_structure.py
    # (reference notebooks/factorize_nonlinear_structure.ipynb cell 2 scheme)
    rng = np.random.default_rng(0)
    V = np.abs(rng.normal(1.5, 0.5, size=(P, D_factor)))
    Z = np.abs(rng.normal(0.5, 1.0, size=(N, P)))
    ZV = Z.dot(V)
    X = rng.poisson(1.0, size=(N, D))
    X[:, ::3] = rng.poisson(
        ZV * np.exp(ZV / ZV.mean() / 10) + (ZV / ZV.mean() / 10) ** 2
    )
    return X


def inv_softplus(y):
    return float(np.log(np.expm1(y)))


def run(X, init_value=None, init_scale=None, seed=0, label="default"):
    data = ArrayDataset({"counts": X, "indices": np.arange(N)}).batch(10_000)
    factor = PoissonMatrixFactorization(
        data, latent_dim=P, strategy=None, log_transform=True,
        u_tau_scale=1.0 / np.sqrt(D * N),
    )
    if init_value is not None:
        # move the softplus-bijected surrogates (u, v, w, s) to a
        # data-scale operating point: post-bijector mean = init_value
        loc = inv_softplus(init_value)
        params = dict(factor.surrogate_params)
        for name in ("u", "v", "w", "s"):
            p = dict(params[name])
            p["loc"] = jnp.full_like(p["loc"], loc)
            if init_scale is not None:
                p["raw_scale"] = jnp.full_like(
                    p["raw_scale"], inv_softplus(init_scale)
                )
            params[name] = p
        factor.surrogate_params = params
        factor.set_calibration_expectations()
    losses = factor.calibrate_advi(
        num_steps=NUM_STEPS, rel_tol=1e-4, learning_rate=0.05, seed=seed,
        verbose=False,
    )
    tail = [l for l in losses[-8:] if np.isfinite(l)]
    out = {
        "label": label,
        "init_value": init_value,
        "init_scale": init_scale,
        "seed": seed,
        "initial_loss": float(losses[0]),
        "final_loss": float(np.mean(tail)) if tail else float("nan"),
        "epochs": len(losses) - 1,
    }
    print(json.dumps(out), flush=True)
    return out


def main():
    X = make_data()
    runs = [run(X, None, label="head-default (control)")]
    for value in (0.1, 0.3, 1.0):
        runs.append(run(X, value, label=f"data-scale loc={value}"))
    # wider posterior starts too (the old version's scale inits were not
    # the 5e-4 of HEAD either)
    runs.append(run(X, 0.3, init_scale=0.01, label="loc=0.3 scale=1e-2"))
    runs.append(run(X, 1.0, init_scale=0.01, label="loc=1.0 scale=1e-2"))

    hits = [r for r in runs if abs(r["final_loss"] - RECORDED["converged"]) < 0.3]
    verdict = (
        "reproduced: data-scale initialization reaches the recorded optimum"
        if hits else
        "falsified: no data-scale initialization reached ~46.96 — the "
        "attribution must be retracted or widened"
    )
    result = {"recorded": RECORDED, "runs": runs, "hits": [r["label"] for r in hits],
              "verdict": verdict}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                        "docs", "nonlinear_init_experiment.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=2)
    print("wrote", os.path.abspath(path))
    print(verdict)


if __name__ == "__main__":
    main()
