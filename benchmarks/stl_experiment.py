#!/usr/bin/env python3
"""STL (sticking-the-landing) vs standard ELBO estimator on the parity
config (noise: N=50k, D=30, P=4, batch 1000, lr .05 — SURVEY.md §6).

Measures, in ONE process (tunnel methodology):
  - epochs to cross the reference's converged 40.52 (epochs-to-parity),
  - the converged loss shelf (mean of the trailing window),
  - ELBO-gradient variance at the converged point (the STL claim).
Writes docs/stl_experiment.json.
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/spmf_tpu_jax_cache")

import jax.numpy as jnp

from spmf_tpu import PoissonFactorization
from spmf_tpu.data import ArrayDataset

N, D, P, BS = 50_000, 30, 4, 1000
EPOCHS = 30
TARGET = 40.52


def run(estimator):
    rng = np.random.default_rng(0)
    X = rng.poisson(1.0, size=(N, D))
    data = ArrayDataset({"counts": X, "indices": np.arange(N)}).batch(BS)
    m = PoissonFactorization(
        latent_dim=P, feature_dim=D, u_tau_scale=1 / np.sqrt(N * D),
        dtype="float32", data=data,
    )
    losses = m.fit(
        batched_data_factory=data, num_steps=EPOCHS, learning_rate=0.05,
        rel_tol=None, clip_value=5.0, sample_size=8, seed=3, verbose=False,
        elbo_estimator=estimator,
    )
    epochs_to = next(
        (i for i, l in enumerate(losses[1:], 1) if l < TARGET), None
    )
    out = {
        "estimator": estimator,
        "epochs_to_40.52": epochs_to,
        "final_window_mean": float(np.mean(losses[-6:])),
        "best_loss": float(np.min(losses[1:])),
        "losses_tail": [round(float(l), 4) for l in losses[-6:]],
    }

    # gradient variance at the converged point (u loc leaf, per-element
    # mean variance across keys)
    batch = next(iter(data))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    batch["counts"] = batch["counts"].astype(jnp.float32)
    sur = m._surrogate

    @jax.jit
    def grad_u(params, key):
        def loss(p):
            if estimator == "stl":
                p_stop = jax.tree_util.tree_map(jax.lax.stop_gradient, p)
                s, lq = sur.sample_and_log_prob(p, key, (8,),
                                                logq_params=p_stop)
            else:
                s, lq = sur.sample_and_log_prob(p, key, (8,))
            lp = m.unormalized_log_prob(data=batch, **s)
            return -jnp.mean(lp - lq) / BS

        return jax.grad(loss)(params)["u"]["loc"]

    keys = jax.random.split(jax.random.PRNGKey(11), 32)
    gs = np.stack([np.asarray(grad_u(m.surrogate_params, k)) for k in keys])
    out["grad_var_u_loc_mean"] = float(gs.var(axis=0).mean())
    print(json.dumps(out), flush=True)
    return out


def main():
    results = {e: run(e) for e in ("standard", "stl")}
    ratio = (results["standard"]["grad_var_u_loc_mean"]
             / max(results["stl"]["grad_var_u_loc_mean"], 1e-30))
    results["summary"] = {
        "grad_variance_ratio_standard_over_stl": round(ratio, 2),
        "note": "parity config, f32 TPU fused path, same seeds/batches",
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                        "docs", "stl_experiment.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", os.path.abspath(path))


if __name__ == "__main__":
    main()
