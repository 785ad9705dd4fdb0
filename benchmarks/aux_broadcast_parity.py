"""Validate ``aux_broadcast=True`` for parity and gradient variance.

VERDICT r1 #4: the claimed ~2x step speedup from sharing one horseshoe-
auxiliary draw across the S ELBO samples (SurrogatePosterior.broadcast_names)
was only shape/finiteness tested. This script measures, on the reference
noise config (notebooks/factorizing_random_noise: N=50k, D=30, P=4,
batch 1000, lr .05, f64):

1. converged avg-batch loss with and without broadcast (parity target
   ~= 40.50, reference 40.520), and
2. the per-variable gradient variance ratio broadcast/independent over many
   seeds at a fixed parameter point (the broadcast estimator stays unbiased;
   the question is how much estimator variance it adds).

Writes docs/aux_broadcast_parity.json. Run on the 1-core CPU host
(~5-10 min): python benchmarks/aux_broadcast_parity.py
"""
import json
import os
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/spmf_tpu_jax_cache")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from spmf_tpu import PoissonFactorization  # noqa: E402
from spmf_tpu.data import ArrayDataset  # noqa: E402

N, D, P = 50_000, 30, 4
EPOCHS = int(os.environ.get("AUX_EPOCHS", "80"))


def build(aux_broadcast):
    rng = np.random.default_rng(0)
    X = rng.poisson(1.0, size=(N, D))
    data = ArrayDataset({"counts": X, "indices": np.arange(N)}).batch(1000)
    m = PoissonFactorization(
        latent_dim=P, feature_dim=D, u_tau_scale=1 / np.sqrt(N * D),
        dtype="float64", data=data, aux_broadcast=aux_broadcast,
    )
    return m, data, X


def converged_loss(aux_broadcast):
    m, data, _ = build(aux_broadcast)
    t0 = time.perf_counter()
    losses = m.calibrate_advi(
        num_steps=EPOCHS, learning_rate=0.05, rel_tol=1e-4, clip_value=5.0,
        sample_size=8, seed=3, verbose=False,
    )
    return {
        "final_loss": float(losses[-1]),
        "best_loss": float(np.nanmin(losses)),
        "epochs": len(losses) - 1,
        "seconds": time.perf_counter() - t0,
    }


def grad_variance(n_seeds=48, sample_size=8):
    """Elementwise gradient variance across seeds, per arm, at the init
    point, on one fixed batch."""
    m, _, X = build(False)
    batch = {"counts": jnp.asarray(X[:1000], jnp.float64),
             "indices": jnp.arange(1000)}
    out = {}
    for arm in ("independent", "broadcast"):
        m2, _, _ = build(arm == "broadcast")
        sur, params = m2._surrogate, m2.surrogate_params

        def loss_fn(p, key):
            samples, logq = sur.sample_and_log_prob(p, key, (sample_size,))
            lp = m2.unormalized_log_prob(data=batch, **samples)
            return -jnp.mean(lp - logq) / 1000.0

        gfn = jax.jit(jax.grad(loss_fn))
        grads = [gfn(params, jax.random.PRNGKey(1000 + i)) for i in range(n_seeds)]
        flat = [np.concatenate([np.asarray(x).ravel()
                                for x in jax.tree_util.tree_leaves(g)])
                for g in grads]
        stack = np.stack(flat)
        out[arm] = {
            "mean_grad_norm": float(np.linalg.norm(stack.mean(0))),
            "var_trace": float(stack.var(0).sum()),
        }
    out["var_ratio_broadcast_over_independent"] = (
        out["broadcast"]["var_trace"] / out["independent"]["var_trace"]
    )
    return out


def main():
    result = {"config": {"N": N, "D": D, "P": P, "epochs": EPOCHS}}
    result["gradient_variance"] = grad_variance()
    print(json.dumps(result["gradient_variance"], indent=2), flush=True)
    result["independent"] = converged_loss(False)
    print("independent:", result["independent"], flush=True)
    result["broadcast"] = converged_loss(True)
    print("broadcast:", result["broadcast"], flush=True)
    path = os.path.join(os.path.dirname(__file__), "..", "docs",
                        "aux_broadcast_parity.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=2)
    print("wrote", os.path.abspath(path))


if __name__ == "__main__":
    main()
