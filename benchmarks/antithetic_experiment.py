"""Measure ``fit(antithetic=True)``: gradient variance and convergence.

The training step is dominated by the per-sample likelihood sweep (S=8
ELBO samples cost ~76% of the step at the bench headline shape —
docs/ROADMAP.md step composition), so the remaining macro throughput
lever is the ESTIMATOR: if mirrored-pair sampling lets S=4 match the
S=8 independent estimator's convergence, the production step nearly
halves. This script measures, on the reference noise config
(notebooks/factorizing_random_noise: N=50k, D=30, P=4, batch 1000,
lr .05, f64, CPU):

1. elementwise gradient variance across seeds for
   {S=8, S=4} x {independent, antithetic}, at the init point AND at a
   converged point (the STL experiment showed variance rankings can
   flip between operating points), and
2. converged loss + epochs (rel_tol=1e-4 stop) + epochs-to-40.52
   (the reference's recorded converged loss) per arm.

Writes docs/antithetic_experiment.json. Run on the 1-core CPU host
(~20-30 min): python benchmarks/antithetic_experiment.py
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
EPOCHS = int(os.environ.get("ANTI_EPOCHS", "80"))
PARITY_TARGET = 40.52  # reference converged avg-batch loss


def build():
    rng = np.random.default_rng(0)
    X = rng.poisson(1.0, size=(N, D))
    data = ArrayDataset({"counts": X, "indices": np.arange(N)}).batch(1000)
    m = PoissonFactorization(
        latent_dim=P, feature_dim=D, u_tau_scale=1 / np.sqrt(N * D),
        dtype="float64", data=data, gamma_sampler="fast",
    )
    return m, data, X


def converged(sample_size, antithetic, seed=3):
    m, data, _ = build()
    t0 = time.perf_counter()
    losses = m.calibrate_advi(
        num_steps=EPOCHS, learning_rate=0.05, rel_tol=1e-4, clip_value=5.0,
        sample_size=sample_size, seed=seed, verbose=False,
        antithetic=antithetic,
    )
    arr = np.asarray(losses, float)
    crossed = np.nonzero(arr <= PARITY_TARGET)[0]
    return {
        "final_loss": float(arr[-1]),
        "best_loss": float(np.nanmin(arr)),
        "epochs": len(arr) - 1,
        "epochs_to_40.52": int(crossed[0]) if crossed.size else None,
        "seconds": time.perf_counter() - t0,
    }, m.surrogate_params


def grad_variance(params_by_point, n_seeds=48):
    """var-trace of the per-row ELBO gradient across seeds for each
    (S, antithetic) arm, at each parameter point."""
    m, _, X = build()
    batch = {"counts": jnp.asarray(X[:1000], jnp.float64),
             "indices": jnp.arange(1000)}
    sur = m._surrogate
    out = {}
    for point, params in params_by_point.items():
        out[point] = {}
        for S in (8, 4):
            for anti in (False, True):
                def loss_fn(p, key):
                    samples, logq = sur.sample_and_log_prob(
                        p, key, (S,), antithetic=anti)
                    lp = m.unormalized_log_prob(data=batch, **samples)
                    return -jnp.mean(lp - logq) / 1000.0

                gfn = jax.jit(jax.grad(loss_fn))
                grads = [gfn(params, jax.random.PRNGKey(1000 + i))
                         for i in range(n_seeds)]
                flat = np.stack([
                    np.concatenate([np.asarray(x).ravel()
                                    for x in jax.tree_util.tree_leaves(g)])
                    for g in grads
                ])
                out[point][f"S{S}_{'anti' if anti else 'ind'}"] = {
                    "mean_grad_norm": float(np.linalg.norm(flat.mean(0))),
                    "var_trace": float(flat.var(0).sum()),
                }
        ref = out[point]["S8_ind"]["var_trace"]
        out[point]["var_ratio_vs_S8_ind"] = {
            k: v["var_trace"] / ref
            for k, v in out[point].items() if isinstance(v, dict)
        }
    return out


def main():
    result = {"config": {"N": N, "D": D, "P": P, "epochs": EPOCHS,
                         "batch": 1000, "lr": 0.05}}
    arms = {}
    converged_params = None
    for S, anti in ((8, False), (8, True), (4, False), (4, True)):
        name = f"S{S}_{'anti' if anti else 'ind'}"
        arms[name], params = converged(S, anti)
        print(name, arms[name], flush=True)
        if name == "S8_ind":
            converged_params = params
    result["convergence"] = arms

    m, _, _ = build()
    points = {"init": m.surrogate_params}
    if converged_params is not None:
        points["converged_S8_ind"] = converged_params
    result["gradient_variance"] = grad_variance(points)
    print(json.dumps(result["gradient_variance"], indent=2), flush=True)

    path = os.path.join(os.path.dirname(__file__), "..", "docs",
                        "antithetic_experiment.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=2)
    print("wrote", os.path.abspath(path))


if __name__ == "__main__":
    main()
