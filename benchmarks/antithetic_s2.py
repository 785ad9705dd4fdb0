"""S=2 antithetic follow-up: can a SINGLE mirrored pair carry training?

docs/antithetic_experiment.json showed S=4 antithetic matches the S=8
independent estimator's convergence (15 epochs to the reference 40.52)
with equal-or-lower gradient variance. The pairing argument predicts one
more halving: S=2 antithetic should sit near S=4 independent variance
(~2x S8_ind at init), and S=4 independent ALSO converged (16 epochs).
If S=2 antithetic converges to the reference optimum, the production
likelihood sweep (76% of the step at the bench headline shape) halves
again. This script measures, on the same reference noise config:

1. convergence (final/best loss, epochs-to-40.52) for S=2 antithetic and
   S=2 independent (control), seeds 3 and 4, and
2. gradient variance for the S=2 arms at the init and S8-converged
   points, appended next to the existing S8/S4 numbers.

Writes docs/antithetic_s2.json. CPU host (~15-25 min):
    python benchmarks/antithetic_s2.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from antithetic_experiment import build, converged  # noqa: E402


def main():
    result = {"config": {"N": 50_000, "D": 30, "P": 4, "batch": 1000,
                         "lr": 0.05}}
    arms = {}
    converged_params = None
    for S, anti, seed in ((2, True, 3), (2, True, 4), (2, False, 3),
                          (8, False, 3)):
        name = f"S{S}_{'anti' if anti else 'ind'}_seed{seed}"
        arms[name], params = converged(S, anti, seed=seed)
        print(name, arms[name], flush=True)
        if name == "S8_ind_seed3":
            converged_params = params
    result["convergence"] = arms

    m, _, _ = build()
    points = {"init": m.surrogate_params}
    if converged_params is not None:
        points["converged_S8_ind"] = converged_params
    # antithetic_experiment.grad_variance hard-codes S in (8, 4); measure
    # the S=2 arms directly here with the same protocol (48 seeds).
    import jax
    import jax.numpy as jnp
    import numpy as np

    m2, _, X = build()
    batch = {"counts": jnp.asarray(X[:1000], jnp.float64),
             "indices": jnp.arange(1000)}
    sur = m2._surrogate
    gv = {}
    for point, params in points.items():
        gv[point] = {}
        for S, anti in ((2, True), (2, False), (8, False)):
            def loss_fn(p, key):
                samples, logq = sur.sample_and_log_prob(
                    p, key, (S,), antithetic=anti)
                lp = m2.unormalized_log_prob(data=batch, **samples)
                return -jnp.mean(lp - logq) / 1000.0

            gfn = jax.jit(jax.grad(loss_fn))
            grads = [gfn(params, jax.random.PRNGKey(1000 + i))
                     for i in range(48)]
            flat = np.stack([
                np.concatenate([np.asarray(x).ravel()
                                for x in jax.tree_util.tree_leaves(g)])
                for g in grads
            ])
            gv[point][f"S{S}_{'anti' if anti else 'ind'}"] = {
                "mean_grad_norm": float(np.linalg.norm(flat.mean(0))),
                "var_trace": float(flat.var(0).sum()),
            }
        ref = gv[point]["S8_ind"]["var_trace"]
        gv[point]["var_ratio_vs_S8_ind"] = {
            k: v["var_trace"] / ref
            for k, v in gv[point].items() if isinstance(v, dict)
        }
        print(point, json.dumps(gv[point]["var_ratio_vs_S8_ind"]),
              flush=True)
    result["gradient_variance"] = gv

    path = os.path.join(os.path.dirname(__file__), "..", "docs",
                        "antithetic_s2.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=2)
    print("wrote", os.path.abspath(path))


if __name__ == "__main__":
    main()
