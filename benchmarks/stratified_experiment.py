"""Stratified-pair antithetic draws (VERDICT r4 #2): can RQMC close the
S=2 frontier arm's variance gap, and what does it buy at S=4?

Structure of the question: antithetic couples WITHIN a pair (u, 1-u) —
for S=2 there is exactly one pair, so every intra-step coupling degree of
freedom is already spent; RQMC/stratification can only couple ACROSS
pairs (S>=4: pair p draws u_p = frac(u0 + p/H), ops.gamma.lattice_uniform).
The S=2 gradient variance is therefore the even-residual variance of one
mirrored pair — an estimator-structure floor, not a sampling
inefficiency. This script measures that floor directly (S2_strat must
equal S2_anti up to seed noise) and quantifies what stratification buys
where it CAN act (S4_strat vs S4_anti vs S8_ind), plus convergence of
S4_strat on the reference parity config.

Writes docs/stratified_experiment.json. CPU host (~20 min):
    python benchmarks/stratified_experiment.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from antithetic_experiment import PARITY_TARGET, build, converged  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    result = {"config": {"N": 50_000, "D": 30, "P": 4, "batch": 1000,
                         "lr": 0.05},
              "parity_target": PARITY_TARGET}

    # convergence: does S4-stratified reach the reference optimum like
    # S4-anti / S8-ind do (15 epochs, docs/antithetic_experiment.json)?
    conv = {}
    converged_params = None
    for S, anti, seed in ((4, "stratified", 3), (4, "stratified", 4),
                          (8, False, 3)):
        name = f"S{S}_{anti if isinstance(anti, str) else ('anti' if anti else 'ind')}_seed{seed}"
        conv[name], params = converged(S, anti, seed=seed)
        print(name, conv[name], flush=True)
        if name == "S8_ind_seed3":
            converged_params = params
    result["convergence"] = conv

    m, _, X = build()
    points = {"init": m.surrogate_params}
    if converged_params is not None:
        points["converged_S8_ind"] = converged_params

    m2, _, X = build()
    batch = {"counts": jnp.asarray(X[:1000], jnp.float64),
             "indices": jnp.arange(1000)}
    sur = m2._surrogate
    gv = {}
    ARMS = ((8, False), (4, True), (4, "stratified"), (2, True),
            (2, "stratified"))
    for point, params in points.items():
        gv[point] = {}
        for S, anti in ARMS:
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
            name = f"S{S}_{anti if isinstance(anti, str) else ('anti' if anti else 'ind')}"
            gv[point][name] = {
                "mean_grad_norm": float(np.linalg.norm(flat.mean(0))),
                "var_trace": float(flat.var(0).sum()),
            }
            print(point, name, gv[point][name], flush=True)
        ref = gv[point]["S8_ind"]["var_trace"]
        gv[point]["var_ratio_vs_S8_ind"] = {
            k: round(v["var_trace"] / ref, 4)
            for k, v in gv[point].items() if isinstance(v, dict)
        }
        print(point, gv[point]["var_ratio_vs_S8_ind"], flush=True)
    result["grad_variance"] = gv

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                        "docs", "stratified_experiment.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=2)
    print("wrote", os.path.abspath(path))


if __name__ == "__main__":
    main()
