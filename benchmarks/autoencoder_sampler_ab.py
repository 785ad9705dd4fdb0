#!/usr/bin/env python3
"""A/B: XLA threefry sampling vs the fused-normal Pallas kernel for the
PoissonAutoencoder surrogate (TPU, interleaved).

Post-exp1, the autoencoder step is dominated by surrogate sampling+logq
(~26 of 35 ms at D=2000, B=1024, S=8 — docs/autoencoder_ablation.json):
8.1M mean-field-normal weights x S draws that MUST materialize (they feed
the network matmuls). That is the opposite regime from the factorizer
models, where the fused-normal kernel measured 4% SLOWER because XLA fused
threefry+erfinv into consumers without materializing (ops/fused_normal.py
docstring). This script measures whether in-kernel hardware RNG wins when
materialization is unavoidable.

Arms (interleaved rounds, same process — tunnel drift):
  xla      default `_sample_normals` (threefry + erfinv via random.normal)
  fused    `surrogate.fused_normals = True` (+ gamma_sampler='fused' to
           pass the gate; no IG surrogates so it is otherwise inert)
  anti-s4  S=4 antithetic (mirrored eps pairs) — halves BOTH the sampled
           weight materialization and the S-scaled network matmuls at the
           measured-equal estimator quality of the factorizer study
           (docs/antithetic_experiment.json)

Measured (D=2000, B=1024 — docs/autoencoder_sampler_ab.json):
xla 34.4 / fused 44.3 / anti-s4 24.4 ms/step. Two negatives:
- The fused-normal kernel LOSES here too — the RNG-replay VJP recompute
  plus the flatten/concat/reshape of 8.1M params outweigh the threefry
  saving even when samples must materialize.
- anti-s4 is 1.41x faster BUT the gradient-variance probe shows the
  factorizer's S4==S8 equivalence does NOT transfer: at the symmetric
  init the mirrored pairs cancel nearly ALL gradient noise (ratio ~0 —
  the loss is almost even in eps at loc=0), yet after 200 warm steps the
  ratio is 1.50, i.e. variance x time is a wash (1.50 x 24.4 vs 34.4).
  Antithetic stays opt-in and is NOT recommended for this family.

    python benchmarks/autoencoder_sampler_ab.py [--d 2000] [--batch 1024]
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

S = 8


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--d", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--p", type=int, default=32)
    ap.add_argument("--iters", type=int, default=25)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir", "/tmp/spmf_tpu_jax_cache")

    from spmf_tpu.models.autoencoder import PoissonAutoencoder

    rng = np.random.default_rng(0)
    X = rng.poisson(1.0, size=(args.batch, args.d)).astype(np.float32)
    x_dev = jnp.asarray(X)
    opt = optax.chain(optax.clip(5.0), optax.adam(0.01))

    def make_arm(fused=False, s=S, antithetic=False, pervar_logq=False):
        model = PoissonAutoencoder(
            {"counts": X, "indices": np.arange(args.batch)},
            latent_dim=args.p, dtype="float32",
        )
        sur = model._surrogate
        if fused:
            sur.gamma_sampler = "fused"
            sur.fused_normals = True

        def loss_fn(p, key):
            # pervar_logq: forces the pre-r5 per-variable Normal.log_prob
            # route by passing the LIVE params as logq_params (identical
            # math + gradients — vi/surrogates.py eps-form docstring; the
            # eps_logq fast path requires logq_params is None)
            samples, logq = sur.sample_and_log_prob(
                p, key, (s,), antithetic=antithetic,
                logq_params=p if pervar_logq else None)
            lp = model.unormalized_log_prob(data={"counts": x_dev}, **samples)
            return -jnp.mean(lp - logq) / args.batch

        @jax.jit
        def step(p, o, key):
            loss, g = jax.value_and_grad(loss_fn)(p, key)
            u, o2 = opt.update(g, o, p)
            return optax.apply_updates(p, u), o2, loss

        return dict(step=step, p=model.surrogate_params,
                    o=opt.init(model.surrogate_params),
                    samples=s, antithetic=antithetic)

    arms = {
        "xla": make_arm(),
        "pervar-logq": make_arm(pervar_logq=True),
        "fused": make_arm(fused=True),
        "anti-s4": make_arm(s=4, antithetic=True),
        # r5: lattice-stratified pairs (ops.gamma.lattice_uniform) — same
        # step cost as anti-s4, strictly better cross-pair coupling; the
        # question is whether it closes the 1.50x warm variance gap
        "strat-s4": make_arm(s=4, antithetic="stratified"),
    }

    from _interleave import run_interleaved_arms

    k = jax.random.PRNGKey(0)
    result = {"config": dict(D=args.d, B=args.batch, P=args.p)}
    result.update(run_interleaved_arms(arms, k, args.iters))
    # per-arm estimator config (the arms do NOT share a sample count —
    # anti-s4's loss scale is an S=4 estimator, not a convergence delta)
    for name, st in arms.items():
        result[name]["samples"] = st["samples"]
        result[name]["antithetic"] = st["antithetic"]

    # ----- estimator quality: per-leaf gradient variance at two operating
    # points (init, and after 200 warm steps of the xla arm) — the
    # factorizer's S4-antithetic == S8-independent equivalence
    # (docs/antithetic_experiment.json) must be re-established per model.
    model = PoissonAutoencoder(
        {"counts": X, "indices": np.arange(args.batch)},
        latent_dim=args.p, dtype="float32",
    )
    sur = model._surrogate

    def make_grad(s, antithetic):
        def loss_fn(p, key):
            samples, logq = sur.sample_and_log_prob(
                p, key, (s,), antithetic=antithetic)
            lp = model.unormalized_log_prob(data={"counts": x_dev}, **samples)
            return -jnp.mean(lp - logq) / args.batch

        return jax.jit(jax.grad(loss_fn))

    grads = {"s8": make_grad(S, False), "anti-s4": make_grad(4, True),
             "strat-s4": make_grad(4, "stratified")}

    @jax.jit
    def warm_step(p, o, key):
        def loss_fn(p_):
            samples, logq = sur.sample_and_log_prob(p_, key, (S,))
            lp = model.unormalized_log_prob(data={"counts": x_dev}, **samples)
            return -jnp.mean(lp - logq) / args.batch
        loss, g = jax.value_and_grad(loss_fn)(p)
        u, o2 = opt.update(g, o, p)
        return optax.apply_updates(p, u), o2

    points = {"init": model.surrogate_params}
    p, o = model.surrogate_params, opt.init(model.surrogate_params)
    for i in range(200):
        p, o = warm_step(p, o, jax.random.fold_in(k, 10_000 + i))
    points["warm200"] = p

    n_keys = 24
    result["grad_var_ratio"] = {}
    for pt_name, pt in points.items():
        var = {}
        for arm, gfn in grads.items():
            gs = [gfn(pt, jax.random.fold_in(k, 20_000 + 37 * i))
                  for i in range(n_keys)]
            flat = [
                np.concatenate([np.asarray(l).ravel()
                                for l in jax.tree_util.tree_leaves(g)])
                for g in gs
            ]
            var[arm] = float(np.stack(flat).var(axis=0).mean())
        result["grad_var_ratio"][pt_name] = {
            arm: round(var[arm] / var["s8"], 4) for arm in var
        }
        print(f"grad-var ratios vs s8 @ {pt_name}: "
              f"{result['grad_var_ratio'][pt_name]}", flush=True)

    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
