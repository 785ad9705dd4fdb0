#!/usr/bin/env python3
"""PoissonAutoencoder step-composition ablation (TPU, interleaved).

docs/model_bench.json: the autoencoder is the slowest family by ~8x
(115.5 ms/step at D=2000 vs ~15 ms for the factorizers at D=20000).
Its step differs structurally: O(D^2) dense weight matrices (two
2000x2000 layers = 8.1M params), elementwise exact-E1 horseshoe prior
log-probs over every weight sample, and 8.1M-param surrogate sampling
per ELBO draw. This script decomposes the step into interleaved arms to
find where the 115 ms goes:

  full          sample -> prior + likelihood -> grad -> adam (the bench step)
  fwd           forward loss only (no grad, no adam)
  no-prior      grad step with the weight-prior log-probs dropped
  no-like       grad step with the likelihood dropped (prior + sampling only)
  sample-only   surrogate sample_and_log_prob + grad of sum (RNG + logq cost)

Same interleaved-rounds methodology as benchmarks/model_suite.py (the
tunnel has ambient drift + first-config warmup bias).

    python benchmarks/autoencoder_ablation.py [--d 2000] [--batch 1024]
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
    model = PoissonAutoencoder(
        {"counts": X, "indices": np.arange(args.batch)},
        latent_dim=args.p, dtype="float32",
    )
    sur = model._surrogate
    opt = optax.chain(optax.clip(5.0), optax.adam(0.01))
    x_dev = jnp.asarray(X)

    def make_loss(mode):
        def loss_fn(p, key):
            samples, logq = sur.sample_and_log_prob(p, key, (S,))
            if mode == "sample-only":
                tot = sum(jnp.sum(v) for v in jax.tree_util.tree_leaves(samples))
                return tot * 0.0 - jnp.mean(logq) / args.batch
            parts = {}
            if mode != "no-prior":
                parts = model.joint_prior.log_prob_parts(samples)
            if mode != "no-like":
                ll = model.log_likelihood_components(
                    {"counts": x_dev}, **samples)["log_likelihood"]
                parts["x"] = jnp.sum(ll, axis=(-1, -2))
            lp = sum(parts.values())
            return -jnp.mean(lp - logq) / args.batch
        return loss_fn

    arms = {}
    for mode in ("full", "fwd", "no-prior", "no-like", "sample-only"):
        loss_fn = make_loss("full" if mode == "fwd" else mode)
        if mode == "fwd":
            # CAVEAT (r3 advisor): this arm never updates params, so it
            # times the forward at frozen init operands while the other
            # arms walk toward convergence — the decomposition is coarse;
            # re-measure at the 'full' arm's evolving params if precision
            # matters
            @jax.jit
            def step(p, o, key, _f=loss_fn):
                return p, o, _f(p, key)
        else:
            @jax.jit
            def step(p, o, key, _f=loss_fn):
                loss, g = jax.value_and_grad(_f)(p, key)
                u, o2 = opt.update(g, o, p)
                return optax.apply_updates(p, u), o2, loss
        arms[mode] = dict(step=step, p=model.surrogate_params,
                          o=opt.init(model.surrogate_params), times=[])

    from _interleave import run_interleaved_arms

    result = {"config": dict(D=args.d, B=args.batch, P=args.p, S=S)}
    result.update(run_interleaved_arms(arms, jax.random.PRNGKey(0),
                                       args.iters, label_width=12))
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
