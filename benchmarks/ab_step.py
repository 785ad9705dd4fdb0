#!/usr/bin/env python3
"""Same-process A/B harness for training-step configurations.

The TPU tunnel shows ~1.7x ambient run-to-run variance (docs/ROADMAP.md), so
perf comparisons are only trustworthy within one process. Usage:

    python benchmarks/ab_step.py                       # default matrix
    python benchmarks/ab_step.py --configs fused,xla   # named subset

Named configs: xla, fused, exact-gamma, no-remat, aux-broadcast.
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

S, B, D, P = 8, 1024, 20000, 32

CONFIGS = {
    "fused": dict(fused_likelihood=True, gamma_sampler="fast"),
    "xla": dict(fused_likelihood=False, gamma_sampler="fast"),
    "exact-gamma": dict(fused_likelihood=True, gamma_sampler="exact"),
    "no-remat": dict(fused_likelihood=True, gamma_sampler="fast", remat=False),
    "aux-broadcast": dict(fused_likelihood=True, gamma_sampler="fast",
                          aux_broadcast=True),
    "fused-ig": dict(fused_likelihood=True, gamma_sampler="fused",
                     remat=False),
    "fused-ig-bcast": dict(fused_likelihood=True, gamma_sampler="fused",
                           aux_broadcast=True, remat=False),
    "fused-ig-xn": dict(fused_likelihood=True, gamma_sampler="fused",
                        remat=False, fused_normals=False),
    # antithetic estimator arms: samples= overrides the global S for the
    # config (S=4 antithetic aims to match S=8 independent convergence at
    # ~half the per-step likelihood cost — docs/antithetic_experiment.json)
    "anti-s4": dict(fused_likelihood=True, gamma_sampler="fused",
                    remat=False, antithetic=True, samples=4),
    "anti-s8": dict(fused_likelihood=True, gamma_sampler="fused",
                    remat=False, antithetic=True, samples=8),
    "anti-s4-fast": dict(fused_likelihood=True, gamma_sampler="fast",
                         remat=False, antithetic=True, samples=4),
    "fused-ig-s4": dict(fused_likelihood=True, gamma_sampler="fused",
                        remat=False, samples=4),
    # hardware-PRNG arms: same estimator as anti-s4 but the step key is
    # re-wrapped as an rbg/unsafe_rbg typed key, so every in-step draw
    # (the flattened normal, the IG kernel seed) uses the TPU hardware RNG
    # instead of threefry (benchmarks/prng_probe.py isolates the raw
    # bit-generation delta; this measures it in the real step)
    "anti-s4-rbg": dict(fused_likelihood=True, gamma_sampler="fused",
                        remat=False, antithetic=True, samples=4,
                        prng_impl="rbg"),
    "anti-s4-urbg": dict(fused_likelihood=True, gamma_sampler="fused",
                         remat=False, antithetic=True, samples=4,
                         prng_impl="unsafe_rbg"),
    "anti-s4-static": dict(fused_likelihood=True, gamma_sampler="fused",
                           remat=False, antithetic=True, samples=4,
                           likelihood_clip="static"),
    # single mirrored pair: the next halving of the likelihood sweep —
    # convergence quality measured by benchmarks/antithetic_s2.py
    "anti-s2-static": dict(fused_likelihood=True, gamma_sampler="fused",
                           remat=False, antithetic=True, samples=2,
                           likelihood_clip="static"),
    "anti-s4-static-rbg": dict(fused_likelihood=True, gamma_sampler="fused",
                               remat=False, antithetic=True, samples=4,
                               likelihood_clip="static", prng_impl="rbg"),
}


def build(name, cfg, X):
    import jax
    import jax.numpy as jnp
    import optax

    from spmf_tpu import PoissonFactorization

    remat = cfg.pop("remat", True)
    fused_normals = cfg.pop("fused_normals", True)
    antithetic = cfg.pop("antithetic", False)
    s_cfg = cfg.pop("samples", S)
    prng_impl = cfg.pop("prng_impl", None)
    model = PoissonFactorization(
        latent_dim=P, feature_dim=D, u_tau_scale=1.0 / np.sqrt(50000 * D),
        dtype="float32", scale_columns=False, **cfg,
    )
    model._surrogate.fused_normals = fused_normals
    sur = model._surrogate
    opt = optax.chain(optax.clip(5.0), optax.adam(0.01))
    o = opt.init(model.surrogate_params)

    draw = lambda p, k: sur.sample_and_log_prob(p, k, (s_cfg,),
                                                antithetic=antithetic)
    if remat:
        draw = jax.checkpoint(draw, policy=jax.checkpoint_policies.nothing_saveable)

    @jax.jit
    def step(p, o, key, x):
        if prng_impl is not None:
            # the harness hands a raw threefry PRNGKey; re-wrap its data as
            # a typed hardware-RNG key so every downstream draw uses it
            key = jax.random.wrap_key_data(
                jnp.concatenate([key, key]), impl=prng_impl)

        def f(p_):
            s, lq = draw(p_, key)
            lp = model.unormalized_log_prob(data={"counts": x}, **s)
            return -jnp.mean(lp - lq) / B

        loss, g = jax.value_and_grad(f)(p)
        u, o2 = opt.update(g, o, p)
        return optax.apply_updates(p, u), o2, loss

    return {"step": step, "p": model.surrogate_params, "o": o, "name": name}


def run_interleaved(states, X, iters=30, rounds=6):
    """Alternate configs in short rounds to neutralize the tunnel's slow
    ambient drift AND its first-config warmup penalty; report the per-config
    median round."""
    import jax

    per_round = max(iters // rounds, 3)
    k = jax.random.PRNGKey(0)
    # compile + global warmup (the first ~1 round after connect is slower)
    for st in states:
        st["times"] = []
        st["p"], st["o"], st["l"] = st["step"](st["p"], st["o"], k, X)
    for st in states:
        for i in range(per_round):
            st["p"], st["o"], st["l"] = st["step"](
                st["p"], st["o"], jax.random.fold_in(k, i), X)
        jax.block_until_ready(st["p"])
    for r in range(rounds):
        for st in states:
            t0 = time.perf_counter()
            for i in range(per_round):
                st["p"], st["o"], st["l"] = st["step"](
                    st["p"], st["o"], jax.random.fold_in(k, r * 1000 + i), X)
            jax.block_until_ready(st["p"])
            st["times"].append((time.perf_counter() - t0) / per_round)
    for st in states:
        dt = float(np.median(st["times"]))
        spread = (max(st["times"]) - min(st["times"])) / dt
        print(f"{st['name']:>14s}: {dt*1000:7.1f} ms/step  {B/dt:9.0f} "
              f"rows/sec  loss={float(st['l']):.4g}  "
              f"(median of {len(st['times'])} rounds, spread {spread:.0%})")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/spmf_tpu_jax_cache")
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="xla,fused,no-remat")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--samples", type=int, default=None)
    args = ap.parse_args()

    global B, S
    if args.batch:
        B = args.batch
    if args.samples:
        S = args.samples
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.poisson(1.0, (B, D)), jnp.float32)
    print(f"# B={B} S={S} D={D} P={P}")
    states = [build(name, dict(CONFIGS[name]), X)
              for name in args.configs.split(",")]
    run_interleaved(states, X, args.iters)


if __name__ == "__main__":
    main()
