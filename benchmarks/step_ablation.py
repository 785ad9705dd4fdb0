"""Same-process ablation of the training-step composition at D=20k.

Times jitted variants of the fused-IG step with parts of the energy removed,
to locate the next optimization target (tunnel variance makes cross-process
numbers useless; everything here shares one process):

  full           : sample + logq + prior parts + z prior + fused likelihood
  no-likelihood  : drop the fused Poisson likelihood ('x' part)
  no-priors      : drop the joint prior log_prob_parts (keep z + likelihood)
  no-z           : drop the theta prior
  sampling-only  : surrogate sample_and_log_prob + grad of logq only
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import optax

jax.config.update("jax_compilation_cache_dir", "/tmp/spmf_tpu_jax_cache")

from spmf_tpu import PoissonFactorization

S, B, D, P = 8, 1024, 20000, 32


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--gamma", default="fused")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--samples", type=int, default=None)
    ap.add_argument("--antithetic", action="store_true")
    ap.add_argument("--clip", default="reference",
                    choices=["reference", "static"])
    args = ap.parse_args()

    global B, S
    if args.batch:
        B = args.batch
    if args.samples:
        S = args.samples
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.poisson(1.0, (B, D)), jnp.float32)
    model = PoissonFactorization(
        latent_dim=P, feature_dim=D, u_tau_scale=1.0 / np.sqrt(50000 * D),
        dtype="float32", scale_columns=False, fused_likelihood=True,
        gamma_sampler=args.gamma, likelihood_clip=args.clip,
    )
    sur = model._surrogate
    opt = optax.chain(optax.clip(5.0), optax.adam(0.01))

    def energy(batch, samples, mode):
        parts = model.unormalized_log_prob_parts(batch, **samples)
        keep = dict(parts)
        if mode == "no-likelihood":
            keep.pop("x")
        elif mode == "no-priors":
            keep = {k: v for k, v in keep.items() if k in ("x", "z")}
        elif mode == "no-z":
            keep.pop("z")
        out = 0.0
        for v in keep.values():
            out = out + v
        return out

    def make_step(mode):
        def step(p, o, key, x):
            def f(p_):
                s, lq = sur.sample_and_log_prob(
                    p_, key, (S,), antithetic=args.antithetic)
                if mode == "sampling-only":
                    return jnp.mean(lq) / B
                lp = energy({"counts": x}, s, mode)
                return -jnp.mean(lp - lq) / B

            loss, g = jax.value_and_grad(f)(p)
            u, o2 = opt.update(g, o, p)
            return optax.apply_updates(p, u), o2, loss

        return jax.jit(step)

    modes = os.environ.get(
        "ABLATION_MODES",
        "full,no-likelihood,no-priors,no-z,sampling-only").split(",")
    k = jax.random.PRNGKey(0)
    states = []
    for mode in modes:
        step = make_step(mode)
        o = opt.init(model.surrogate_params)
        p, o2, l = step(model.surrogate_params, o, k, X)
        jax.block_until_ready(p)
        states.append({"mode": mode, "step": step, "p": p, "o": o2,
                       "l": l, "times": []})
    per_round, rounds = max(args.iters // 6, 3), 6
    for st in states:  # warmup round (first-config penalty)
        for i in range(per_round):
            st["p"], st["o"], st["l"] = st["step"](
                st["p"], st["o"], jax.random.fold_in(k, i), X)
        jax.block_until_ready(st["p"])
    for r in range(rounds):
        for st in states:
            t0 = time.perf_counter()
            for i in range(per_round):
                st["p"], st["o"], st["l"] = st["step"](
                    st["p"], st["o"], jax.random.fold_in(k, r * 97 + i), X)
            jax.block_until_ready(st["p"])
            st["times"].append((time.perf_counter() - t0) / per_round)
    for st in states:
        dt = float(np.median(st["times"]))
        print(f"{st['mode']:>14s}: {dt*1000:7.2f} ms/step  "
              f"loss={float(st['l']):.4g}  (median of {rounds})", flush=True)


if __name__ == "__main__":
    main()
