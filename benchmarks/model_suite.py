"""Throughput across the model families (VERDICT r1 weak #8).

bench.py reports the single headline line the driver tracks; this suite
records rows/sec for every model family at the same D=20k scale, plus the
sparse COO path, in one process (tunnel variance). Writes
docs/model_bench.json.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import optax

jax.config.update("jax_compilation_cache_dir", "/tmp/spmf_tpu_jax_cache")

import spmf_tpu
from spmf_tpu import (
    BernoulliFactorization,
    GaussianFactorization,
    MixedFactorization,
    PoissonAutoencoder,
    PoissonFactorization,
)

S, B, D, P = 8, 1024, 20000, 32
# the autoencoder's [D, D, K, D, D] dense stack is O(D^2) parameters —
# 20k would be 2x 400M-param layers; benched at its own production-plausible
# width instead
D_AE = 2000
ITERS = 25


def make_step(model):
    sur = model._surrogate
    opt = optax.chain(optax.clip(5.0), optax.adam(0.01))

    @jax.jit
    def step(p, o, key, x):
        def f(p_):
            s, lq = sur.sample_and_log_prob(p_, key, (S,))
            lp = model.unormalized_log_prob(data={"counts": x}, **s)
            return -jnp.mean(lp - lq) / B

        loss, g = jax.value_and_grad(f)(p)
        u, o2 = opt.update(g, o, p)
        return optax.apply_updates(p, u), o2, loss

    return step, opt.init(model.surrogate_params)


def main():
    rng = np.random.default_rng(0)
    Xp = jnp.asarray(rng.poisson(1.0, (B, D)), jnp.float32)
    Xb = jnp.asarray((rng.random((B, D)) < 0.3), jnp.float32)
    kw = dict(latent_dim=P, feature_dim=D,
              u_tau_scale=1.0 / np.sqrt(50000 * D), dtype="float32",
              scale_columns=False)
    states = []
    for name, model, X in (
        ("poisson", PoissonFactorization(**kw), Xp),
        ("bernoulli", BernoulliFactorization(**kw), Xb),
        ("gaussian", GaussianFactorization(**kw), Xp),
        ("gaussian_normal_obs",
         GaussianFactorization(observation_model="normal", **kw), Xp),
        ("mixed", MixedFactorization(
            column_types=["poisson"] * (D // 2) + ["bernoulli"] * (D - D // 2),
            **kw), Xp),
        ("autoencoder", PoissonAutoencoder(
            {"counts": np.asarray(Xp[:, :D_AE]), "indices": np.arange(B)},
            latent_dim=P, dtype="float32"), Xp[:, :D_AE]),
    ):
        step, o = make_step(model)
        states.append(dict(name=name, step=step, X=X,
                           p=model.surrogate_params, o=o, times=[]))

    # interleaved rounds (the tunnel has a first-config warmup bias AND
    # ambient drift — same methodology as benchmarks/step_ablation.py)
    k = jax.random.PRNGKey(0)
    per_round, rounds = max(ITERS // 5, 3), 5
    for st in states:  # compile + warmup round
        for i in range(per_round):
            st["p"], st["o"], st["l"] = st["step"](
                st["p"], st["o"], jax.random.fold_in(k, i), st["X"])
        jax.block_until_ready(st["p"])
    for r in range(rounds):
        for st in states:
            t0 = time.perf_counter()
            for i in range(per_round):
                st["p"], st["o"], st["l"] = st["step"](
                    st["p"], st["o"], jax.random.fold_in(k, r * 97 + i),
                    st["X"])
            jax.block_until_ready(st["p"])
            st["times"].append((time.perf_counter() - t0) / per_round)

    out = {}
    for st in states:
        assert np.isfinite(float(st["l"])), (st["name"], float(st["l"]))
        dt = float(np.median(st["times"]))
        rows, ms = B / dt, dt * 1000
        out[st["name"]] = {"rows_per_sec": round(rows, 1),
                           "ms_per_step": round(ms, 2)}
        print(f"{st['name']:>20s}: {ms:7.1f} ms/step {rows:9.0f} rows/sec",
              flush=True)

    path = os.path.join(os.path.dirname(__file__), "..", "docs",
                        "model_bench.json")
    with open(path, "w") as f:
        json.dump({"config": dict(S=S, B=B, D=D, P=P), "models": out}, f,
                  indent=2)
    print("wrote", os.path.abspath(path))


if __name__ == "__main__":
    main()
