#!/usr/bin/env python3
"""Interleaved A/B: flat-gather COO energy vs dense-scatter + fused MXU.

The r4 flat-gather rewrite (docs/gather_probe.json) made the COO energy
3-4x faster, and the sequential sparse_bench now shows it BEATING the
dense-scatter path at 0.1% density (119k vs 100k rows/sec). Sequential
arms drift up to 2x through the tunnel (CLAUDE.md), so this harness
interleaves jitted train steps of both energies at several densities to
locate the real crossover — the input to any density-aware auto default.

Usage: python benchmarks/sparse_ab.py [--densities 0.001,0.005,0.01]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

B, D, P, S = 8192, 50000, 16, 8


def build(name, X_batch, scatter):
    import jax
    import jax.numpy as jnp
    import optax

    from spmf_tpu import PoissonFactorization

    model = PoissonFactorization(
        latent_dim=P, feature_dim=D, u_tau_scale=1.0 / np.sqrt(100000 * D),
        dtype="float32", scale_rows=False, sparse_dense_scatter=scatter,
    )
    sur = model._surrogate
    opt = optax.chain(optax.clip(5.0), optax.adam(0.01))
    o = opt.init(model.surrogate_params)

    draw = jax.checkpoint(
        lambda p, k: sur.sample_and_log_prob(p, k, (S,)),
        policy=jax.checkpoint_policies.nothing_saveable)

    @jax.jit
    def step(p, o, key, batch):
        def f(p_):
            s, lq = draw(p_, key)
            lp = model.unormalized_log_prob(data=batch, **s)
            return -jnp.mean(lp - lq) / B

        loss, g = jax.value_and_grad(f)(p)
        u, o2 = opt.update(g, o, p)
        return optax.apply_updates(p, u), o2, loss

    return {"step": step, "p": model.surrogate_params, "o": o,
            "name": name, "batch": X_batch}


def coo_batch(density, rng):
    nnz = int(B * D * density)
    pad = int(-(-nnz // 1024) * 1024)
    rows = np.zeros(pad, np.int32)
    cols = np.zeros(pad, np.int32)
    vals = np.zeros(pad, np.float32)
    rows[:nnz] = np.sort(rng.integers(0, B, nnz)).astype(np.int32)
    cols[:nnz] = rng.integers(0, D, nnz).astype(np.int32)
    vals[:nnz] = rng.poisson(3.0, nnz) + 1.0
    import jax.numpy as jnp
    return {"coo_rows": jnp.asarray(rows), "coo_cols": jnp.asarray(cols),
            "coo_vals": jnp.asarray(vals),
            "indices": jnp.arange(B, dtype=jnp.int32)}


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/spmf_tpu_jax_cache")
    ap = argparse.ArgumentParser()
    ap.add_argument("--densities", default="0.001,0.003,0.01")
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    states = []
    for d in [float(x) for x in args.densities.split(",")]:
        batch = coo_batch(d, rng)
        states.append(build(f"coo@{d:.3%}", batch, False))
        states.append(build(f"dense@{d:.3%}", batch, True))

    k = jax.random.PRNGKey(0)
    for st in states:
        t0 = time.perf_counter()
        st["p"], st["o"], st["l"] = st["step"](st["p"], st["o"], k,
                                               st["batch"])
        jax.block_until_ready(st["p"])
        print(f"compiled {st['name']} in {time.perf_counter()-t0:.0f}s",
              flush=True)
        st["times"] = []
    for r in range(args.rounds):
        for st in states:
            t0 = time.perf_counter()
            for i in range(args.iters):
                st["p"], st["o"], st["l"] = st["step"](
                    st["p"], st["o"], jax.random.fold_in(k, r * 100 + i),
                    st["batch"])
            jax.block_until_ready(st["p"])
            st["times"].append((time.perf_counter() - t0) / args.iters)
    for st in states:
        dt = float(np.median(st["times"]))
        spread = (max(st["times"]) - min(st["times"])) / dt
        print(f"{st['name']:>14s}: {dt*1000:8.1f} ms/step  {B/dt:9.0f} "
              f"rows/sec  loss={float(st['l']):.6g}  (spread {spread:.0%})",
              flush=True)


if __name__ == "__main__":
    main()
