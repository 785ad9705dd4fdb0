#!/usr/bin/env python3
"""Probe: why is the sparse dense-scatter path slower per row at B=16384
than B=8192 (docs/sparse_bench.json: 101k vs 51k rows/sec), when the
dense fused kernel's epoch cost should be ~constant in batch size?

Decomposes the step at each batch size into
  scatter   jnp.zeros((B, D)).at[rows, cols].add(vals)   (the densify)
  step      the full jitted train step on a pre-assembled COO batch
            (scatter + encode + fused likelihood + grads + adam)
with interleaved same-process rounds (the tunnel's ambient drift makes
sequential comparisons untrustworthy — CLAUDE.md). Per-row milliseconds
are directly comparable across batch sizes.
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

from spmf_tpu import PoissonFactorization

N, D, P, S = 100_000, 50_000, 16, 8
DENSITY = 0.001
ROUNDS, ITERS = 6, 4

rng = np.random.default_rng(0)


def make_batch(B):
    """Pre-assembled padded COO batch for B rows at the bench density."""
    nnz = int(B * D * DENSITY)
    pad = int(-(-nnz * 1.25 // 1024) * 1024)
    rows = np.zeros(pad, np.int32)
    cols = np.zeros(pad, np.int32)
    vals = np.zeros(pad, np.float32)
    rows[:nnz] = np.sort(rng.integers(0, B, nnz))
    cols[:nnz] = rng.integers(0, D, nnz)
    vals[:nnz] = rng.poisson(3.0, nnz) + 1.0
    return {
        "coo_rows": jnp.asarray(rows),
        "coo_cols": jnp.asarray(cols),
        "coo_vals": jnp.asarray(vals),
        "indices": jnp.arange(B),
    }


def build(B):
    m = PoissonFactorization(
        latent_dim=P, feature_dim=D, u_tau_scale=1.0 / np.sqrt(N * D),
        dtype="float32", scale_rows=False, scale_columns=False,
        fused_likelihood=True, gamma_sampler="fused",
    )
    sur = m._surrogate
    opt = optax.chain(optax.clip(5.0), optax.adam(0.05))

    @jax.jit
    def scatter(batch):
        return (
            jnp.zeros((B, D), jnp.float32)
            .at[batch["coo_rows"], batch["coo_cols"]]
            .add(batch["coo_vals"])
        )

    def step_fn(p, o, key, batch):
        def f(p_):
            s, lq = sur.sample_and_log_prob(p_, key, (S,))
            lp = m.unormalized_log_prob(data=batch, **s)
            return -jnp.mean(lp - lq) / B

        loss, g = jax.value_and_grad(f)(p)
        u, o2 = opt.update(g, o, p)
        return optax.apply_updates(p, u), o2, loss

    step = jax.jit(step_fn, donate_argnums=(0, 1))
    batch = make_batch(B)
    return {
        "B": B,
        "scatter": scatter,
        "step": step,
        "p": m.surrogate_params,
        "o": opt.init(m.surrogate_params),
        "batch": batch,
        "scatter_times": [],
        "step_times": [],
    }


def main():
    states = [build(8192), build(16384)]
    key = jax.random.PRNGKey(0)
    # compile + warmup
    for st in states:
        jax.block_until_ready(st["scatter"](st["batch"]))
        st["p"], st["o"], st["l"] = st["step"](st["p"], st["o"], key,
                                               st["batch"])
        jax.block_until_ready(st["p"])
    for r in range(ROUNDS):
        for st in states:
            t0 = time.perf_counter()
            for i in range(ITERS):
                out = st["scatter"](st["batch"])
            jax.block_until_ready(out)
            st["scatter_times"].append((time.perf_counter() - t0) / ITERS)
            t0 = time.perf_counter()
            for i in range(ITERS):
                st["p"], st["o"], st["l"] = st["step"](
                    st["p"], st["o"], jax.random.fold_in(key, r * 100 + i),
                    st["batch"])
            jax.block_until_ready(st["p"])
            st["step_times"].append((time.perf_counter() - t0) / ITERS)
    out = {}
    for st in states:
        B = st["B"]
        sc = float(np.median(st["scatter_times"])) * 1000
        fu = float(np.median(st["step_times"])) * 1000
        out[B] = {
            "scatter_ms": round(sc, 2),
            "step_ms": round(fu, 2),
            "scatter_us_per_row": round(sc * 1000 / B, 3),
            "step_us_per_row": round(fu * 1000 / B, 3),
            "rows_per_sec": round(B / (fu / 1000), 0),
            "loss": float(st["l"]),
        }
        print(f"B={B}: scatter {sc:.2f} ms ({sc*1000/B:.3f} us/row), "
              f"step {fu:.2f} ms ({fu*1000/B:.3f} us/row, "
              f"{B/(fu/1000):,.0f} rows/sec)", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
