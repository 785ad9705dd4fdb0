"""Shared interleaved-rounds timing harness for multi-arm step benchmarks.

One process, arms alternated per round, median-of-rounds per arm — the
only A/B methodology that survives the TPU tunnel's ~1.7x ambient drift
and first-config warmup bias (see benchmarks/ab_step.py and CLAUDE.md).
Used by autoencoder_ablation.py and autoencoder_sampler_ab.py.
"""
import time

import numpy as np


def run_interleaved_arms(arms, key, iters, rounds=5, label_width=8):
    """Run each arm's jitted ``step`` interleaved and fill ``times``.

    ``arms``: ordered dict name -> {"step": fn(p, o, key) -> (p, o, loss),
    "p": params, "o": opt_state}; mutated in place ("l" holds the final
    loss, "times" the per-round seconds/step). Keys are disjoint between
    warmup (indices [0, per_round)) and every timed round (offset past the
    warmup range) so no gradient draw is ever replayed on stepped params.

    Returns {name: {"ms_per_step": float, "loss": float}} and prints one
    line per arm.
    """
    import jax

    per_round = max(iters // rounds, 3)
    for st in arms.values():  # compile + warmup
        st.setdefault("times", [])
        for i in range(per_round):
            st["p"], st["o"], st["l"] = st["step"](
                st["p"], st["o"], jax.random.fold_in(key, i))
        jax.block_until_ready(st["p"])
    for r in range(rounds):
        for st in arms.values():
            t0 = time.perf_counter()
            for i in range(per_round):
                st["p"], st["o"], st["l"] = st["step"](
                    st["p"], st["o"],
                    jax.random.fold_in(key, per_round + r * per_round + i))
            jax.block_until_ready(st["p"])
            st["times"].append((time.perf_counter() - t0) / per_round)

    result = {}
    for name, st in arms.items():
        ms = float(np.median(st["times"]) * 1000)
        result[name] = {"ms_per_step": round(ms, 2), "loss": float(st["l"])}
        print(f"{name:{label_width}s}: {ms:8.2f} ms/step   "
              f"(final loss {float(st['l']):.2f})", flush=True)
    return result
