#!/usr/bin/env python3
"""Interleaved probe: threefry vs rbg/unsafe_rbg hardware PRNG for the
surrogate normal draws.

The step ablation (docs/ROADMAP.md) puts sampling+logq at ~19.5 ms of the
S=8 B=32768 step and ~26 ms of the 35.8 ms autoencoder step. Part of that
is threefry bit generation for the Normal surrogates
(vi/surrogates.py:323-326: one flattened jax.random.normal over the
concatenated param vector). TPUs have a hardware RNG exposed through the
'rbg'/'unsafe_rbg' PRNG implementations; if bit generation is a real
fraction, swapping the key impl is a one-line engine lever.

Probe shapes: (S=4, 1.35M) ~ factorizer surrogate draw at D=20k P=32,
(S=8, 8.1M) ~ the autoencoder surrogate. Each timed arm is a jitted
draw+logq-ish consumer (normal draw -> affine -> logpdf sum) so XLA can't
dead-code the bits; per-iter keys are folded IN-JIT (no per-key tunnel
dispatches); arms alternate in rounds (CLAUDE.md: only interleaved
same-process comparisons are trustworthy), and every timing syncs with a
value fetch (block_until_ready can lie on the axon backend).
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/spmf_tpu_jax_cache")

    SHAPES = [("factorizer", (4, 1_350_000)), ("autoencoder", (8, 8_100_000))]
    IMPLS = ["threefry2x32", "rbg", "unsafe_rbg"]
    ROUNDS, ITERS = 5, 12

    results = {}
    for name, shape in SHAPES:
        n = shape[1]
        loc = jax.device_put(np.zeros(n, np.float32))
        log_scale = jax.device_put(np.full(n, -3.0, np.float32))

        def make(impl):
            @jax.jit
            def draw(key, i, loc, log_scale):
                k = jax.random.fold_in(key, i)
                eps = jax.random.normal(k, shape, jnp.float32)
                scale = jnp.exp(log_scale)
                z = loc + scale * eps
                # mean-field normal logq at the draw (the consumer the
                # engine always runs): -(eps^2/2 + log scale + c), summed
                lq = -0.5 * eps * eps - log_scale
                return z[:, :1], jnp.sum(lq, axis=-1)

            return draw, jax.random.key(0, impl=impl)

        arms = {impl: make(impl) for impl in IMPLS}
        for impl, (draw, key) in arms.items():
            t0 = time.perf_counter()
            z, lq = draw(key, 0, loc, log_scale)
            jax.device_get(z[0, 0])
            print(f"# {name}/{impl}: compile+first {time.perf_counter()-t0:.1f}s",
                  flush=True)
        times = {impl: [] for impl in IMPLS}
        for r in range(ROUNDS):
            for impl, (draw, key) in arms.items():
                t0 = time.perf_counter()
                for i in range(ITERS):
                    z, lq = draw(key, r * 1000 + i, loc, log_scale)
                jax.device_get(z[0, 0])
                times[impl].append((time.perf_counter() - t0) / ITERS)
        results[name] = {
            impl: {
                "ms_median": round(float(np.median(ts)) * 1e3, 3),
                "ms_span": [round(min(ts) * 1e3, 3), round(max(ts) * 1e3, 3)],
            }
            for impl, ts in times.items()
        }
        base = results[name]["threefry2x32"]["ms_median"]
        for impl in IMPLS:
            r_ = results[name][impl]
            print(f"{name:>12s} {impl:>12s}: {r_['ms_median']:7.3f} ms "
                  f"(span {r_['ms_span']})  speedup {base / r_['ms_median']:.2f}x",
                  flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
