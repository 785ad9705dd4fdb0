#!/usr/bin/env python3
"""Interleaved TPU step A/B: likelihood_clip='reference' vs 'static'.

The static mode drops the fused kernel's global-min and clip-count tile
reductions (identical losses on healthy data, bit-identical gradients —
ops/fused_poisson._sum_static_grad_kernel); ROOFLINE.md's arithmetic
predicts ~10% step at the VPU-bound operating point. Alternated rounds
in one process (the only drift-robust protocol). Writes
docs/clip_mode_ab.json.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import bench  # noqa: E402  (build_step machinery)


def build_state(clip, batch, samples, antithetic, X):
    import jax
    import jax.numpy as jnp
    import optax

    from spmf_tpu import PoissonFactorization

    model = PoissonFactorization(
        latent_dim=32, feature_dim=X.shape[1],
        u_tau_scale=1.0 / np.sqrt(50000 * X.shape[1]),
        dtype="float32", scale_columns=False, fused_likelihood=True,
        gamma_sampler="fused", likelihood_clip=clip,
    )
    model._bench_remat = False
    optimizer = optax.chain(optax.clip(5.0), optax.adam(0.01))
    step = jax.jit(
        bench.build_step(model, optimizer, batch, sample_size=samples,
                         antithetic=antithetic),
        donate_argnums=(0, 1),
    )
    return {
        "step": step,
        "p": model.surrogate_params,
        "o": optimizer.init(model.surrogate_params),
        "data": {"counts": X, "indices": jnp.arange(batch)},
        "batch": batch,
        "name": f"clip={clip}",
    }


def main():
    import argparse

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/spmf_tpu_jax_cache")
    ap = argparse.ArgumentParser()
    ap.add_argument("-B", type=int, default=16384)
    ap.add_argument("-D", type=int, default=20000)
    ap.add_argument("-s", "--samples", type=int, default=8)
    ap.add_argument("--antithetic", action="store_true")
    ap.add_argument("--rounds", type=int, default=7)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.poisson(1.0, (args.B, args.D)).astype(np.float32))
    states = [
        build_state("reference", args.B, args.samples, args.antithetic, X),
        build_state("static", args.B, args.samples, args.antithetic, X),
    ]
    bench.run_interleaved(states, rounds=args.rounds)
    out = {"config": dict(B=args.B, D=args.D, S=args.samples,
                          antithetic=args.antithetic)}
    for st in states:
        ms = args.B / st["median"] * 1e3
        out[st["name"]] = {"rows_per_sec_median": st["median"],
                           "span": st["span"], "ms_per_step": ms}
        print(f"{st['name']:>16s}: {ms:7.2f} ms/step  "
              f"{st['median']:9.0f} rows/sec (span {st['span'][0]:.0f}-"
              f"{st['span'][1]:.0f})")
    out["static_speedup"] = (out["clip=static"]["rows_per_sec_median"]
                             / out["clip=reference"]["rows_per_sec_median"])
    print(f"static speedup: {out['static_speedup']:.3f}x")
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "..", "docs", "clip_mode_ab.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {os.path.normpath(path)}")


if __name__ == "__main__":
    main()
