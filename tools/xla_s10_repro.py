#!/usr/bin/env python3
"""Minimal standalone repro of the XLA:TPU sample-dim miscompilation.

Observed (r4, this image's jax/libtpu via the axon remote backend): with
sample dim S=10 — and ONLY 10 of S in {1..7, 9, 10, 12, 16, 20} — the
jitted graph below computes a batched matmul of NON-NEGATIVE operands
whose output contains large NEGATIVE values (mathematically impossible),
at B=4096, D=20000, K=32. In spmf_tpu this poisoned WAIC's per-row
log-likelihoods (vi/waic.py docstring; defaults moved off chunk=10).

Pure jax — no spmf_tpu imports — so it can be reported upstream as-is.
The graph mirrors the model's encode: sampled softplus-normals -> a
column-normalized weighting -> broadcast-batched matmul -> row scaling.
Run: python tools/xla_s10_repro.py [-S 10] [-B 4096] [-D 20000] [-K 32]
"""
import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-S", type=int, default=10)
    ap.add_argument("-B", type=int, default=4096)
    ap.add_argument("-D", type=int, default=20000)
    ap.add_argument("-K", type=int, default=32)
    args = ap.parse_args()
    S, B, D, K = args.S, args.B, args.D, args.K

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/spmf_tpu_jax_cache")
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.poisson(1.0, size=(B, D)).astype(np.float32))

    @jax.jit
    def probe(key, x):
        ku, ks = jax.random.split(key)
        # softplus'd normal draws: strictly positive
        u = jax.nn.softplus(-6.0 + 5e-4 * jax.random.normal(ku, (S, D, K)))
        s = jax.nn.softplus(
            jnp.asarray([[-2.0], [-1.0]])
            + 1e-3 * jax.random.normal(ks, (S, 2, D))
        )
        w = s / jnp.sum(s, axis=-2, keepdims=True)   # (S, 2, D), in (0,1)
        A = w[..., 0, :, None] * u                   # (S, D, K), positive
        z = jnp.matmul(x, A)                         # non-neg @ positive
        z = z * jnp.sum(x, -1, keepdims=True)        # non-negative scaling
        return jnp.min(z), jnp.max(z), jnp.sum(~jnp.isfinite(z))

    mn, mx, nf = probe(jax.random.PRNGKey(1), x)
    mn, mx, nf = float(mn), float(mx), int(nf)
    verdict = "CORRUPT (negative output from non-negative operands)" \
        if mn < 0 or nf else "ok"
    print(f"S={S} B={B} D={D} K={K}: min {mn:.6g} max {mx:.6g} "
          f"nonfinite {nf} -> {verdict}")
    return 1 if (mn < 0 or nf) else 0


if __name__ == "__main__":
    raise SystemExit(main())
