#!/usr/bin/env python3
"""Interleaved probe: how the ELBO sample dim S interacts with COO gathers.

benchmarks/gather_probe.py measured single-sample primitives at ~308 Mnnz/s
(take) and the single-sample composite nz-term at 32 Mnnz/s — 20x faster
than the r3 whole-energy measurement (~1.6 Mnnz/s, docs/sparse_bench.json).
The training energy gathers from per-sample tables (A is (S, D, K);
jnp.take(..., axis=-2) becomes a BATCHED gather), which is the suspected
20x. Arms at S=8, K=16, D=50k, nnz=4.1M:

  batched     jnp.take(A_sdk, cols, axis=-2)          (S,D,K) -> (S,nnz,K)
  flat        one take from (D, S*K) table            -> (nnz, S*K)
  vmap        jax.vmap(lambda a: a[cols])(A_sdk)      explicit per-sample
  nzterm_b    full nz composite with batched gathers (the energy as written)
  nzterm_f    full nz composite with flattened gathers

Interleaved rounds, value-fetch sync (CLAUDE.md probe hygiene).
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

B, D, K, S = 8192, 50000, 16, 8
NNZ = 4_100_000
NNZ_B = 512_000   # batched arms only: f32[nnz,8,16] pads 8x (16->128 lanes)
                  # and OOMs HBM at full nnz — itself the diagnosis
ROUNDS, ITERS = 3, 2


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/spmf_tpu_jax_cache")

    rng = np.random.default_rng(0)
    rows = np.sort(rng.integers(0, B, NNZ)).astype(np.int32)  # CSR order
    cols = rng.integers(0, D, NNZ).astype(np.int32)
    vals = rng.poisson(3.0, NNZ).astype(np.float32) + 1.0

    rows_d = jnp.asarray(rows)
    cols_d = jnp.asarray(cols)
    vals_d = jnp.asarray(vals)
    rows_b = jnp.asarray(rows[:NNZ_B])
    cols_b = jnp.asarray(cols[:NNZ_B])
    vals_b = jnp.asarray(vals[:NNZ_B])
    A_sdk = jnp.asarray(rng.normal(size=(S, D, K)).astype(np.float32))
    A_flat = jnp.asarray(
        np.ascontiguousarray(
            np.moveaxis(np.asarray(A_sdk), 0, 1).reshape(D, S * K)))
    theta = jnp.asarray(rng.gamma(2.0, 1.0, (S, B, K)).astype(np.float32))
    theta_flat = jnp.asarray(
        np.ascontiguousarray(
            np.moveaxis(np.asarray(theta), 0, 1).reshape(B, S * K)))
    phi = jnp.asarray(rng.gamma(1.0, 1.0, (S, D)).astype(np.float32))
    phi_flat = jnp.asarray(np.asarray(phi).T.copy())  # (D, S)

    def _sum(x):
        return jnp.sum(x, axis=tuple(range(1, x.ndim)))

    arms = {
        "batched": (jax.jit(lambda c: _sum(jnp.take(A_sdk, c, axis=-2))),
                    (cols_b,)),
        "flat": (jax.jit(lambda c: jnp.sum(
            jnp.take(A_flat, c, axis=0), axis=0)), (cols_d,)),
        "vmap": (jax.jit(jax.vmap(lambda a, c: jnp.sum(
            jnp.take(a, c, axis=0), axis=0), in_axes=(0, None))),
            (A_sdk, cols_b)),
    }

    from jax.scipy.special import gammaln

    def nzterm_b(r, c, v):
        th = jnp.take(theta, r, axis=-2)          # (S, nnz, K) batched
        vc = jnp.take(A_sdk, c, axis=-2)          # (S, nnz, K) batched
        rate = jnp.einsum("snk,snk->sn", th, vc) \
            + jnp.take(phi, c, axis=-1)
        rate = jnp.maximum(rate, 1e-30)
        ll = v[None] * jnp.log(rate) - gammaln(v + 1.0)[None]
        return jax.vmap(lambda x: jax.ops.segment_sum(
            x, r, num_segments=B, indices_are_sorted=True))(ll)

    def nzterm_f(r, c, v):
        th = jnp.take(theta_flat, r, axis=0)      # (nnz, S*K) one gather
        vc = jnp.take(A_flat, c, axis=0)          # (nnz, S*K) one gather
        prod = (th.reshape(-1, S, K) * vc.reshape(-1, S, K)).sum(-1)
        rate = prod + jnp.take(phi_flat, c, axis=0)   # (nnz, S)
        rate = jnp.maximum(rate, 1e-30)
        ll = v[:, None] * jnp.log(rate) - gammaln(v + 1.0)[:, None]
        out = jax.ops.segment_sum(ll, r, num_segments=B,
                                  indices_are_sorted=True)   # (B, S)
        return out.T

    arms["nzterm_b"] = (jax.jit(nzterm_b), (rows_b, cols_b, vals_b))
    arms["nzterm_f"] = (jax.jit(nzterm_f), (rows_d, cols_d, vals_d))
    arm_nnz = {n: (NNZ_B if n in ("batched", "vmap", "nzterm_b") else NNZ)
               for n in arms}

    outs = {}
    for name, (f, a) in arms.items():
        t0 = time.perf_counter()
        outs[name] = f(*a)
        jax.device_get(outs[name].ravel()[0])
        print(f"compiled {name} in {time.perf_counter() - t0:.1f}s",
              flush=True)

    times = {n: [] for n in arms}
    for r in range(ROUNDS):
        for name, (f, a) in arms.items():
            t0 = time.perf_counter()
            o = None
            for _ in range(ITERS):
                o = f(*a)
            jax.device_get(o.ravel()[0])
            times[name].append((time.perf_counter() - t0) / ITERS)

    res = {}
    for name, ts in times.items():
        ms = float(np.median(ts)) * 1e3
        res[name] = {"ms_median": round(ms, 3),
                     "mnnz_per_sec_per_sample": round(
                         arm_nnz[name] / (ms * 1e-3) / 1e6 * S, 1),
                     "ms_span": [round(min(ts) * 1e3, 3),
                                 round(max(ts) * 1e3, 3)]}
        print(f"{name:>10s}: {ms:9.3f} ms  "
              f"{res[name]['mnnz_per_sec_per_sample']:9.1f} Mnnz-samp/s  "
              f"span {res[name]['ms_span']}", flush=True)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
