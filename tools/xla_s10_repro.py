#!/usr/bin/env python3
"""Repro of the XLA:TPU sample-dim miscompilation (r4).

Observed (this image's jax/libtpu via the axon remote backend): with
sample dim S=10 — and ONLY 10 of S in {1..7, 9, 10, 12, 16, 20} — the
jitted sample-then-encode graph below computes a broadcast-batched
matmul of NON-NEGATIVE operands whose output contains large NEGATIVE
values (mathematically impossible), for every batch size probed
(B = 512..8192) at D=20000, K=32. In spmf_tpu this poisoned WAIC's
per-row log-likelihoods (vi/waic.py docstring; defaults moved off
chunk=10).

MINIMIZATION STATUS: a pure-jax reduction (softplus-normal draws ->
column-normalized weighting -> batched matmul -> row scaling, i.e. the
encode subgraph alone) does NOT trigger the bug — S=10 and S=8 both
compute correctly there. The trigger needs the fuller jitted graph: the
model's SurrogatePosterior.sample (14 variables: normals + pathwise
gamma/inverse-gamma auxiliaries) fused with the encode. This script
therefore reproduces via the in-repo model — run it on the TPU backend:

    python tools/xla_s10_repro.py            # S=10 -> exit 1 (CORRUPT)
    python tools/xla_s10_repro.py -S 8       # clean -> exit 0

The eager (non-jit) evaluation of the identical computation is correct;
only the jitted fusion at S=10 corrupts. The Pallas kernels are not
involved (gamma_sampler='fast' is pure XLA).
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-S", type=int, default=10)
    ap.add_argument("-B", type=int, default=1024)
    ap.add_argument("-D", type=int, default=20000)
    ap.add_argument("-K", type=int, default=32)
    args = ap.parse_args()
    S, B, D, K = args.S, args.B, args.D, args.K

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/spmf_tpu_jax_cache")
    from spmf_tpu import PoissonFactorization

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.poisson(1.0, size=(B, D)).astype(np.float32))
    m = PoissonFactorization(
        latent_dim=K, feature_dim=D, u_tau_scale=1e-3, dtype="float32",
        scale_columns=False, gamma_sampler="fast",  # pure XLA, no Pallas
    )

    @jax.jit
    def probe(key, x):
        s = m._surrogate.sample(m.surrogate_params, key, (S,))
        theta = m.encode(x, s["u"], s["s"])  # non-neg @ positive, scaled
        return (jnp.min(theta), jnp.max(theta),
                jnp.sum(~jnp.isfinite(theta)),
                jnp.min(s["u"]), jnp.min(s["s"]))

    mn, mx, nf, umin, smin = (float(v) for v in probe(jax.random.PRNGKey(1),
                                                      x))
    verdict = ("CORRUPT (negative encode output from non-negative "
               "operands)") if mn < 0 or nf else "ok"
    print(f"S={S} B={B} D={D} K={K}: theta min {mn:.6g} max {mx:.6g} "
          f"nonfinite {int(nf)}; operand mins u={umin:.4g} s={smin:.4g} "
          f"-> {verdict}")
    return 1 if (mn < 0 or nf) else 0


if __name__ == "__main__":
    raise SystemExit(main())
