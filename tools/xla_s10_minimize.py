#!/usr/bin/env python3
"""Minimization ladder for the XLA:TPU S=10 sample->encode miscompile.

tools/xla_s10_repro.py reproduces via the in-repo model; the r4
minimization stalled at "a pure-jax reduction (softplus-normal draws ->
weighting -> batched matmul) does not trigger". The missing ingredient is
hypothesized to be the Wilson-Hilferty gamma/IG chains fused into the
same program. This script re-implements the surrogate sampling math
STANDALONE (no spmf_tpu imports in the traced graph) at the production
shapes and probes progressively smaller graphs:

  L0  in-repo model control (expect CORRUPT at S=10)
  L1  standalone: ALL 14 variables (6 normal blocks + 8 WH-IG blocks,
      flat threefry draws, reshape) + encode
  L2  standalone: u-normal + s-IG + u_aux IGs + encode
  L3  standalone: u-normal + s-IG + encode
  L4  standalone: u-normal + s-IG + encode, no row-normalized weights

Usage (TPU backend):
    python tools/xla_s10_minimize.py -L 1 -S 10
    python tools/xla_s10_minimize.py -L 1 -S 8     # clean control
    python tools/xla_s10_minimize.py -L 1 -S 10 --dump-hlo out.txt

Exit 1 = CORRUPT (negative/non-finite encode output from non-negative
operands), 0 = clean.
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def build_standalone(level, S, B, D, K):
    import jax
    import jax.numpy as jnp

    BOOST = 8

    def softplus(x):
        return jnp.maximum(x, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(x)))

    def wh_gamma(key, a):
        kn, ku = jax.random.split(key)
        eps = jax.random.normal(kn, a.shape, jnp.float32)
        u = jax.random.uniform(ku, (BOOST,) + a.shape, jnp.float32,
                               minval=np.finfo(np.float32).tiny, maxval=1.0)
        i = jnp.arange(BOOST, dtype=jnp.float32).reshape(
            (BOOST,) + (1,) * a.ndim)
        s1 = jnp.sum(jnp.log(u) / (a + i), axis=0)
        ab = a + float(BOOST)
        c = 1.0 - 1.0 / (9.0 * ab) + eps / (3.0 * jnp.sqrt(ab))
        g = ab * jnp.maximum(c, 0.05) ** 3 * jnp.exp(s1)
        return jnp.maximum(g, jnp.sqrt(np.float32(np.finfo(np.float32).tiny)))

    def ig_block(key, shape):
        # IG surrogate sample: softplus(b / Gamma(a)) at the init point
        a = jnp.full((S,) + shape, softplus(jnp.float32(1.0)))
        b = softplus(jnp.float32(1.0))
        return softplus(b / wh_gamma(key, a))

    def normal_block(key, shape, loc, raw_scale, constrain):
        eps = jax.random.normal(key, (S,) + shape, jnp.float32)
        x = loc + softplus(jnp.float32(raw_scale)) * eps
        return softplus(x) if constrain else x

    # variable inventory (model shapes at the production config)
    norm_shapes = {
        "u": ((D, K), -6.0, 5e-4, True),
        "v": ((K, D), -6.0, 5e-4, True),
        "w": ((1, D), -6.0, 5e-4, True),
    }
    ig_shapes = {
        "s": (2, D),
        "u_eta": (D, K),
        "u_tau": (1, K),
        "u_eta_a": (D, K),
        "u_tau_a": (1, K),
        "s_eta": (2, D),
        "s_tau": (1, D),
        "s_eta_a": (2, D),
    }
    if level == 2:
        norm_shapes = {"u": norm_shapes["u"]}
        ig_shapes = {k: ig_shapes[k] for k in
                     ("s", "u_eta", "u_tau", "u_eta_a", "u_tau_a")}
    elif level >= 3:
        norm_shapes = {"u": norm_shapes["u"]}
        ig_shapes = {"s": ig_shapes["s"]}

    def probe(key, x):
        keys = jax.random.split(key, len(norm_shapes) + len(ig_shapes))
        vals = {}
        ki = 0
        for name, (shape, loc, rs, con) in norm_shapes.items():
            vals[name] = normal_block(keys[ki], shape, loc, rs, con)
            ki += 1
        for name, shape in ig_shapes.items():
            vals[name] = ig_block(keys[ki], shape)
            ki += 1
        u, s = vals["u"], vals["s"]
        if level >= 4:
            A = u
        else:
            weights = s / jnp.sum(s, axis=-2, keepdims=True)
            A = weights[..., 0, :, None] * u        # (S, D, K)
        theta = jnp.matmul(x, A)                    # (S, B, K)
        extra = sum(jnp.sum(v) * 0.0 for v in vals.values())
        return (jnp.min(theta) + extra, jnp.max(theta),
                jnp.sum(~jnp.isfinite(theta)), jnp.min(u), jnp.min(s))

    return probe


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-L", type=int, default=1)
    ap.add_argument("-S", type=int, default=10)
    ap.add_argument("-B", type=int, default=1024)
    ap.add_argument("-D", type=int, default=20000)
    ap.add_argument("-K", type=int, default=32)
    ap.add_argument("--dump-hlo", default=None)
    args = ap.parse_args()
    S, B, D, K = args.S, args.B, args.D, args.K

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/spmf_tpu_jax_cache")

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.poisson(1.0, size=(B, D)).astype(np.float32))

    if args.L == 0:
        from spmf_tpu import PoissonFactorization

        m = PoissonFactorization(
            latent_dim=K, feature_dim=D, u_tau_scale=1e-3, dtype="float32",
            scale_columns=False, gamma_sampler="fast",
        )

        def probe(key, x):
            s = m._surrogate.sample(m.surrogate_params, key, (S,))
            theta = m.encode(x, s["u"], s["s"])
            return (jnp.min(theta), jnp.max(theta),
                    jnp.sum(~jnp.isfinite(theta)),
                    jnp.min(s["u"]), jnp.min(s["s"]))
    else:
        probe = build_standalone(args.L, S, B, D, K)

    jp = jax.jit(probe)
    if args.dump_hlo:
        txt = jp.lower(jax.random.PRNGKey(1), x).compile().as_text()
        with open(args.dump_hlo, "w") as f:
            f.write(txt)
        print(f"wrote compiled HLO ({len(txt)} bytes) to {args.dump_hlo}")
    mn, mx, nf, umin, smin = (float(v) for v in jp(jax.random.PRNGKey(1), x))
    verdict = "CORRUPT" if (mn < 0 or nf) else "ok"
    print(f"L{args.L} S={S} B={B} D={D} K={K}: theta min {mn:.6g} max "
          f"{mx:.6g} nonfinite {int(nf)}; u_min={umin:.4g} s_min={smin:.4g}"
          f" -> {verdict}")
    return 1 if (mn < 0 or nf) else 0


if __name__ == "__main__":
    raise SystemExit(main())
