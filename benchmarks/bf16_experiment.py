"""bf16-matmul experiment for the fused likelihood kernels (VERDICT r1 #10).

HISTORICAL — the monkeypatched hooks (_tile_ll/_bwd_dtv) belong to the
r2 two-pass kernel structure this experiment measured. The result was
negative twice (no gain; after the single-pass restructure the bf16 casts
produced BIT-IDENTICAL outputs to the f32 dots — Mosaic already lowers
these K=32 f32 dots to single-pass-bf16 MXU; docs/ROADMAP.md), so the
experiment was retired when the stats+grad kernel replaced those hooks.
Kept for the record of the methodology; it exits with a pointer instead
of running.
"""
import sys

print(__doc__)
sys.exit(0)

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import optax

jax.config.update("jax_compilation_cache_dir", "/tmp/spmf_tpu_jax_cache")

import spmf_tpu.ops.fused_poisson as fp
from spmf_tpu import PoissonFactorization

S, B, D, P = 8, 4096, 20000, 32


def bf16_tile_ll(theta_ref, v_ref, phi_ref, x, eta, lgx, s, log_transform):
    tv = jnp.dot(theta_ref[s].astype(jnp.bfloat16),
                 v_ref[s].astype(jnp.bfloat16),
                 preferred_element_type=jnp.float32)
    if log_transform:
        rate = jnp.exp(tv * eta) - 1.0 + phi_ref[s]
    else:
        rate = tv * eta + phi_ref[s]
    return x * fp._safe_log(rate) - rate - lgx


def bf16_bwd_dtv(s, min_ref, g_ref, theta_s, v_s, phi_ref, x, eta, lgx,
                 in_bounds, log_transform):
    tv = jnp.dot(theta_s.astype(jnp.bfloat16), v_s.astype(jnp.bfloat16),
                 preferred_element_type=jnp.float32)
    if log_transform:
        ev = jnp.exp(tv * eta)
        rate = ev - 1.0 + phi_ref[s]
    else:
        rate = tv * eta + phi_ref[s]
    ll = x * fp._safe_log(rate) - rate - lgx
    active = jnp.isfinite(ll) & (ll > min_ref[0]) & (ll < 0.0) & in_bounds
    rate_safe = jnp.maximum(rate, jnp.finfo(jnp.float32).tiny)
    drate = jnp.where(active, x / rate_safe - 1.0, 0.0) * g_ref[s]
    dtv = drate * (ev * eta if log_transform else eta)
    dtv = jnp.where(active, dtv, 0.0)
    return dtv, jnp.where(active, drate, 0.0)


def build_step():
    model = PoissonFactorization(
        latent_dim=P, feature_dim=D, u_tau_scale=1.0 / np.sqrt(50000 * D),
        dtype="float32", scale_columns=False, fused_likelihood=True,
        gamma_sampler="fused",
    )
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

    return step, model.surrogate_params, opt


def main():
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.poisson(1.0, (B, D)), jnp.float32)
    k = jax.random.PRNGKey(0)

    states = []
    orig = (fp._tile_ll, fp._bwd_dtv)
    for name, patch in (("f32", None), ("bf16-matmul", True)):
        if patch:
            fp._tile_ll, fp._bwd_dtv = bf16_tile_ll, bf16_bwd_dtv
        step, params, opt = build_step()
        o = opt.init(params)
        p, o, l = step(params, o, k, X)  # trace+compile under the patch
        jax.block_until_ready(p)
        states.append({"name": name, "step": step, "p": p, "o": o,
                       "l": l, "times": []})
        fp._tile_ll, fp._bwd_dtv = orig

    per_round, rounds = 5, 6
    for st in states:  # warmup round
        for i in range(per_round):
            st["p"], st["o"], st["l"] = st["step"](
                st["p"], st["o"], jax.random.fold_in(k, i), X)
        jax.block_until_ready(st["p"])
    for r in range(rounds):
        for st in states:
            t0 = time.perf_counter()
            for i in range(per_round):
                st["p"], st["o"], st["l"] = st["step"](
                    st["p"], st["o"], jax.random.fold_in(k, r * 100 + i), X)
            jax.block_until_ready(st["p"])
            st["times"].append((time.perf_counter() - t0) / per_round)
    for st in states:
        dt = float(np.median(st["times"]))
        print(f"{st['name']:>12s}: {dt*1000:7.1f} ms/step  {B/dt:9.0f} "
              f"rows/sec  loss={float(st['l']):.6g}")


if __name__ == "__main__":
    main()
