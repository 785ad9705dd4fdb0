"""TPU validation of the fused IG-sampler kernel (spmf_tpu/ops/fused_ig.py).

The kernel's hardware-RNG plumbing cannot run on CPU (no interpret-mode
pltpu.prng_*), so this script validates it on the real chip:

1. sample distribution: KS test of the kernel's softplus-IG draws vs the
   threefry reference path, per (a, b) block;
2. logq consistency: kernel logq vs the direct density evaluated at the
   kernel's own samples;
3. gradients: custom-VJP grads vs central finite differences at fixed seed
   (the function is deterministic in (a, b) given the seed);
4. micro-benchmark vs the XLA sampling pipeline at production scale.

Writes docs/fused_ig_validation.json. Run: python benchmarks/validate_fused_ig_tpu.py
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/spmf_tpu_jax_cache")

from scipy import stats

from spmf_tpu.ops.fused_ig import (
    _softplus,
    fused_ig_sample_logq,
    ig_sample_logq_reference,
)

out = {}

# ---------------------------------------------------------- 1. distribution
S, n = 64, 4096
rng = np.random.default_rng(1)
a_np = np.concatenate([np.full(n // 4, v) for v in (0.7, 1.5, 3.0, 5.0)])
b_np = np.concatenate([np.full(n // 4, v) for v in (0.5, 1.0, 2.0, 0.8)])
a = jnp.asarray(a_np, jnp.float32)
b = jnp.asarray(b_np, jnp.float32)

y, lq = jax.jit(fused_ig_sample_logq, static_argnums=3)(a, b, 1234, S)
y = np.asarray(y)


def inv_softplus(z):
    z = np.clip(z, 1e-30, None)
    return np.where(z > 30.0, z, np.log(np.expm1(np.minimum(z, 30.0))))
ks = {}
for i, (av, bv) in enumerate([(0.7, 0.5), (1.5, 1.0), (3.0, 2.0), (5.0, 0.8)]):
    block = y[:, i * (n // 4):(i + 1) * (n // 4)].ravel()
    # y = softplus(x), x ~ IG(a, b): invert and KS-test against IG
    x = inv_softplus(block)
    stat = stats.kstest(
        x, lambda q: stats.invgamma.cdf(q, av, scale=bv)
    ).statistic
    ks[f"a={av},b={bv}"] = float(stat)
out["ks_vs_invgamma"] = ks
print("KS stats (WH approx error ~1e-2 expected):", ks, flush=True)

# ---------------------------------------------------------- 2. logq at draws
x_all = inv_softplus(y)
direct = (
    stats.invgamma.logpdf(x_all, a_np[None, :], scale=b_np[None, :])
    + np.asarray(_softplus(jnp.asarray(-x_all)))
).sum(axis=1)
lq_err = np.max(np.abs(np.asarray(lq) - direct) / np.abs(direct))
out["logq_rel_err_vs_direct"] = float(lq_err)
print("logq rel err:", lq_err, flush=True)

# --------------------------------------------------------------- 3. FD grads
Sg, ng = 16, 1024
ag = jnp.asarray(rng.uniform(1.0, 4.0, ng), jnp.float32)
bg = jnp.asarray(rng.uniform(0.5, 2.0, ng), jnp.float32)
wy = jnp.asarray(rng.normal(0, 1, (Sg, ng)), jnp.float32)
wl = jnp.asarray(rng.normal(0, 1, (Sg,)), jnp.float32)


@jax.jit
def scalar(a_, b_):
    yy, ll = fused_ig_sample_logq(a_, b_, 777, Sg)
    return jnp.sum(yy * wy) + jnp.sum(ll * wl)


ga, gb = jax.jit(jax.grad(scalar, (0, 1)))(ag, bg)
# probe a handful of coordinates with central differences
idx = rng.integers(0, ng, 12)
fd_errs = []
for which, g in (("a", ga), ("b", gb)):
    for i in idx[:6]:
        h = 1e-2
        basis = jnp.zeros(ng, jnp.float32).at[int(i)].set(h)
        if which == "a":
            fd = (scalar(ag + basis, bg) - scalar(ag - basis, bg)) / (2 * h)
        else:
            fd = (scalar(ag, bg + basis) - scalar(ag, bg - basis)) / (2 * h)
        an = float(g[int(i)])
        fd = float(fd)
        denom = max(abs(fd), abs(an), 1e-3)
        fd_errs.append(abs(fd - an) / denom)
out["fd_grad_max_rel_err"] = float(np.max(fd_errs))
print("FD grad max rel err:", out["fd_grad_max_rel_err"], flush=True)

# --------------------------------------------------- 4. micro-bench at scale
total = 1_400_000
Sb = 8
ab = jnp.asarray(rng.uniform(1.0, 4.0, total), jnp.float32)
bb = jnp.asarray(rng.uniform(0.5, 2.0, total), jnp.float32)


@jax.jit
def fused_loss(a_, b_, seed):
    yy, ll = fused_ig_sample_logq(a_, b_, seed, Sb)
    return jnp.sum(yy) + jnp.sum(ll)


@jax.jit
def xla_loss(a_, b_, key):
    yy, ll = ig_sample_logq_reference(a_, b_, key, Sb)
    return jnp.sum(yy) + jnp.sum(ll)


gf = jax.jit(jax.grad(fused_loss, (0, 1)))
gx = jax.jit(jax.grad(xla_loss, (0, 1)))


def bench(fn, *args, iters=20):
    o = fn(*args)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn(*args)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters * 1000


key = jax.random.PRNGKey(0)
out["bench_ms"] = {
    "fused_fwd": bench(lambda: fused_loss(ab, bb, 5)),
    "xla_fwd": bench(lambda: xla_loss(ab, bb, key)),
    "fused_grad": bench(lambda: gf(ab, bb, 5)),
    "xla_grad": bench(lambda: gx(ab, bb, key)),
}
print(json.dumps(out["bench_ms"], indent=2), flush=True)

path = os.path.join(os.path.dirname(__file__), "..", "docs",
                    "fused_ig_validation.json")
with open(path, "w") as f:
    json.dump(out, f, indent=2)
print("wrote", os.path.abspath(path))

# ------------------------------------------ 5. fused Normal sampler kernel
from spmf_tpu.ops.fused_normal import fused_normal_sample_logq

Sn, nn = 64, 4096
locn = jnp.asarray(rng.normal(0.0, 1.0, nn), jnp.float32)
rsn = jnp.asarray(rng.normal(0.0, 1.0, nn), jnp.float32)
maskn = jnp.asarray((np.arange(nn) % 2 == 0).astype(np.float32))
yn, lqn = jax.jit(fused_normal_sample_logq, static_argnums=4)(
    locn, rsn, maskn, 99, Sn)
yn = np.asarray(yn)
# identity-bijector elements must be N(loc, softplus(rs)): standardize + KS
ident = np.asarray(maskn) == 0
z = (yn[:, ident] - np.asarray(locn)[ident]) / np.log1p(np.exp(np.asarray(rsn)))[ident]
out["normal_ks"] = float(stats.kstest(z.ravel(), "norm").statistic)
print("normal KS:", out["normal_ks"], flush=True)

wyn = jnp.asarray(rng.normal(0, 1, (16, nn)), jnp.float32)
wln = jnp.asarray(rng.normal(0, 1, (16,)), jnp.float32)


@jax.jit
def nscalar(l_, r_):
    yy, ll = fused_normal_sample_logq(l_, r_, maskn, 123, 16)
    return jnp.sum(yy * wyn) + jnp.sum(ll * wln)


gl, gr = jax.jit(jax.grad(nscalar, (0, 1)))(locn, rsn)
nfd = []
for i in rng.integers(0, nn, 8):
    h = 1e-2
    basis = jnp.zeros(nn, jnp.float32).at[int(i)].set(h)
    fd = float((nscalar(locn + basis, rsn) - nscalar(locn - basis, rsn)) / (2 * h))
    an = float(gl[int(i)])
    nfd.append(abs(fd - an) / max(abs(fd), abs(an), 1e-3))
    fd = float((nscalar(locn, rsn + basis) - nscalar(locn, rsn - basis)) / (2 * h))
    an = float(gr[int(i)])
    nfd.append(abs(fd - an) / max(abs(fd), abs(an), 1e-3))
out["normal_fd_grad_max_rel_err"] = float(np.max(nfd))
print("normal FD grad max rel err:", out["normal_fd_grad_max_rel_err"], flush=True)

with open(path, "w") as f:
    json.dump(out, f, indent=2)
print("rewrote", os.path.abspath(path))

# --------------------------------------------------- 6. antithetic kernel mode
# fused_ig_sample_logq(..., antithetic=True): samples s and s+S/2 share a
# seed stream with mirrored uniforms. Validate marginals (KS per (a,b)
# block), pair anticorrelation, logq at the mirrored draws, and VJP grads.
ya, lqa = jax.jit(fused_ig_sample_logq, static_argnums=(3, 4))(
    a, b, 1234, S, True)
ya = np.asarray(ya)
ks_anti = {}
for i, (av, bv) in enumerate([(0.7, 0.5), (1.5, 1.0), (3.0, 2.0), (5.0, 0.8)]):
    block = ya[:, i * (n // 4):(i + 1) * (n // 4)].ravel()
    stat = stats.kstest(
        inv_softplus(block), lambda q: stats.invgamma.cdf(q, av, scale=bv)
    ).statistic
    ks_anti[f"a={av},b={bv}"] = float(stat)
out["antithetic_ks_vs_invgamma"] = ks_anti
print("antithetic KS:", ks_anti, flush=True)

za = (ya - ya.mean(0)) / (ya.std(0) + 1e-12)
out["antithetic_pair_corr"] = float((za[: S // 2] * za[S // 2:]).mean())
print("antithetic pair corr:", out["antithetic_pair_corr"], flush=True)

xa = inv_softplus(ya)
direct_a = (
    stats.invgamma.logpdf(xa, a_np[None, :], scale=b_np[None, :])
    + np.asarray(_softplus(jnp.asarray(-xa)))
).sum(axis=1)
out["antithetic_logq_rel_err"] = float(
    np.max(np.abs(np.asarray(lqa) - direct_a) / np.abs(direct_a)))
print("antithetic logq rel err:", out["antithetic_logq_rel_err"], flush=True)


@jax.jit
def scalar_anti(a_, b_):
    yy, ll = fused_ig_sample_logq(a_, b_, 777, Sg, True)
    return jnp.sum(yy * wy) + jnp.sum(ll * wl)


ga_a, gb_a = jax.jit(jax.grad(scalar_anti, (0, 1)))(ag, bg)
fd_a = []
for which, g in (("a", ga_a), ("b", gb_a)):
    for i in idx[:6]:
        h = 1e-2
        basis = jnp.zeros(ng, jnp.float32).at[int(i)].set(h)
        if which == "a":
            fd = (scalar_anti(ag + basis, bg) - scalar_anti(ag - basis, bg)) / (2 * h)
        else:
            fd = (scalar_anti(ag, bg + basis) - scalar_anti(ag, bg - basis)) / (2 * h)
        an = float(g[int(i)])
        fd = float(fd)
        fd_a.append(abs(fd - an) / max(abs(fd), abs(an), 1e-3))
out["antithetic_fd_grad_max_rel_err"] = float(np.max(fd_a))
print("antithetic FD grad max rel err:",
      out["antithetic_fd_grad_max_rel_err"], flush=True)

with open(path, "w") as f:
    json.dump(out, f, indent=2)
print("rewrote", os.path.abspath(path))

# --------------------------------------------------- 7. stratified kernel mode
# fused_ig_sample_logq(..., antithetic='stratified'): all samples share ONE
# per-tile stream; pair p lattice-shifts every uniform by p/(S/2) in the
# bit domain. Validate marginals, logq at the shifted draws, pair
# anticorrelation, and VJP grads (the backward must replay the shifted
# stream exactly).
ys, lqs = jax.jit(fused_ig_sample_logq, static_argnums=(3, 4))(
    a, b, 1234, S, "stratified")
ys = np.asarray(ys)
ks_strat = {}
for i, (av, bv) in enumerate([(0.7, 0.5), (1.5, 1.0), (3.0, 2.0), (5.0, 0.8)]):
    block = ys[:, i * (n // 4):(i + 1) * (n // 4)].ravel()
    stat = stats.kstest(
        inv_softplus(block), lambda q: stats.invgamma.cdf(q, av, scale=bv)
    ).statistic
    ks_strat[f"a={av},b={bv}"] = float(stat)
out["stratified_ks_vs_invgamma"] = ks_strat
print("stratified KS:", ks_strat, flush=True)

zs = (ys - ys.mean(0)) / (ys.std(0) + 1e-12)
out["stratified_pair_corr"] = float((zs[: S // 2] * zs[S // 2:]).mean())
print("stratified pair corr:", out["stratified_pair_corr"], flush=True)

xs = inv_softplus(ys)
direct_s = (
    stats.invgamma.logpdf(xs, a_np[None, :], scale=b_np[None, :])
    + np.asarray(_softplus(jnp.asarray(-xs)))
).sum(axis=1)
out["stratified_logq_rel_err"] = float(
    np.max(np.abs(np.asarray(lqs) - direct_s) / np.abs(direct_s)))
print("stratified logq rel err:", out["stratified_logq_rel_err"], flush=True)


@jax.jit
def scalar_strat(a_, b_):
    yy, ll = fused_ig_sample_logq(a_, b_, 777, Sg, "stratified")
    return jnp.sum(yy * wy) + jnp.sum(ll * wl)


ga_s, gb_s = jax.jit(jax.grad(scalar_strat, (0, 1)))(ag, bg)
fd_s = []
for which, g in (("a", ga_s), ("b", gb_s)):
    for i in idx[:6]:
        h = 1e-2
        basis = jnp.zeros(ng, jnp.float32).at[int(i)].set(h)
        if which == "a":
            fd = (scalar_strat(ag + basis, bg) - scalar_strat(ag - basis, bg)) / (2 * h)
        else:
            fd = (scalar_strat(ag, bg + basis) - scalar_strat(ag, bg - basis)) / (2 * h)
        an = float(g[int(i)])
        fd = float(fd)
        fd_s.append(abs(fd - an) / max(abs(fd), abs(an), 1e-3))
out["stratified_fd_grad_max_rel_err"] = float(np.max(fd_s))
print("stratified FD grad max rel err:",
      out["stratified_fd_grad_max_rel_err"], flush=True)

with open(path, "w") as f:
    json.dump(out, f, indent=2)
print("rewrote", os.path.abspath(path))
