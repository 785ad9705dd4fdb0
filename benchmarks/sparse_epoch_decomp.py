"""Decompose the r5 device-epoch sparse training epoch (TPU).

The S-axis A/B (docs/sparse_epoch_s_ab.json) shows the sparse epoch is
barely S-scaled (S8 -> S4 saves ~4%), and batch-size scaling says the
per-batch overhead is ~6 ms — so the 0.69 s epoch at 100k x 50k 0.1% is
dominated by something nnz- or N-scaled and S-independent. This probe
times the pieces in one process (interleaved reps, value-fetch sync —
block_until_ready lies on the axon backend, CLAUDE.md):

  decode    the epoch COO decode (scatter+cumsum run decode + flat gather)
  take      one batch slice (3 dynamic slices + mask)
  sample    surrogate sample_and_log_prob alone (S=8)
  energy    fwd COO energy on one assembled batch
  step      full jitted train step (sample+energy+grad+opt) on one batch
  epoch     the real whole-epoch scan dispatch (run_epoch equivalent)

    python benchmarks/sparse_epoch_decomp.py
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

import optax

from spmf_tpu import PoissonFactorization
from spmf_tpu.data import SparseCounts
from spmf_tpu.data.sparse import DeviceSparseCounts

N, D, P, B, S = 100_000, 50_000, 16, 32_768, 8
DENSITY = 0.001

rng = np.random.default_rng(0)
nnz = int(N * D * DENSITY)
sp = SparseCounts.from_coo(rng.integers(0, N, nnz), rng.integers(0, D, nnz),
                           rng.poisson(3.0, nnz) + 1.0, (N, D))
ds = sp.shuffle(seed=0).batch(B, drop_remainder=True).to_device()
pad = ds._pad(B)
print(f"nnz={nnz:,} pad={pad:,}", flush=True)

m = PoissonFactorization(
    latent_dim=P, feature_dim=D, u_tau_scale=1.0 / np.sqrt(N * D),
    dtype="float32", data=ds, scale_rows=False, sparse_dense_scatter=False,
)
sur = m._surrogate
params = m.surrogate_params
opt = optax.chain(optax.clip(5.0), optax.adam(0.05))
ostate = opt.init(params)

decode, take = ds._epoch_fns(pad, B)
perm = jnp.arange(N - (N % B), dtype=jnp.int32)


def _sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf.reshape(-1)[0]))


# pieces
ep = decode(ds.indptr, ds.indices, ds.data, perm)
batch0 = dict(take(ep, 0))
batch0.pop("coo_nnz")

energy_fn = jax.jit(lambda b, s: m.unormalized_log_prob(data=b, **s))
samples0, _ = sur.sample_and_log_prob(params, jax.random.PRNGKey(0), (S,))

sample_fn = jax.jit(
    lambda p, k: sur.sample_and_log_prob(p, k, (S,)))


@jax.jit
def step_fn(p, o, key, batch):
    def loss(p_):
        s, logq = sur.sample_and_log_prob(p_, key, (S,))
        lp = m.unormalized_log_prob(data=batch, **s)
        return -jnp.mean(lp - logq) / B

    l, g = jax.value_and_grad(loss)(p)
    u, o2 = opt.update(g, o, p)
    return optax.apply_updates(p, u), o2, l


ARMS = {
    "decode": lambda i: decode(ds.indptr, ds.indices, ds.data, perm),
    "take": lambda i: take(ep, i % 3),
    "sample": lambda i: sample_fn(params, jax.random.PRNGKey(i)),
    "energy_fwd": lambda i: energy_fn(batch0, samples0),
    "step": lambda i: step_fn(params, ostate, jax.random.PRNGKey(i), batch0),
}

# compile
for name, fn in ARMS.items():
    _sync(fn(0))
    print("compiled", name, flush=True)

REPS, PER = 5, 3
times = {name: [] for name in ARMS}
for r in range(REPS):
    for name, fn in ARMS.items():
        t0 = time.perf_counter()
        out = None
        for i in range(PER):
            out = fn(r * 10 + i)
        _sync(out)
        times[name].append((time.perf_counter() - t0) / PER)

out = {"config": dict(N=N, D=D, P=P, B=B, S=S, density=DENSITY, pad=pad)}
for name in ARMS:
    med = float(np.median(times[name]))
    out[name] = {"ms": round(med * 1e3, 2),
                 "span_ms": [round(min(times[name]) * 1e3, 2),
                             round(max(times[name]) * 1e3, 2)]}
    print(f"{name:>11s}: {out[name]['ms']:8.2f} ms "
          f"(span {out[name]['span_ms']})", flush=True)

print(json.dumps(out))
path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                    "docs", "sparse_epoch_decomp.json")
with open(path, "w") as f:
    json.dump(out, f, indent=2)
print("wrote", os.path.abspath(path))
