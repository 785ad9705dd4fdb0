#!/usr/bin/env python3
"""Roofline probe for the fused likelihood kernel (docs/ROOFLINE.md).

Measures, on the live chip, the attainable rates of the primitive
operations the kernel's inner loop is built from — an MXU matmul at the
kernel's contraction shape, VPU elementwise arithmetic, VPU
transcendentals, and HBM stream bandwidth — plus the fused stats+grad
kernel itself at the headline shape. The ratio
(kernel cell rate x ops-per-cell) / (measured pure-op rate) is the
%-of-practical-peak figure ROOFLINE.md reports: "practical" because the
numerator and denominator come from the SAME chip, software stack, and
tunnel, so spec-sheet ambiguity (f32-vs-bf16 MXU passes, VPU ALU count)
cancels out.

Every probe is a DEPENDENCY-CHAINED ``lax.fori_loop`` inside one jitted
dispatch: independent repeated calls through the remote tunnel measure
dispatch plumbing, not device work (first draft of this probe "measured"
87 TB/s of HBM bandwidth that way). Writes docs/roofline_probe.json.
Sequential timings: the ~1.7x tunnel drift applies (CLAUDE.md), but
roofline conclusions are order-of-magnitude statements.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

LOOP = 30


def _sync(out):
    """Force a REAL device sync: fetch one element. Measured on the axon
    remote backend, ``jax.block_until_ready`` can return before async
    compile+execution finish (a loop=8 probe 'timed' 0.17 ms while the
    subsequent element fetch waited 58 s for the queue); a value fetch is
    the only reliable barrier. Costs one tunnel RTT (~ms) per
    measurement — amortized by LOOP chained iterations per dispatch."""
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))


def timeit(fn, *args, reps=3):
    out = fn(*args)  # compile + queue flush
    _sync(out)
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best / LOOP  # per chained iteration


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--elems", type=int, default=256 * 2**20,
                    help="f32 elements for the VPU probes (default 256M)")
    ap.add_argument("-S", type=int, default=8)
    # B=8192 keeps the x upload at 655 MB (the headline B=32768 slab is
    # 2.6 GB, which takes many minutes to stage through the tunnel); the
    # kernel's per-cell rate is tile-local and batch-size-insensitive
    ap.add_argument("-B", type=int, default=8192)
    ap.add_argument("-K", type=int, default=32)
    ap.add_argument("-D", type=int, default=20000)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/tmp/spmf_tpu_jax_cache")
    S, B, K, D = args.S, args.B, args.K, args.D
    n = args.elems
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random(n, np.float32) + 0.5)
    out = {"backend": jax.default_backend(), "elems": n, "loop": LOOP,
           "shape": dict(S=S, B=B, K=K, D=D)}

    def chained(body):
        @jax.jit
        def run(a):
            return lax.fori_loop(0, LOOP, lambda i, y: body(y), a)
        return run

    # Stream probes: each iteration reads + writes the full array
    # (2 x 4n bytes of HBM traffic) and does `ops` VPU ops per element.
    # 1-op probes hit the HBM wall; the long fused chains approach the
    # VPU arithmetic/transcendental ceilings on register-resident data.
    probes = {
        "copy_add": (lambda y: y + 1e-7, 1),
        "log1": (lambda y: jnp.log(y + 2.0), 2),
        "exp1": (lambda y: jnp.exp(-y) + 1.0, 3),
        "div1": (lambda y: 1.0 / (y + 1.0), 2),
    }

    def fma_chain(k):
        def body(y):
            for _ in range(k):
                y = y * 1.0000001 + 1e-7
            return y
        return body

    def log_chain(k):
        def body(y):
            for _ in range(k):
                y = jnp.log(y + 2.0)
            return y
        return body

    # 16 ops/elem measured memory-bound (~298 GB/s wall, same as copy);
    # the 128/64-op chains are what actually expose the VPU ceilings
    probes["fma_chain16"] = (fma_chain(8), 16)
    probes["fma_chain128"] = (fma_chain(64), 128)
    probes["log_chain8"] = (log_chain(8), 16)  # 8 logs + 8 adds
    probes["log_chain64"] = (log_chain(64), 128)  # 64 logs + 64 adds
    for name, (body, ops) in probes.items():
        dt = timeit(chained(body), x)
        out[name] = {
            "sec_per_iter": dt,
            "elems_per_sec": n / dt,
            "ops_per_sec": ops * n / dt,
            "hbm_gb_per_sec": 2 * 4 * n / dt / 1e9,
        }
        print(f"{name:>12s}: {n / dt / 1e9:8.2f} Gelem/s  "
              f"{ops * n / dt / 1e12:7.3f} Top/s  "
              f"({out[name]['hbm_gb_per_sec']:6.0f} GB/s streamed)")

    # MXU probe at the kernel's contraction shape: (B,K)@(K,D), f32.
    # Dependency: the next a is a scaled slice of the product.
    a0 = jnp.asarray(rng.random((B, K), np.float32))
    bmat = jnp.asarray(rng.random((K, D), np.float32))

    def mm_body(dtype):
        bm = jnp.asarray(bmat, dtype)

        @jax.jit
        def run(a):
            def body(i, y):
                c = jnp.dot(y, bm, preferred_element_type=jnp.float32)
                return jnp.asarray(c[:, :K] * 1e-3 + 1e-3, dtype)
            return lax.fori_loop(0, LOOP, body, a)
        return run

    for dtype, name in ((jnp.float32, "matmul_f32_BKD"),
                        (jnp.bfloat16, "matmul_bf16_BKD")):
        dt = timeit(mm_body(dtype), jnp.asarray(a0, dtype))
        out[name] = {"sec_per_iter": dt, "tflops": 2 * B * K * D / dt / 1e12}
        print(f"{name:>16s}: {out[name]['tflops']:8.2f} TFLOP/s")

    # The fused stats+grad kernel itself. Dependency chain: theta is
    # perturbed by a slice of the per-sample sums (cheap, unoptimizable).
    from spmf_tpu.ops.fused_poisson import fused_poisson_loglik

    theta = jnp.asarray(rng.gamma(1.0, 1.0, (S, B, K)).astype(np.float32))
    v = jnp.asarray(rng.gamma(1.0, 1.0, (S, K, D)).astype(np.float32))
    phi = jnp.asarray(rng.gamma(1.0, 0.1, (S, 1, D)).astype(np.float32))
    xc = jnp.asarray(rng.poisson(1.0, (B, D)).astype(np.float32))
    cells = S * B * D

    # v/phi/x ride as jit ARGUMENTS: closing over them captures 2.6 GB of
    # constants into the lowering and the remote-compile request (the
    # tunnel hangs/413s — CLAUDE.md; observed here before the fix)
    @jax.jit
    def fwd_loop(t, v, phi, xc):
        def body(i, y):
            s = fused_poisson_loglik(y, v, phi, xc, 1.0)
            return y + s[:, None, None] * 1e-12
        return lax.fori_loop(0, LOOP, body, t)

    dt = timeit(fwd_loop, theta, v, phi, xc)
    out["fused_kernel_fwd"] = {"sec_per_iter": dt,
                               "cell_samples_per_sec": cells / dt}
    print(f"fused fwd(+spec grads): {cells / dt / 1e9:6.2f} Gcell-samp/s "
          f"({dt * 1e3:.1f} ms)")

    gfn = jax.grad(lambda t, vv, p, xc: jnp.sum(
        fused_poisson_loglik(t, vv, p, xc, 1.0)), argnums=(0, 1, 2))

    @jax.jit
    def bwd_loop(t, v, phi, xc):
        def body(i, y):
            dt_, dv_, dp_ = gfn(y, v, phi, xc)
            return y + dt_ * 1e-12
        return lax.fori_loop(0, LOOP, body, t)

    dt = timeit(bwd_loop, theta, v, phi, xc)
    out["fused_kernel_fwdbwd"] = {"sec_per_iter": dt,
                                  "cell_samples_per_sec": cells / dt}
    print(f"fused fwd+bwd (vjp): {cells / dt / 1e9:6.2f} Gcell-samp/s "
          f"({dt * 1e3:.1f} ms)")

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "..", "docs", "roofline_probe.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {os.path.normpath(path)}")


if __name__ == "__main__":
    main()
