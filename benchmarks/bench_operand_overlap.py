#!/usr/bin/env python3
"""One-time overlap run backing bench.py's on-device operand switch (r5).

bench.py used to stage the B=32768 x D=20000 f32 Poisson(1) operand from
host (2.6 GB through the remote-device tunnel — >10 min of wall for a
~60 s measurement); since r5 it generates the operand on device with
jax.random.poisson. Counts are Poisson(1) either way, only the stream
differs. This harness runs the headline arm with BOTH operands
INTERLEAVED in one process (the only protocol the repo's drift
experiments certify, CLAUDE.md) and records the medians, demonstrating
they are statistically identical. Writes docs/bench_operand_overlap.json.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/spmf_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402


def main():
    B = int(os.environ.get("OVERLAP_BATCH", 32768))
    Xdev = jax.jit(
        lambda k: jax.random.poisson(k, 1.0, (B, bench.D)).astype(jnp.float32)
    )(jax.random.PRNGKey(0))
    jax.block_until_ready(Xdev)
    print("device operand ready", flush=True)
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    Xhost = jnp.asarray(rng.poisson(1.0, size=(B, bench.D)).astype(np.float32))
    jax.block_until_ready(Xhost)
    stage_s = time.perf_counter() - t0
    print(f"host operand staged in {stage_s:.1f}s", flush=True)

    arm_dev = bench.build_state(batch=B, samples=4, antithetic=True,
                                likelihood_clip="static", X=Xdev)
    arm_host = bench.build_state(batch=B, samples=4, antithetic=True,
                                 likelihood_clip="static", X=Xhost)
    bench.run_interleaved([arm_dev, arm_host])
    out = {
        "config": {"B": B, "D": bench.D, "P": bench.P,
                   "arm": "samples=4-antithetic static-clip (the headline)"},
        "host_staging_seconds": round(stage_s, 1),
        "on_device_operand": {
            "median_rows_per_sec": round(arm_dev["median"], 1),
            "span": [round(v, 1) for v in arm_dev["span"]],
        },
        "host_staged_operand": {
            "median_rows_per_sec": round(arm_host["median"], 1),
            "span": [round(v, 1) for v in arm_host["span"]],
        },
        "ratio_device_over_host": round(arm_dev["median"] / arm_host["median"], 4),
        "note": "interleaved same-process medians; operands are i.i.d. "
                "Poisson(1) draws differing only in the random stream",
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "bench_operand_overlap.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
