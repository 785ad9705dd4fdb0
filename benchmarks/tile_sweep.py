#!/usr/bin/env python3
"""Tile-size sweep for the fused likelihood kernel (interleaved A/B).

TB/TD (row/col tile) are module constants in ops/fused_poisson.py; each
candidate gets its own freshly-traced step (the globals are read at trace
time), interleaved in one process per the tunnel methodology. Reports
ms/step at the headline config (B=32768, fused-ig, no remat).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/spmf_tpu_jax_cache")

import ab_step
import spmf_tpu.ops.fused_poisson as fp

B, S = 32768, 8
ab_step.B, ab_step.S = B, S

CANDIDATES = [(128, 1024), (256, 1024), (128, 2048), (256, 512), (512, 256)]


def main():
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.poisson(1.0, (B, ab_step.D)), jnp.float32)
    print(f"# B={B} S={S} D={ab_step.D} P={ab_step.P}")
    states = []
    for tb, td in CANDIDATES:
        fp.TB, fp.TD = tb, td
        st = ab_step.build(f"TB={tb},TD={td}",
                           dict(ab_step.CONFIGS["fused-ig"]), X)
        try:
            # trace NOW so the current globals are baked in
            st["p"], st["o"], st["l"] = st["step"](
                st["p"], st["o"], jax.random.PRNGKey(99), X)
            jax.block_until_ready(st["p"])
        except Exception as e:  # VMEM overflow etc. — skip the candidate
            print(f"# TB={tb},TD={td} skipped: {type(e).__name__} "
                  f"{str(e).splitlines()[0][:120]}", flush=True)
            continue
        states.append(st)
    fp.TB, fp.TD = 128, 1024
    ab_step.run_interleaved(states, X, iters=30)


if __name__ == "__main__":
    main()
