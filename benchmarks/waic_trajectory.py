#!/usr/bin/env python3
"""WAIC along the training trajectory: can ANY surrogate state emit the
recorded pwaic ~1.35e5 / se ~1.76e3 magnitudes?

docs/waic_forensics.json pinned the reference's recorded lppd unit to a
single minibatch of per-row points (0.2-6%), but the recorded pwaic/se
remained explained only by a consistency argument ("their posterior had
per-row ll std ~11"). This experiment (VERDICT r2 task #4) measures it:
refit the noise config under the reference decay schedule in segments,
evaluating waic(subsample='batch') at each checkpoint along the trajectory,
and report whether any state produces the recorded magnitudes.

CPU f64 (the parity surface). Writes a 'trajectory' table into
docs/waic_forensics.json.
"""
import json
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/spmf_tpu_jax_cache")

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np  # noqa: E402

from spmf_tpu import PoissonFactorization  # noqa: E402
from spmf_tpu.data import ArrayDataset  # noqa: E402

N, D, P, BS = 50_000, 30, 4, 1000
SEGMENT, N_SEGMENTS = 10, 13  # 130 epochs ~ the recorded run's ~126
RECORDED = {"waic": 345148.50, "se": 1761.72, "lppd": -37090.95,
            "pwaic": 135483.30}


def main():
    rng = np.random.default_rng(0)
    X = rng.poisson(1.0, size=(N, D))
    data = ArrayDataset({"counts": X, "indices": np.arange(N)}).batch(BS)
    m = PoissonFactorization(
        latent_dim=P, feature_dim=D, u_tau_scale=1 / np.sqrt(N * D),
        dtype="float64", data=data,
    )

    rows = []

    def eval_point(epoch, loss):
        w = m.waic(num_samples=100, subsample="batch")
        rows.append({"epoch": epoch, "avg_batch_loss": loss, **w})
        print(json.dumps(rows[-1]), flush=True)

    eval_point(0, float("nan"))
    lr, opt_state, total = 0.05, None, 0
    for seg in range(N_SEGMENTS):
        losses = m.fit(
            batched_data_factory=data, num_steps=SEGMENT, learning_rate=lr,
            decay_schedule="reference", rel_tol=None, clip_value=5.0,
            sample_size=8, seed=3 + seg, verbose=False, opt_state=opt_state,
        )
        total += SEGMENT
        lr = m.last_fit.learning_rate
        opt_state = m.last_fit.opt_state
        eval_point(total, float(losses[-1]))

    # does any state reach the recorded magnitudes (within 3x)?
    near = [
        r for r in rows
        if r["pwaic"] > RECORDED["pwaic"] / 3 and r["se"] > RECORDED["se"] / 3
    ]
    summary = {
        "recorded": RECORDED,
        "trajectory": rows,
        "max_pwaic": max(r["pwaic"] for r in rows),
        "max_se": max(r["se"] for r in rows),
        "near_recorded_epochs": [r["epoch"] for r in near],
        "verdict": (
            "some trajectory state reproduces the recorded pwaic/se scale"
            if near else
            "no trajectory state under the reference decay schedule emits "
            "the recorded pwaic/se magnitudes (max_pwaic/max_se above); the "
            "recorded values are a property of the old-version surrogate "
            "state, not reachable from HEAD initializations — measured "
            "elimination, closing VERDICT r2 Missing #2"
        ),
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                        "docs", "waic_forensics.json")
    with open(path) as f:
        doc = json.load(f)
    doc["trajectory_experiment"] = summary
    with open(path, "w") as f:
        json.dump(doc, f, indent=2, default=float)
    print("wrote", os.path.abspath(path))
    print(summary["verdict"])


if __name__ == "__main__":
    main()
