"""Epochs-to-ELBO-parity on the noise config, under both decay schedules.

BASELINE.md names epochs-to-ELBO-parity as a tracked metric: the reference
notebook reaches its converged avg-batch loss ~40.520 at epoch ~126 with the
observed ~x0.93 plateau decay. This records the first epoch at which the
rebuild's avg-batch loss drops to <= 40.52, for decay_schedule='reference'
(trajectory-shape parity) and the default x0.99 schedule.

Writes docs/epochs_to_parity.json. CPU f64, ~5 min.
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

N, D, P, TARGET = 50_000, 30, 4, 40.52


def run(schedule):
    X = np.random.default_rng(0).poisson(1.0, size=(N, D))
    data = ArrayDataset({"counts": X, "indices": np.arange(N)}).batch(1000)
    m = PoissonFactorization(
        latent_dim=P, feature_dim=D, u_tau_scale=1 / np.sqrt(N * D),
        dtype="float64", data=data,
    )
    kwargs = {} if schedule is None else {"decay_schedule": schedule}
    losses = m.calibrate_advi(
        num_steps=140, learning_rate=0.05, rel_tol=1e-4, clip_value=5.0,
        sample_size=8, seed=3, verbose=False, **kwargs,
    )
    hits = [i for i, l in enumerate(losses) if np.isfinite(l) and l <= TARGET]
    return {
        "epochs_to_40.52": hits[0] if hits else None,
        "epochs_run": len(losses) - 1,
        "final_loss": float(losses[-1]),
        "best_loss": float(np.nanmin(losses)),
    }


def main():
    out = {
        "reference_notebook": {"epochs_to_40.52": "~126", "schedule": "~x0.93"},
        "default_x0.99": run(None),
        "reference_x0.93": run("reference"),
    }
    print(json.dumps(out, indent=2), flush=True)
    path = os.path.join(os.path.dirname(__file__), "..", "docs",
                        "epochs_to_parity.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", os.path.abspath(path))


if __name__ == "__main__":
    main()
