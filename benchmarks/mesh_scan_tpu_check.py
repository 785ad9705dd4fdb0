#!/usr/bin/env python3
"""TPU checks for the r4 mesh-composed engine paths (VERDICT r3 #1/#2).

1. epoch_scan under a trivial (1,1) dp x fp mesh vs unmeshed, ALTERNATED
   in one process (the only drift-robust protocol, CLAUDE.md): the mesh
   plumbing (device_put shardings, with_sharding_constraint, sharded
   fused kernel under shard_map) must not regress the single-chip scan
   throughput.
2. waic()/log_likelihood() on a MESHED model at production scale
   (D=20000, 100 posterior samples): the sharded streaming row kernel
   route must complete without materializing (S, B, D) (~8 GB/chunk).

Writes docs/mesh_scan_tpu_check.json.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def build(mesh, D, N, P):
    import jax.numpy as jnp

    from spmf_tpu import PoissonFactorization
    from spmf_tpu.data import DeviceArrayDataset, as_data_factory

    rng = np.random.default_rng(0)
    X = rng.poisson(1.0, size=(N, D)).astype(np.float32)
    m = PoissonFactorization(
        latent_dim=P, feature_dim=D, u_tau_scale=1.0 / np.sqrt(N * D),
        dtype="float32", scale_columns=False, mesh=mesh,
    )
    ds = DeviceArrayDataset({"counts": jnp.asarray(X),
                             "indices": np.arange(N)},
                            batch_size=2048, shuffle=True, seed=0)
    return m, as_data_factory(ds)


def fit_epochs(m, data, epochs):
    t0 = time.perf_counter()
    m.fit(batched_data_factory=data, num_steps=epochs, learning_rate=0.05,
          sample_size=8, seed=0, verbose=False, rel_tol=None,
          epoch_chunk=1)
    wall = time.perf_counter() - t0
    secs = m.last_fit.extras["epoch_seconds"]
    assert m.last_fit.extras["epoch_scan"], "scan path did not engage"
    # steady state: drop the compile epoch
    return float(np.median(secs[1:])), wall


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/spmf_tpu_jax_cache")
    from spmf_tpu.parallel.mesh import make_mesh

    D, N, P, EPOCHS, ROUNDS = 2000, 16384, 16, 4, 3
    out = {"config": dict(D=D, N=N, P=P, epochs=EPOCHS, rounds=ROUNDS)}

    mesh = make_mesh((1, 1), ("dp", "fp"))
    arms = {"unmeshed": build(None, D, N, P),
            "mesh11": build(mesh, D, N, P)}
    times = {k: [] for k in arms}
    for r in range(ROUNDS):
        for name, (m, data) in arms.items():
            sec, _ = fit_epochs(m, data, EPOCHS)
            times[name].append(sec)
            print(f"round {r} {name:>9s}: {sec*1e3:7.1f} ms/epoch")
    for name in arms:
        out[name] = {"epoch_secs": times[name],
                     "median": float(np.median(times[name]))}
    ratio = out["mesh11"]["median"] / out["unmeshed"]["median"]
    out["mesh_over_unmeshed"] = ratio
    print(f"(1,1)-mesh / unmeshed epoch time: {ratio:.3f}x")

    # 2) meshed WAIC at production scale
    from spmf_tpu import PoissonFactorization
    from spmf_tpu.data import ArrayDataset

    Dw, B = 20000, 4096
    rng = np.random.default_rng(1)
    Xw = rng.poisson(1.0, size=(B, Dw)).astype(np.float32)
    mw = PoissonFactorization(
        latent_dim=32, feature_dim=Dw, u_tau_scale=1e-3, dtype="float32",
        scale_columns=False, mesh=mesh,
    )
    data = ArrayDataset({"counts": Xw, "indices": np.arange(B)}).batch(B)
    t0 = time.perf_counter()
    w = mw.waic(data=data, num_samples=100, sample_chunk=8)
    out["meshed_waic_D20k_S100"] = {
        "seconds": time.perf_counter() - t0,
        "finite": bool(np.isfinite(w["waic"])),
        "n_rows": w["n_rows"],
    }
    print(f"meshed waic (D=20k, 100 samples, B={B}): "
          f"{out['meshed_waic_D20k_S100']['seconds']:.1f}s, "
          f"waic finite={out['meshed_waic_D20k_S100']['finite']}")

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "..", "docs", "mesh_scan_tpu_check.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {os.path.normpath(path)}")


if __name__ == "__main__":
    main()
