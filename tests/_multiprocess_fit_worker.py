"""Subprocess worker for the real two-process multi-host fit test.

Each worker is one "host" of a 2-process jax.distributed CPU cluster
(2 local devices each -> 4 global). It runs the same seeded fit through
the public engine with a global dp mesh; the engine's multi-host feeding
path (``_device_batch``: ``process_local_rows`` +
``jax.make_array_from_process_local_data``) engages because
``jax.process_count() == 2``. Prints the loss trace for the parent test
to compare across processes and against a single-process run.

Not a pytest file (leading underscore): launched by
tests/test_multiprocess.py.
"""
import json
import os
import sys


def main():
    proc_id, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    mode = sys.argv[4] if len(sys.argv) > 4 else "gauss"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/spmf_tpu_jax_cache")

    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    sys.path.insert(0, os.path.dirname(__file__))

    from spmf_tpu.parallel import global_mesh, initialize_distributed

    assert initialize_distributed(
        f"localhost:{port}", num_processes=nprocs, process_id=proc_id
    ), "distributed runtime did not come up"
    assert jax.process_count() == nprocs
    assert jax.device_count() == 2 * nprocs

    import jax.numpy as jnp

    from spmf_tpu.data import ArrayDataset
    from spmf_tpu.vi.minibatch import fit_surrogate_posterior

    if mode == "gauss":
        from test_engine import _gaussian_problem

        x, surrogate, energy = _gaussian_problem()
        mesh = global_mesh(("dp",))
        # every process builds the IDENTICAL global batch sequence (seeded
        # shuffle); the engine materializes only this process's row shard
        data = ArrayDataset({"counts": x}).batch(32)
        result = fit_surrogate_posterior(
            energy, surrogate, surrogate.init(), lambda: iter(data),
            sample_size=8, num_steps=3, learning_rate=0.05, rel_tol=None,
            verbose=False, dtype=jnp.float64, seed=0, mesh=mesh,
        )
    elif mode == "pf_dpfp_ckpt":
        # save -> (simulated preemption) -> resume over the cross-host
        # dp x fp layout: full-state checkpoints of params sharded ACROSS
        # the two hosts (VERDICT r3 #3 — device_get of non-addressable
        # arrays must not crash the save, and the resume must re-place
        # onto the live layout)
        from spmf_tpu import PoissonFactorization
        from test_multiprocess import pf_problem

        ckdir = sys.argv[5]
        X, data = pf_problem()
        mesh = global_mesh(("dp", "fp"), shape=(2, 2))

        def build():
            return PoissonFactorization(
                latent_dim=2, feature_dim=X.shape[1], u_tau_scale=0.1,
                dtype="float64", mesh=mesh,
            )

        m1 = build()
        m1.fit(batched_data_factory=data, num_steps=2, learning_rate=0.05,
               rel_tol=None, sample_size=4, seed=0, verbose=False,
               checkpoint_dir=ckdir)
        # "preemption": a fresh model resumes from the newest checkpoint
        m2 = build()
        m2.fit(batched_data_factory=data, num_steps=2, learning_rate=0.05,
               rel_tol=None, sample_size=4, seed=0, verbose=False,
               resume_from=ckdir)
        result = m2.last_fit
    elif mode == "pf_dcn":
        # multi-slice (DCN) layout: make_multislice_mesh groups this CPU
        # cluster's devices by PROCESS (the slice stand-in), so the outer
        # dcn axis spans the two processes and the gradient psum's dcn leg
        # crosses the process boundary — exactly the collective a v5e
        # multi-slice pod routes over the data-center network
        from spmf_tpu import PoissonFactorization
        from spmf_tpu.parallel import make_multislice_mesh
        from test_multiprocess import pf_problem

        X, data = pf_problem()
        mesh = make_multislice_mesh(ici_shape=(2,), ici_axis_names=("dp",))
        assert mesh.axis_names == ("dcn", "dp")
        assert mesh.shape["dcn"] == 2  # one slice group per process
        model = PoissonFactorization(
            latent_dim=2, feature_dim=X.shape[1], u_tau_scale=0.1,
            dtype="float64", mesh=mesh,
        )
        losses = model.fit(
            batched_data_factory=data, num_steps=2, learning_rate=0.05,
            rel_tol=None, sample_size=4, seed=0, verbose=False,
        )
        result = model.last_fit
    elif mode == "pf_dpfp":
        # the flagship model over a dp x fp mesh spanning BOTH processes:
        # rows shard over dp, the feature dim of u/v/w/s over fp — the
        # params' fp shards live on different hosts
        import numpy as np

        from spmf_tpu import PoissonFactorization
        from test_multiprocess import pf_problem

        X, data = pf_problem()
        mesh = global_mesh(("dp", "fp"), shape=(2, 2))
        model = PoissonFactorization(
            latent_dim=2, feature_dim=X.shape[1], u_tau_scale=0.1,
            dtype="float64", mesh=mesh,
        )
        losses = model.fit(
            batched_data_factory=data, num_steps=2, learning_rate=0.05,
            rel_tol=None, sample_size=4, seed=0, verbose=False,
        )
        result = model.last_fit
    else:
        raise SystemExit(f"unknown mode {mode}")
    print("LOSSES " + json.dumps([float(v) for v in result.losses]),
          flush=True)


if __name__ == "__main__":
    main()
