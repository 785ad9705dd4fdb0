"""Real multi-host training (SURVEY.md §5.8) validated end-to-end: a
2-process jax.distributed CPU cluster runs the public engine with a global
dp mesh, exercising the per-host feeding path
(``process_local_rows`` + ``jax.make_array_from_process_local_data``) for
real — beyond the single-process seam unit test
(test_engine.py::test_device_batch_multihost_seam_matches_device_put).

The reference never ran multi-node (SURVEY.md §2: the strategy kwarg was
only ever single-host MirroredStrategy); this is the TPU-pod-layout
equivalent, testable on CPU because jax.distributed supports the Gloo
collectives backend cross-process.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def pf_problem():
    """Tiny Poisson-counts dataset shared by the dp x fp worker and the
    single-process reference (identical seeded construction)."""
    from spmf_tpu.data import ArrayDataset

    rng = np.random.default_rng(3)
    X = rng.poisson(1.0, (64, 8))
    data = ArrayDataset(
        {"counts": X, "indices": np.arange(64)}
    ).batch(32, drop_remainder=True)
    return X, data


def _run_workers(mode: str, *extra: str):
    worker = os.path.join(os.path.dirname(__file__),
                          "_multiprocess_fit_worker.py")
    port = str(_free_port())
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", port, mode, *extra],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=900)
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(out)
    traces = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("LOSSES ")]
        assert lines, f"no LOSSES line in worker output:\n{out[-1000:]}"
        traces.append(json.loads(lines[-1][len("LOSSES "):]))
    return traces


def test_two_process_fit_matches_single_process():
    traces = _run_workers("gauss")
    # both hosts observe the identical loss trace (same global batches,
    # same psum'd gradients)
    np.testing.assert_array_equal(traces[0], traces[1])

    # and the 2-process run matches a single-process fit over the same
    # 4-way dp mesh (the multi-host assembly must be math-identical to
    # plain device_put sharding)
    import jax
    import jax.numpy as jnp

    from spmf_tpu.data import ArrayDataset
    from spmf_tpu.parallel.mesh import make_mesh
    from spmf_tpu.vi.minibatch import fit_surrogate_posterior
    from test_engine import _gaussian_problem

    x, surrogate, energy = _gaussian_problem()
    mesh = make_mesh(shape=(4,), axis_names=("dp",),
                     devices=jax.devices()[:4])
    data = ArrayDataset({"counts": x}).batch(32)
    ref = fit_surrogate_posterior(
        energy, surrogate, surrogate.init(), lambda: iter(data),
        sample_size=8, num_steps=3, learning_rate=0.05, rel_tol=None,
        verbose=False, dtype=jnp.float64, seed=0, mesh=mesh,
    )
    np.testing.assert_allclose(traces[0], ref.losses, rtol=1e-10)


def test_two_process_dpxfp_model_fit_matches_single_process():
    """The flagship model over a dp x fp mesh spanning two processes: the
    fp shards of u/v/w/s live on DIFFERENT hosts and the contraction
    collectives cross the process boundary. Both hosts must agree, and
    match a single-process fit over the same 2x2 layout."""
    traces = _run_workers("pf_dpfp")
    np.testing.assert_array_equal(traces[0], traces[1])

    import jax

    from spmf_tpu import PoissonFactorization
    from spmf_tpu.parallel.mesh import make_mesh

    X, data = pf_problem()
    mesh = make_mesh(shape=(2, 2), axis_names=("dp", "fp"),
                     devices=jax.devices()[:4])
    model = PoissonFactorization(
        latent_dim=2, feature_dim=X.shape[1], u_tau_scale=0.1,
        dtype="float64", mesh=mesh,
    )
    losses = model.fit(
        batched_data_factory=data, num_steps=2, learning_rate=0.05,
        rel_tol=None, sample_size=4, seed=0, verbose=False,
    )
    np.testing.assert_allclose(traces[0], losses, rtol=1e-10)


def test_two_process_dcn_multislice_layout():
    """Multi-slice (DCN) recipe (SURVEY.md §5.8): make_multislice_mesh
    groups the 2-process cluster by PROCESS into an outer 'dcn' axis, so
    the gradient psum's dcn leg crosses the process boundary — the
    collective a v5e multi-slice pod routes over the data-center network.
    Both hosts must agree, and match a single-process fit over an
    equivalent explicit ('dcn', 'dp') mesh."""
    traces = _run_workers("pf_dcn")
    np.testing.assert_array_equal(traces[0], traces[1])

    import jax

    from spmf_tpu import PoissonFactorization
    from spmf_tpu.parallel.mesh import make_mesh

    X, data = pf_problem()
    mesh = make_mesh(shape=(2, 2), axis_names=("dcn", "dp"),
                     devices=jax.devices()[:4])
    model = PoissonFactorization(
        latent_dim=2, feature_dim=X.shape[1], u_tau_scale=0.1,
        dtype="float64", mesh=mesh,
    )
    losses = model.fit(
        batched_data_factory=data, num_steps=2, learning_rate=0.05,
        rel_tol=None, sample_size=4, seed=0, verbose=False,
    )
    np.testing.assert_allclose(traces[0], losses, rtol=1e-10)


def test_two_process_checkpoint_resume_drill(tmp_path):
    """VERDICT r3 #3: full-state preemption recovery over the CROSS-HOST
    dp x fp layout. Run 1 writes full-state checkpoints of params whose fp
    shards live on different hosts (the save must allgather, not
    device_get, and only process 0 may write); run 2 is a fresh model
    resuming from the directory. Both hosts must agree, and the resumed
    trajectory must match a single-process save->resume drill over the
    same 2x2 layout at 1e-10."""
    traces = _run_workers("pf_dpfp_ckpt", str(tmp_path / "mp"))
    np.testing.assert_array_equal(traces[0], traces[1])

    # exactly one run directory, written once (process 0 only)
    import glob

    files = glob.glob(str(tmp_path / "mp" / "**" / "*.npz"), recursive=True)
    assert files, "no checkpoint written by the 2-process run"

    # single-process equivalent over the same 2x2 mesh
    import jax

    from spmf_tpu import PoissonFactorization
    from spmf_tpu.parallel.mesh import make_mesh

    X, data = pf_problem()
    mesh = make_mesh(shape=(2, 2), axis_names=("dp", "fp"),
                     devices=jax.devices()[:4])

    def build():
        return PoissonFactorization(
            latent_dim=2, feature_dim=X.shape[1], u_tau_scale=0.1,
            dtype="float64", mesh=mesh,
        )

    sp_dir = str(tmp_path / "sp")
    m1 = build()
    m1.fit(batched_data_factory=data, num_steps=2, learning_rate=0.05,
           rel_tol=None, sample_size=4, seed=0, verbose=False,
           checkpoint_dir=sp_dir)
    m2 = build()
    m2.fit(batched_data_factory=data, num_steps=2, learning_rate=0.05,
           rel_tol=None, sample_size=4, seed=0, verbose=False,
           resume_from=sp_dir)
    np.testing.assert_allclose(traces[0], m2.last_fit.losses, rtol=1e-10)
