"""ADVI engine semantics: analytic-posterior convergence, plateau/LR decay,
checkpoint restore, prior_weight plumbing, WAIC definition."""
import jax
import jax.numpy as jnp
import numpy as np

from spmf_tpu import bijectors as tfb
from spmf_tpu import distributions as tfd
from spmf_tpu.data import ArrayDataset
from spmf_tpu.vi.minibatch import fit_surrogate_posterior
from spmf_tpu.vi.surrogates import (
    SurrogatePosterior,
    TrainableNormal,
    TransformedSurrogate,
)
from spmf_tpu.vi.waic import waic


def _gaussian_problem():
    """Conjugate 1-D problem: z ~ N(0,1), x_i ~ N(z, 1), n obs.
    Posterior: N(sum(x)/(n+1), 1/(n+1))."""
    rng = np.random.default_rng(0)
    x = rng.normal(1.5, 1.0, size=64)
    surrogate = SurrogatePosterior(
        {
            "z": TransformedSurrogate(
                TrainableNormal(np.zeros((1, 1)), 0.5 * np.ones((1, 1)), 2),
                tfb.Identity(),
            )
        }
    )

    def energy(batch, samples, prior_weight):
        z = samples["z"][..., 0, 0]  # (S,)
        lp_prior = tfd.Normal(0.0, 1.0).log_prob(z)
        obs = jnp.asarray(batch["counts"])  # (n,)
        lp_lik = jnp.sum(
            tfd.Normal(z[..., None], 1.0).log_prob(obs[None, :]), axis=-1
        )
        return lp_prior + lp_lik

    return x, surrogate, energy


def test_advi_converges_to_analytic_posterior():
    x, surrogate, energy = _gaussian_problem()
    n = len(x)
    post_mean = x.sum() / (n + 1)
    post_sd = 1.0 / np.sqrt(n + 1)
    data = ArrayDataset({"counts": x}).batch(64)
    result = fit_surrogate_posterior(
        energy, surrogate, surrogate.init(), lambda: iter(data),
        sample_size=32, num_steps=400, learning_rate=0.05,
        rel_tol=None, verbose=False, dtype=jnp.float64, seed=0,
    )
    loc = float(result.params["z"]["loc"][0, 0])
    sd = float(jax.nn.softplus(result.params["z"]["raw_scale"][0, 0]))
    np.testing.assert_allclose(loc, post_mean, atol=0.1)
    np.testing.assert_allclose(sd, post_sd, rtol=0.4)


def test_plateau_decays_lr_and_restores_best(capsys):
    x, surrogate, energy = _gaussian_problem()
    data = ArrayDataset({"counts": x}).batch(64)
    result = fit_surrogate_posterior(
        energy, surrogate, surrogate.init(), lambda: iter(data),
        sample_size=4, num_steps=60, learning_rate=0.2, decay_rate=0.99,
        patience=2, rel_tol=None, verbose=True, dtype=jnp.float64, seed=1,
    )
    out = capsys.readouterr().out
    assert "Initial loss:" in out
    assert "average-batch loss:" in out
    # with noisy small-sample ELBO at lr 0.2 plateaus must occur
    assert "loss plateau learning rate:" in out
    assert "Restoring from a checkpoint" in out
    assert result.learning_rate < 0.2


def test_prior_weight_scaling():
    x, surrogate, energy = _gaussian_problem()
    seen = {}

    def spy_energy(batch, samples, prior_weight):
        seen["pw"] = prior_weight
        return energy(batch, samples, prior_weight)

    data = ArrayDataset({"counts": x}).batch(64)
    fit_surrogate_posterior(
        spy_energy, surrogate, surrogate.init(), lambda: iter(data),
        dataset_size=1000, batch_size=50, sample_size=2, num_steps=1,
        verbose=False, dtype=jnp.float64,
    )
    assert seen["pw"] == 0.05  # batch_size / dataset_size


def test_waic_formula():
    # fabricated per-row ll: 2 rows, deterministic across "samples" except
    # a known spread on row 1
    lls = np.array([[-1.0, -2.0], [-1.0, -4.0], [-1.0, -3.0]])  # (S=3, B=2)

    class FakeSurrogate:
        def sample(self, params, key, shape):
            return {}

    out = waic(
        lambda batch, samples: jnp.asarray(lls),
        FakeSurrogate(), {}, lambda: iter([{"counts": np.zeros((2, 1))}]),
        num_samples=3,
    )
    from scipy.special import logsumexp

    lppd = logsumexp(lls, axis=0) - np.log(3)
    pwaic = lls.var(axis=0, ddof=1)
    expect = -2 * (lppd - pwaic)
    np.testing.assert_allclose(out["lppd"], lppd.sum(), rtol=1e-10)
    np.testing.assert_allclose(out["pwaic"], pwaic.sum(), rtol=1e-10)
    np.testing.assert_allclose(out["waic"], expect.sum(), rtol=1e-10)
    np.testing.assert_allclose(
        out["se"], np.sqrt(2 * expect.var()), rtol=1e-10
    )


def test_checkpoint_dir_writes_files(tmp_path):
    x, surrogate, energy = _gaussian_problem()
    data = ArrayDataset({"counts": x}).batch(64)
    result = fit_surrogate_posterior(
        energy, surrogate, surrogate.init(), lambda: iter(data),
        sample_size=4, num_steps=3, learning_rate=0.05, verbose=False,
        dtype=jnp.float64, checkpoint_dir=str(tmp_path),
    )
    import glob, os

    files = glob.glob(os.path.join(str(tmp_path), "*", "*.npz"))
    assert files, "no checkpoints written"


def test_aux_broadcast_shapes_and_unbiasedness():
    """aux-broadcast mode: broadcast vars carry no sample dim, logq stays
    (S,)-shaped, and the ELBO estimate agrees in expectation with the
    fully-independent estimator."""
    import jax.numpy as jnp
    from spmf_tpu import PoissonFactorization
    from spmf_tpu.data import ArrayDataset

    rng = np.random.default_rng(0)
    Xc = rng.poisson(1.0, (100, 6))
    data = ArrayDataset({"counts": Xc, "indices": np.arange(100)}).batch(100)
    m_ind = PoissonFactorization(latent_dim=2, feature_dim=6, u_tau_scale=0.1,
                                 dtype="float64", data=data)
    m_bc = PoissonFactorization(latent_dim=2, feature_dim=6, u_tau_scale=0.1,
                                dtype="float64", aux_broadcast=True, data=data)
    key = jax.random.PRNGKey(0)
    s, lq = m_bc._surrogate.sample_and_log_prob(m_bc.surrogate_params, key, (5,))
    assert s["u"].shape == (5, 6, 2)
    assert s["u_eta"].shape == (6, 2)  # broadcast: no sample dim
    assert lq.shape == (5,)
    batch = next(iter(data))
    lp = m_bc.unormalized_log_prob(data=batch, **s)
    assert lp.shape == (5,)

    # expectation agreement (same init params): average ELBO over many keys
    def elbo(m, key, n):
        s, lq = m._surrogate.sample_and_log_prob(m.surrogate_params, key, (n,))
        lp = m.unormalized_log_prob(data=batch, **s)
        return jnp.mean(lp - lq)

    keys = jax.random.split(jax.random.PRNGKey(1), 40)
    e_ind = np.mean([float(elbo(m_ind, k, 8)) for k in keys])
    e_bc = np.mean([float(elbo(m_bc, k, 8)) for k in keys])
    np.testing.assert_allclose(e_bc, e_ind, rtol=0.05)

    # and it trains
    losses = m_bc.fit(batched_data_factory=data, num_steps=2, learning_rate=0.1,
                      sample_size=4, verbose=False)
    assert np.isfinite(losses).all()


def test_nonfinite_loss_recovery():
    """Engine divergence path: a NaN epoch must restore best params and halve
    the learning rate rather than poisoning the run (SURVEY.md §2.9's
    plateau-restore doubling as divergence recovery)."""
    x, surrogate, energy = _gaussian_problem()
    bad = x.copy()
    bad[0] = np.nan
    seq = {"i": 0}

    def factory():
        seq["i"] += 1
        if seq["i"] == 3:  # third epoch diverges
            return iter(ArrayDataset({"counts": bad}).batch(64))
        return iter(ArrayDataset({"counts": x}).batch(64))

    result = fit_surrogate_posterior(
        energy, surrogate, surrogate.init(), factory,
        sample_size=8, num_steps=5, learning_rate=0.1, rel_tol=None,
        verbose=False, dtype=jnp.float64, seed=0,
    )
    # run survived the poisoned epoch: params finite, lr halved once
    flat, _ = jax.tree_util.tree_flatten(result.params)
    assert all(np.isfinite(np.asarray(a)).all() for a in flat)
    # lr decays in f32 exactly (matches the on-device hyperparam dtype)
    assert result.learning_rate == float(np.float32(0.1) * np.float32(0.5))
    assert any(not np.isfinite(l) for l in result.losses)
    assert np.isfinite(result.losses[-1])


def test_fused_composes_with_mesh_when_divisible():
    """r2: the fused kernel now composes with the mesh via shard_map
    (fused_poisson_loglik_sharded); _can_fuse only bails when shard_map
    cannot split the static batch evenly."""
    from spmf_tpu import PoissonFactorization
    from spmf_tpu.parallel import data_parallel_mesh

    m = PoissonFactorization(latent_dim=2, feature_dim=5, u_tau_scale=0.1,
                             dtype="float64", scale_columns=False,
                             fused_likelihood=True)
    assert m._can_fuse()
    m.mesh = data_parallel_mesh(2)
    assert m._can_fuse()                  # mesh no longer disables fusion
    assert m._can_fuse(batch_shape=(8, 5))   # 8 rows over dp=2: even split
    assert not m._can_fuse(batch_shape=(7, 5))  # uneven rows: XLA fallback


def test_nonfinite_initial_loss_does_not_poison_best_tracking():
    """If the very first evaluation is non-finite, finite later epochs must
    still register as improvements (nan best_loss would compare False
    forever)."""
    x, surrogate, energy = _gaussian_problem()
    bad = x.copy()
    bad[0] = np.nan
    seq = {"i": 0}

    def factory():
        seq["i"] += 1
        # the engine draws the FIRST factory call for the initial loss
        if seq["i"] == 1:
            return iter(ArrayDataset({"counts": bad}).batch(64))
        return iter(ArrayDataset({"counts": x}).batch(64))

    result = fit_surrogate_posterior(
        energy, surrogate, surrogate.init(), factory,
        sample_size=8, num_steps=4, learning_rate=0.1, rel_tol=None,
        verbose=False, dtype=jnp.float64, seed=0,
    )
    assert not np.isfinite(result.losses[0])
    finite = [l for l in result.losses[1:] if np.isfinite(l)]
    assert finite
    # best-params restore must reflect a finite epoch (loss improved over
    # the first finite epoch is not guaranteed, but params must be finite
    # and the final returned losses must include improvements)
    flat, _ = jax.tree_util.tree_flatten(result.params)
    assert all(np.isfinite(np.asarray(a)).all() for a in flat)


def test_device_batch_multihost_seam_matches_device_put():
    """VERDICT r2 #6: the multi-host feeding seam. Single-process it must
    reproduce the device_put path exactly (process_local_rows covers all
    rows, make_array_from_process_local_data assembles the same global
    array with the same sharding)."""
    from spmf_tpu.parallel import make_mesh
    from spmf_tpu.vi.minibatch import _device_batch

    mesh = make_mesh((4, 2), ("dp", "fp"))
    rng = np.random.default_rng(0)
    batch = {
        "counts": rng.poisson(1.0, (16, 8)).astype(np.float64),
        "indices": np.arange(16),
    }
    plain = _device_batch(batch, jnp.float64, mesh, multihost=False)
    seam = _device_batch(batch, jnp.float64, mesh, multihost=True)
    for k in batch:
        np.testing.assert_array_equal(np.asarray(seam[k]), np.asarray(plain[k]))
        assert seam[k].sharding == plain[k].sharding


def test_resumed_fit_advances_params():
    """Segmented/resumed fits must not freeze: the single-batch initial
    eval is display-only and must not seed best_loss (it is a different
    unit than the epoch averages it was compared against — near
    convergence, a fit whose first batch is easier than the dataset
    average returned its input params bit-unchanged)."""
    x, surrogate, energy = _gaussian_problem()
    data = ArrayDataset({"counts": x}).batch(64)
    params = surrogate.init()
    r1 = fit_surrogate_posterior(
        energy, surrogate, params, lambda: iter(data),
        sample_size=8, num_steps=3, learning_rate=0.05, rel_tol=None,
        verbose=False, dtype=jnp.float64, seed=0,
    )
    # snapshot before fitting again: the jitted step donates its input
    before = [np.asarray(a) for a in jax.tree_util.tree_leaves(
        jax.device_get(r1.params))]
    r2 = fit_surrogate_posterior(
        energy, surrogate, r1.params, lambda: iter(data),
        sample_size=8, num_steps=3, learning_rate=0.05, rel_tol=None,
        verbose=False, dtype=jnp.float64, seed=1, opt_state=r1.opt_state,
    )
    after = jax.tree_util.tree_leaves(r2.params)
    assert any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(before, after)
    ), "resumed fit returned its input params bit-unchanged"


def test_resume_from_checkpoint(tmp_path):
    """Preemption recovery (SURVEY.md §5.4 aux upgrade): fit with
    checkpointing, then resume a fresh run from the newest on-disk
    checkpoint — params restore exactly (best == last saved)."""
    x, surrogate, energy = _gaussian_problem()
    data = ArrayDataset({"counts": x}).batch(64)
    r1 = fit_surrogate_posterior(
        energy, surrogate, surrogate.init(), lambda: iter(data),
        sample_size=8, num_steps=4, learning_rate=0.1, rel_tol=None,
        verbose=False, dtype=jnp.float64, seed=0,
        checkpoint_dir=str(tmp_path),
    )
    assert r1.checkpoint_path is not None
    best = [np.asarray(a) for a in jax.tree_util.tree_leaves(
        jax.device_get(r1.params))]

    # the newest on-disk checkpoint holds exactly the best (returned) params
    import glob, os

    from spmf_tpu.utils.checkpoint import load_pytree

    newest = max(
        glob.glob(os.path.join(str(tmp_path), "**", "*.npz"), recursive=True),
        key=os.path.getmtime,
    )
    loaded = load_pytree(newest, like=jax.device_get(r1.params))
    for a, b in zip(best, jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_array_equal(a, np.asarray(b))

    # resume_from accepts the directory and restores those params before
    # training
    r2 = fit_surrogate_posterior(
        energy, surrogate, surrogate.init(), lambda: iter(data),
        sample_size=8, num_steps=1, learning_rate=0.1, rel_tol=None,
        verbose=False, dtype=jnp.float64, seed=0,
        resume_from=str(tmp_path),
    )
    # seed 0 + identical params => the resumed run's initial loss equals
    # an eval at r1's best params, not at the fresh init
    r1_eval = fit_surrogate_posterior(
        energy, surrogate, r1.params, lambda: iter(data),
        sample_size=8, num_steps=1, learning_rate=0.1, rel_tol=None,
        verbose=False, dtype=jnp.float64, seed=0,
    )
    np.testing.assert_allclose(r2.losses[0], r1_eval.losses[0], rtol=1e-12)


def test_stl_estimator_converges_to_same_posterior():
    """elbo_estimator='stl' (sticking the landing): unbiased, pathwise-only
    gradients — must converge to the same analytic posterior as the
    standard estimator, with a LOWER-variance gradient at the optimum."""
    x, surrogate, energy = _gaussian_problem()
    n = len(x)
    post_mean = x.sum() / (n + 1)
    data = ArrayDataset({"counts": x}).batch(64)
    result = fit_surrogate_posterior(
        energy, surrogate, surrogate.init(), lambda: iter(data),
        sample_size=32, num_steps=300, learning_rate=0.05,
        rel_tol=None, verbose=False, dtype=jnp.float64, seed=0,
        elbo_estimator="stl",
    )
    loc = float(result.params["z"]["loc"][0, 0])
    np.testing.assert_allclose(loc, post_mean, atol=0.1)

    # gradient variance at the (near-)optimum: STL strictly smaller
    batch = {"counts": jnp.asarray(x)}

    def grad_at(params, key, stl):
        def loss(p):
            if stl:
                p_stop = jax.tree_util.tree_map(jax.lax.stop_gradient, p)
                s, lq = surrogate.sample_and_log_prob(
                    p, key, (4,), logq_params=p_stop)
            else:
                s, lq = surrogate.sample_and_log_prob(p, key, (4,))
            return -jnp.mean(energy(batch, s, 1.0) - lq)

        g = jax.grad(loss)(params)
        return float(g["z"]["raw_scale"][0, 0])

    keys = jax.random.split(jax.random.PRNGKey(7), 64)
    g_std = np.var([grad_at(result.params, k, False) for k in keys])
    g_stl = np.var([grad_at(result.params, k, True) for k in keys])
    assert g_stl < g_std, (g_stl, g_std)


def test_stl_logq_params_seam_matches_log_prob_and_is_stable():
    """logq_params: the density uses the second pytree while the sample
    path stays live; the value equals surrogate.log_prob at those params
    (same draws), computed WITHOUT a constrained-space inverse."""
    from spmf_tpu import PoissonFactorization
    from spmf_tpu.data import ArrayDataset

    rng = np.random.default_rng(0)
    Xc = rng.poisson(1.0, (50, 5))
    data = ArrayDataset({"counts": Xc, "indices": np.arange(50)}).batch(50)
    m = PoissonFactorization(latent_dim=2, feature_dim=5, u_tau_scale=0.1,
                             dtype="float64", data=data)
    sur = m._surrogate
    p = m.surrogate_params
    # a DIFFERENT params pytree for the density
    p2 = jax.tree_util.tree_map(lambda a: a + 0.1, p)
    key = jax.random.PRNGKey(4)
    s, lq = sur.sample_and_log_prob(p, key, (3,), logq_params=p2)
    # same draws (same key/path), density at p2: agrees with the
    # constrained-space log_prob away from the underflow region
    lq_ref = sur.log_prob(p2, s)
    np.testing.assert_allclose(np.asarray(lq), np.asarray(lq_ref),
                               rtol=1e-8)
    # and the samples themselves equal the plain path's samples
    s0, _ = sur.sample_and_log_prob(p, key, (3,))
    for n in s0:
        np.testing.assert_allclose(np.asarray(s[n]), np.asarray(s0[n]),
                                   rtol=1e-12)


def test_resume_checkpoint_tags_continue_monotonic(tmp_path):
    """A resumed run's checkpoint tags continue the restored run's epoch
    numbering, so tag-major ordering stays monotonic across repeated
    preemptions — a second resume must prefer the newest run's checkpoint
    over a longer-lived earlier run's."""
    import glob
    import os
    import re

    x, surrogate, energy = _gaussian_problem()
    data = ArrayDataset({"counts": x}).batch(64)

    def tag(p):
        return int(re.search(r"-(\d+)\.npz$", os.path.basename(p)).group(1))

    def files():
        return set(glob.glob(os.path.join(str(tmp_path), "**", "*.npz"),
                             recursive=True))

    # run 1 writes params-only checkpoints: run 2 then resumes with a
    # fresh best_loss (inf), so its epoch 1 always improves and at least
    # one new checkpoint is written regardless of run 1's best (a
    # full-state restore would carry run 1's best_loss and make run 2's
    # write stochastic — the full-state path has its own tests)
    fit_surrogate_posterior(
        energy, surrogate, surrogate.init(), lambda: iter(data),
        sample_size=8, num_steps=3, learning_rate=0.1, rel_tol=None,
        verbose=False, dtype=jnp.float64, seed=0,
        checkpoint_dir=str(tmp_path), checkpoint_full_state=False,
    )
    first = files()
    assert first
    hi = max(tag(p) for p in first)
    # run 2 resumes and checkpoints into the same directory (the
    # preemption-recovery layout)
    fit_surrogate_posterior(
        energy, surrogate, surrogate.init(), lambda: iter(data),
        sample_size=8, num_steps=2, learning_rate=0.1, rel_tol=None,
        verbose=False, dtype=jnp.float64, seed=1,
        checkpoint_dir=str(tmp_path), resume_from=str(tmp_path),
    )
    new = files() - first
    assert new
    assert min(tag(p) for p in new) > hi


def test_epoch_scan_fast_path_converges_and_is_deterministic():
    """The whole-epoch lax.scan path (device-resident dataset, single
    unmeshed device) must auto-activate, train to the same analytic
    posterior as the general loop, handle a remainder batch inside the
    jit, and be deterministic in `seed` (keys are pre-derived host-side,
    zero per-epoch RNG dispatches)."""
    from spmf_tpu.data import DeviceArrayDataset, as_data_factory

    x, surrogate, energy = _gaussian_problem()
    n = len(x)
    post_mean = x.sum() / (n + 1)
    post_sd = 1.0 / np.sqrt(n + 1)

    def run(**kw):
        # 64 rows = 2 full batches of 24 + a 16-row remainder batch
        ds = DeviceArrayDataset({"counts": x}, batch_size=24, shuffle=True,
                                seed=0)
        return fit_surrogate_posterior(
            energy, surrogate, surrogate.init(), as_data_factory(ds),
            sample_size=32, num_steps=300, learning_rate=0.05,
            rel_tol=None, verbose=False, dtype=jnp.float64, seed=0, **kw,
        )

    result = run()
    assert result.extras["epoch_scan"] is True
    loc = float(result.params["z"]["loc"][0, 0])
    sd = float(jax.nn.softplus(result.params["z"]["raw_scale"][0, 0]))
    np.testing.assert_allclose(loc, post_mean, atol=0.1)
    # NOTE the converged sd is NOT the analytic 1/sqrt(n+1): with several
    # batches per epoch the engine recounts the prior/entropy per batch
    # under per-batch row normalization (a tempered posterior — reference
    # loss semantics). The scan path must match the GENERAL loop's
    # optimum on the identical config, not the full-batch analytic one.
    general = run(epoch_scan=False)
    assert general.extras["epoch_scan"] is False
    g_loc = float(general.params["z"]["loc"][0, 0])
    g_sd = float(jax.nn.softplus(general.params["z"]["raw_scale"][0, 0]))
    # The two paths are on INDEPENDENT shuffle streams by design (the scan
    # pre-derives epoch keys from the engine chain; the general loop uses
    # the dataset's seed+epoch stream), so their converged locs agree only
    # statistically. Measured seed-scatter of the converged loc is ~0.10
    # peak-to-peak (scan arm, 4 seeds); atol matches that. An earlier 0.05
    # was a lucky draw — it broke when peek_batch stopped consuming the
    # display-eval shuffle epoch and shifted the general loop's stream.
    np.testing.assert_allclose(loc, g_loc, atol=0.15)
    np.testing.assert_allclose(sd, g_sd, rtol=0.25)
    result2 = run()
    assert result.losses == result2.losses


def test_epoch_scan_validates_eligibility():
    """epoch_scan=True on a host-streamed factory must raise (the fast
    path needs device-resident tensors), and the general loop must report
    epoch_scan False."""
    import pytest

    x, surrogate, energy = _gaussian_problem()
    data = ArrayDataset({"counts": x}).batch(32)
    with pytest.raises(ValueError, match="epoch_scan"):
        fit_surrogate_posterior(
            energy, surrogate, surrogate.init(), lambda: iter(data),
            num_steps=1, verbose=False, dtype=jnp.float64, epoch_scan=True,
        )
    result = fit_surrogate_posterior(
        energy, surrogate, surrogate.init(), lambda: iter(data),
        num_steps=2, verbose=False, dtype=jnp.float64,
    )
    assert result.extras["epoch_scan"] is False


def test_epoch_chunk_matches_single_epoch_trajectory():
    """K-epoch device-resident chunks (best/plateau/divergence control
    flow as on-device selects) must reproduce the single-epoch scan
    trajectory EXACTLY — same losses, same final best params, same lr —
    including across plateau restores (patience=2 forces several)."""
    from spmf_tpu.data import DeviceArrayDataset, as_data_factory

    x, surrogate, energy = _gaussian_problem()

    def run(**kw):
        ds = DeviceArrayDataset({"counts": x}, batch_size=32, shuffle=True,
                                seed=0)
        return fit_surrogate_posterior(
            energy, surrogate, surrogate.init(), as_data_factory(ds),
            sample_size=8, num_steps=60, learning_rate=0.05, patience=2,
            rel_tol=None, verbose=False, dtype=jnp.float64, seed=0, **kw,
        )

    single = run(epoch_chunk=1)
    chunked = run(epoch_chunk=5)
    assert single.extras["epoch_scan"] and chunked.extras["epoch_scan"]
    assert chunked.losses == single.losses
    for a, b in zip(jax.tree_util.tree_leaves(single.params),
                    jax.tree_util.tree_leaves(chunked.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert single.learning_rate == chunked.learning_rate
    # several plateaus must actually have occurred for this to mean much
    assert single.learning_rate < 0.05


def test_sparse_epoch_scan_path():
    """The whole-epoch scan over a DeviceSparseCounts source (AUTO since
    r5): the epoch's COO stream is decoded once in-trace and per-batch
    assembly runs INSIDE lax.scan as dynamic slices. Auto must engage it
    on a single process / trivial mesh (the epoch decode made the scan
    faster than the general loop — minibatch.py:528, sparse_bench r5);
    epoch_scan=False must opt back out; epoch_chunk must be
    trajectory-identical (f64) riding the same machinery; and the
    static-pad overflow audit must still fire (the totals leave the
    scan as an array)."""
    import pytest

    from spmf_tpu import PoissonFactorization
    from spmf_tpu.data import SparseCounts

    rng = np.random.default_rng(3)
    X = (rng.random((96, 12)) < 0.4) * rng.poisson(2.0, (96, 12))

    def run(max_nnz=None, **kw):
        m = PoissonFactorization(latent_dim=2, feature_dim=12,
                                 u_tau_scale=0.1, dtype="float64",
                                 scale_columns=False)
        dev = SparseCounts.from_dense(X).shuffle(seed=0).batch(
            32, drop_remainder=True).to_device(max_nnz=max_nnz)
        losses = m.fit(batched_data_factory=dev, num_steps=8,
                       learning_rate=0.05, sample_size=4, verbose=False,
                       rel_tol=None, seed=0, **kw)
        return m, losses

    m, losses = run(epoch_scan=True)
    assert m.last_fit.extras["epoch_scan"] is True
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]

    # auto engages the sparse scan (r5 default); epoch_scan=False opts out
    m_g, losses_g = run()
    assert m_g.last_fit.extras["epoch_scan"] is True
    m_off, _ = run(epoch_scan=False)
    assert m_off.last_fit.extras["epoch_scan"] is False
    # same optimum neighborhood (independent shuffle streams by design —
    # statistical agreement)
    np.testing.assert_allclose(losses[-1], losses_g[-1],
                               rtol=0.1)

    # epoch_chunk rides the sparse scan with identical trajectories
    _, l1 = run(epoch_scan=True, epoch_chunk=1)
    _, l4 = run(epoch_scan=True, epoch_chunk=4)
    assert list(l1) == list(l4)

    # a forced-undersized pad must be caught by the overflow audit
    with pytest.raises(ValueError, match="overflowed"):
        run(epoch_scan=True, max_nnz=64)


def test_epoch_chunk_requires_scan_path():
    import pytest

    x, surrogate, energy = _gaussian_problem()
    data = ArrayDataset({"counts": x}).batch(32)
    with pytest.raises(ValueError, match="epoch_chunk"):
        fit_surrogate_posterior(
            energy, surrogate, surrogate.init(), lambda: iter(data),
            num_steps=4, verbose=False, dtype=jnp.float64, epoch_chunk=4,
        )


def test_epoch_chunk_checkpoints_best_params(tmp_path):
    """Chunked fits write one checkpoint per chunk (at the last improving
    epoch) and the newest on-disk file holds exactly the returned best
    params — so preemption recovery keeps working at chunk granularity."""
    import glob
    import os

    from spmf_tpu.data import DeviceArrayDataset, as_data_factory
    from spmf_tpu.utils.checkpoint import load_pytree

    x, surrogate, energy = _gaussian_problem()
    ds = DeviceArrayDataset({"counts": x}, batch_size=32, shuffle=True,
                            seed=0)
    result = fit_surrogate_posterior(
        energy, surrogate, surrogate.init(), as_data_factory(ds),
        sample_size=8, num_steps=12, learning_rate=0.05, rel_tol=None,
        verbose=False, dtype=jnp.float64, seed=0, epoch_chunk=4,
        checkpoint_dir=str(tmp_path),
    )
    assert result.extras["epoch_scan"]
    files = glob.glob(os.path.join(str(tmp_path), "**", "*.npz"),
                      recursive=True)
    # 12 epochs / chunks of 4 => at most 3 checkpoint writes (vs up to 12
    # on the single-epoch path), at least one (the loss must improve once)
    assert 1 <= len(files) <= 3
    newest = max(files, key=os.path.getmtime)
    loaded = load_pytree(newest, like=jax.device_get(result.params))
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(result.params)),
                    jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # and a fresh run resumes from that checkpoint through the chunk path
    r2 = fit_surrogate_posterior(
        energy, surrogate, surrogate.init(), as_data_factory(ds),
        sample_size=8, num_steps=4, learning_rate=0.05, rel_tol=None,
        verbose=False, dtype=jnp.float64, seed=0, epoch_chunk=4,
        resume_from=str(tmp_path),
    )
    assert r2.losses[-1] <= result.losses[-1] + 1e-6


def test_epoch_chunk_clamps_and_reports():
    """An explicit epoch_chunk larger than num_steps is clamped to one
    chunk covering the remainder (the user opted in; silently running
    every epoch singly would be a trap), and extras['epoch_chunk'] reports
    the largest chunk that actually ran."""
    from spmf_tpu.data import DeviceArrayDataset, as_data_factory

    x, surrogate, energy = _gaussian_problem()

    def run(**kw):
        ds = DeviceArrayDataset({"counts": x}, batch_size=32, shuffle=True,
                                seed=0)
        return fit_surrogate_posterior(
            energy, surrogate, surrogate.init(), as_data_factory(ds),
            sample_size=8, num_steps=12, learning_rate=0.05, rel_tol=None,
            verbose=False, dtype=jnp.float64, seed=0, **kw,
        )

    clamped = run(epoch_chunk=16)
    assert clamped.extras["epoch_chunk"] == 12
    assert len(clamped.losses) == 13  # initial + 12 epochs

    single = run(epoch_chunk=1)
    assert single.extras["epoch_chunk"] == 0
    assert clamped.losses == single.losses


def test_epoch_chunk_adaptive_engages_on_fast_epochs():
    """The default (epoch_chunk=None) engages K=8 chunks once two single
    epochs have measured fast (<1 s) and >= 3 chunks of work remain —
    and leaves the tail to single-epoch dispatches (no second scan
    compile)."""
    from spmf_tpu.data import DeviceArrayDataset, as_data_factory

    x, surrogate, energy = _gaussian_problem()
    ds = DeviceArrayDataset({"counts": x}, batch_size=32, shuffle=True,
                            seed=0)
    result = fit_surrogate_posterior(
        energy, surrogate, surrogate.init(), as_data_factory(ds),
        sample_size=8, num_steps=29, learning_rate=0.05, rel_tol=None,
        verbose=False, dtype=jnp.float64, seed=0,
    )
    # 2 single + 3 chunks of 8 + 3-epoch tail (27 < 3*8 remaining at the
    # tail, so the adaptive path falls back to singles)
    assert result.extras["epoch_chunk"] == 8
    assert len(result.losses) == 30


def test_epoch_chunk_f32_stays_on_track():
    """In f32 the chunk decisions are made in the compute dtype on device
    (documented contract: 1-ulp ties may differ from the host path), but
    the trajectory must stay statistically on track: same losses to ~1e-5
    relative and the same monotone improvement."""
    from spmf_tpu.data import DeviceArrayDataset, as_data_factory

    x, surrogate, energy = _gaussian_problem()

    def run(**kw):
        ds = DeviceArrayDataset({"counts": x.astype(np.float32)},
                                batch_size=32, shuffle=True, seed=0)
        return fit_surrogate_posterior(
            energy, surrogate, surrogate.init(), as_data_factory(ds),
            sample_size=8, num_steps=20, learning_rate=0.05, rel_tol=None,
            verbose=False, dtype=jnp.float32, seed=0, **kw,
        )

    single = run(epoch_chunk=1)
    chunked = run(epoch_chunk=5)
    assert chunked.extras["epoch_chunk"] == 5
    np.testing.assert_allclose(chunked.losses, single.losses, rtol=1e-4)
    assert chunked.losses[-1] < chunked.losses[1]


def test_full_state_checkpoint_and_resume(tmp_path):
    """Default checkpoints carry the Adam moments + control state (lr,
    best_loss, stall); a resume continues them — the optimizer does not
    re-warm from zero moments and the lr does not reset to the argument.
    The file stays loadable by params-only load_pytree (back-compat)."""
    import glob
    import os

    from spmf_tpu.utils.checkpoint import load_fit_state, load_pytree

    x, surrogate, energy = _gaussian_problem()
    data = ArrayDataset({"counts": x}).batch(64)
    r1 = fit_surrogate_posterior(
        energy, surrogate, surrogate.init(), lambda: iter(data),
        sample_size=8, num_steps=5, learning_rate=0.07, rel_tol=None,
        verbose=False, dtype=jnp.float64, seed=0,
        checkpoint_dir=str(tmp_path),
    )
    newest = max(
        glob.glob(os.path.join(str(tmp_path), "**", "*.npz"), recursive=True),
        key=os.path.getmtime,
    )
    like = jax.device_get(r1.params)
    # params-only consumers read the file unchanged
    loaded_params = load_pytree(newest, like=like)
    for a, b in zip(jax.tree_util.tree_leaves(like),
                    jax.tree_util.tree_leaves(loaded_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the full loader returns optimizer leaves and control metadata
    _, opt_leaves, meta = load_fit_state(newest, params_like=like)
    assert opt_leaves is not None
    assert len(opt_leaves) == len(jax.tree_util.tree_leaves(r1.opt_state))
    assert meta is not None
    assert set(meta) >= {"lr", "best_loss", "stall", "epoch"}
    assert meta["best_loss"] == min(r1.losses[1:])

    # resume: the checkpoint lr wins over the learning_rate argument, and
    # the Adam step count continues from the restored moments
    r2 = fit_surrogate_posterior(
        energy, surrogate, surrogate.init(), lambda: iter(data),
        sample_size=8, num_steps=1, learning_rate=0.5, rel_tol=None,
        verbose=False, dtype=jnp.float64, seed=3,
        resume_from=str(tmp_path),
    )
    assert r2.learning_rate == meta["lr"]

    def adam_count(opt_state):
        # the inner adam state's step counter is the only int leaf
        ints = [np.asarray(l) for l in jax.tree_util.tree_leaves(opt_state)
                if np.issubdtype(np.asarray(l).dtype, np.integer)]
        assert ints, "no integer leaf in the optimizer state"
        return int(max(int(i) for i in ints))

    # r1 ran 5 single-batch epochs; the checkpoint captures the count at
    # its last improving epoch (>=1). One more epoch on resume continues
    # from there rather than restarting at 1
    assert adam_count(r2.opt_state) == meta["epoch"] + 1


def test_params_only_checkpoint_opt_out_and_legacy_resume(tmp_path):
    """checkpoint_full_state=False writes params-only files; resuming one
    restores params but keeps the argument lr and a fresh best (legacy
    semantics, also the path for pre-full-state checkpoints)."""
    import glob
    import os

    x, surrogate, energy = _gaussian_problem()
    data = ArrayDataset({"counts": x}).batch(64)
    fit_surrogate_posterior(
        energy, surrogate, surrogate.init(), lambda: iter(data),
        sample_size=8, num_steps=3, learning_rate=0.1, rel_tol=None,
        verbose=False, dtype=jnp.float64, seed=0,
        checkpoint_dir=str(tmp_path), checkpoint_full_state=False,
    )
    newest = max(
        glob.glob(os.path.join(str(tmp_path), "**", "*.npz"), recursive=True),
        key=os.path.getmtime,
    )
    with np.load(newest) as zf:
        assert "opt_0" not in zf and "__fit_state__" not in zf
    r2 = fit_surrogate_posterior(
        energy, surrogate, surrogate.init(), lambda: iter(data),
        sample_size=8, num_steps=1, learning_rate=0.3, rel_tol=None,
        verbose=False, dtype=jnp.float64, seed=1,
        resume_from=str(tmp_path), checkpoint_dir=str(tmp_path),
    )
    assert r2.learning_rate == np.float32(0.3)
    # fresh best=inf: the single epoch improves and writes a checkpoint
    files = glob.glob(os.path.join(str(tmp_path), "**", "*.npz"),
                      recursive=True)
    assert len(files) >= 2


def test_explicit_opt_state_wins_over_full_checkpoint(tmp_path):
    """Passing opt_state= alongside a full-state resume keeps the explicit
    argument (and the argument lr), with a warning."""
    import warnings

    x, surrogate, energy = _gaussian_problem()
    data = ArrayDataset({"counts": x}).batch(64)
    fit_surrogate_posterior(
        energy, surrogate, surrogate.init(), lambda: iter(data),
        sample_size=8, num_steps=3, learning_rate=0.07, rel_tol=None,
        verbose=False, dtype=jnp.float64, seed=0,
        checkpoint_dir=str(tmp_path),
    )
    # a fresh opt_state for the same params/optimizer config
    import optax

    fresh = fit_surrogate_posterior(
        energy, surrogate, surrogate.init(), lambda: iter(data),
        sample_size=2, num_steps=1, learning_rate=0.3, rel_tol=None,
        verbose=False, dtype=jnp.float64, seed=2,
    ).opt_state
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        r = fit_surrogate_posterior(
            energy, surrogate, surrogate.init(), lambda: iter(data),
            sample_size=8, num_steps=1, learning_rate=0.3, rel_tol=None,
            verbose=False, dtype=jnp.float64, seed=1,
            resume_from=str(tmp_path), opt_state=fresh,
        )
    assert any("opt_state" in str(x.message) for x in w)
    assert r.learning_rate == np.float32(0.3)


def test_full_state_resume_through_chunk_path(tmp_path):
    """The restored control state rides into the on-device chunk carry:
    a chunked resume continues from the checkpoint lr/best rather than
    resetting them."""
    from spmf_tpu.data import DeviceArrayDataset, as_data_factory
    from spmf_tpu.utils.checkpoint import load_fit_state

    import glob
    import os

    x, surrogate, energy = _gaussian_problem()
    ds = DeviceArrayDataset({"counts": x}, batch_size=32, shuffle=True,
                            seed=0)
    fit_surrogate_posterior(
        energy, surrogate, surrogate.init(), as_data_factory(ds),
        sample_size=8, num_steps=8, learning_rate=0.07, rel_tol=None,
        verbose=False, dtype=jnp.float64, seed=0, epoch_chunk=4,
        checkpoint_dir=str(tmp_path),
    )
    newest = max(
        glob.glob(os.path.join(str(tmp_path), "**", "*.npz"), recursive=True),
        key=os.path.getmtime,
    )
    _, opt_leaves, meta = load_fit_state(
        newest, params_like=jax.device_get(surrogate.init()))
    assert opt_leaves is not None and meta is not None
    r2 = fit_surrogate_posterior(
        energy, surrogate, surrogate.init(), as_data_factory(ds),
        sample_size=8, num_steps=4, learning_rate=0.5, rel_tol=None,
        verbose=False, dtype=jnp.float64, seed=5, epoch_chunk=4,
        resume_from=str(tmp_path),
    )
    # no plateau in 4 easy epochs: the lr is still the restored one
    assert r2.learning_rate == meta["lr"]


def test_renamed_full_checkpoint_keeps_epoch_numbering(tmp_path):
    """The recorded global epoch in the full-state metadata backs up the
    filename tag: resuming from a renamed/copied checkpoint file still
    continues the tag numbering (filename parsing alone would reset to 0
    and break newest-checkpoint resolution on the next resume)."""
    import glob
    import os
    import re
    import shutil

    x, surrogate, energy = _gaussian_problem()
    data = ArrayDataset({"counts": x}).batch(64)
    fit_surrogate_posterior(
        energy, surrogate, surrogate.init(), lambda: iter(data),
        sample_size=8, num_steps=4, learning_rate=0.1, rel_tol=None,
        verbose=False, dtype=jnp.float64, seed=0,
        checkpoint_dir=str(tmp_path / "run1"),
    )
    newest = max(
        glob.glob(os.path.join(str(tmp_path / "run1"), "**", "*.npz"),
                  recursive=True),
        key=os.path.getmtime,
    )
    hi = int(re.search(r"-(\d+)\.npz$", newest).group(1))
    # a copied file with no epoch tag in the name
    renamed = tmp_path / "best.npz"
    shutil.copy(newest, renamed)
    fit_surrogate_posterior(
        energy, surrogate, surrogate.init(), lambda: iter(data),
        sample_size=8, num_steps=2, learning_rate=0.1, rel_tol=None,
        verbose=False, dtype=jnp.float64, seed=7,
        resume_from=str(renamed), checkpoint_dir=str(tmp_path / "run2"),
        checkpoint_full_state=False,  # run 2's own writes are irrelevant
    )
    new = glob.glob(os.path.join(str(tmp_path / "run2"), "**", "*.npz"),
                    recursive=True)
    if new:  # written only if some epoch improved on the restored best
        tags = [int(re.search(r"-(\d+)\.npz$", os.path.basename(p)).group(1))
                for p in new]
        assert min(tags) > hi


def test_resume_key_stream_decorrelated_but_deterministic(tmp_path):
    """Resumed runs fold the restored global epoch into the training key
    chain: same seed + same checkpoint gives the same continuation
    (determinism), but the continuation does not replay the original
    run's per-epoch keys from index 0 (decorrelation). The display-only
    initial eval stays on the unfolded chain (comparable across runs)."""
    x, surrogate, energy = _gaussian_problem()
    data = ArrayDataset({"counts": x}).batch(64)
    r1 = fit_surrogate_posterior(
        energy, surrogate, surrogate.init(), lambda: iter(data),
        sample_size=8, num_steps=3, learning_rate=0.05, rel_tol=None,
        verbose=False, dtype=jnp.float64, seed=0,
        checkpoint_dir=str(tmp_path),
    )

    def resumed():
        return fit_surrogate_posterior(
            energy, surrogate, surrogate.init(), lambda: iter(data),
            sample_size=8, num_steps=2, learning_rate=0.05, rel_tol=None,
            verbose=False, dtype=jnp.float64, seed=0,
            resume_from=str(tmp_path),
        )

    a, b = resumed(), resumed()
    np.testing.assert_array_equal(a.losses, b.losses)  # deterministic
    # a fresh (non-resumed) run from the same params and seed draws the
    # ORIGINAL epoch-1 key; the resumed run must not replay it
    fresh = fit_surrogate_posterior(
        energy, surrogate, r1.params, lambda: iter(data),
        sample_size=8, num_steps=2, learning_rate=0.05, rel_tol=None,
        verbose=False, dtype=jnp.float64, seed=0,
    )
    # same params, same displayed initial eval...
    np.testing.assert_allclose(a.losses[0], fresh.losses[0], rtol=1e-12)
    # ...but decorrelated training keys from epoch 1 on
    assert a.losses[1] != fresh.losses[1]


def test_preemption_resume_matches_uninterrupted_quality(tmp_path):
    """End-to-end preemption drill (SURVEY.md §5.3/5.4): interrupt a fit
    halfway, resume from the full-state checkpoint, and reach the same
    quality as the uninterrupted run — the restored Adam moments, lr, and
    best tracking make the second half a continuation, not a warm
    restart."""
    x, surrogate, energy = _gaussian_problem()
    data = ArrayDataset({"counts": x}).batch(64)
    full = fit_surrogate_posterior(
        energy, surrogate, surrogate.init(), lambda: iter(data),
        sample_size=16, num_steps=40, learning_rate=0.1, rel_tol=None,
        verbose=False, dtype=jnp.float64, seed=0,
    )
    # interrupt well before convergence so the continuation does real work
    head = fit_surrogate_posterior(
        energy, surrogate, surrogate.init(), lambda: iter(data),
        sample_size=16, num_steps=6, learning_rate=0.1, rel_tol=None,
        verbose=False, dtype=jnp.float64, seed=0,
        checkpoint_dir=str(tmp_path),
    )
    resumed = fit_surrogate_posterior(
        energy, surrogate, surrogate.init(), lambda: iter(data),
        sample_size=16, num_steps=34, learning_rate=0.1, rel_tol=None,
        verbose=False, dtype=jnp.float64, seed=0,
        resume_from=str(tmp_path),
    )
    # the resumed leg continued descending past the interruption point
    assert min(resumed.losses[1:]) < min(head.losses[1:])
    # and lands at the uninterrupted run's quality (same total epochs);
    # trajectories differ (fresh keys after the fold), so compare the
    # converged level, not the path
    np.testing.assert_allclose(
        min(resumed.losses[1:]), min(full.losses[1:]), rtol=0.02
    )


def test_full_state_chunk_resume_f32_uses_device_carry(tmp_path):
    """f32 + epoch_chunk: the checkpoint control state comes from the
    on-device carry scalars (not the host replay's f64 means), so the
    resumed chunk carry is seeded with exactly the values the device held
    at save time."""
    import glob
    import os

    from spmf_tpu.data import DeviceArrayDataset, as_data_factory
    from spmf_tpu.utils.checkpoint import load_fit_state

    x, surrogate, energy = _gaussian_problem()
    ds = DeviceArrayDataset({"counts": x.astype(np.float32)},
                            batch_size=32, shuffle=True, seed=0)
    r1 = fit_surrogate_posterior(
        energy, surrogate, surrogate.init(), as_data_factory(ds),
        sample_size=8, num_steps=8, learning_rate=0.05, rel_tol=None,
        verbose=False, dtype=jnp.float32, seed=0, epoch_chunk=4,
        checkpoint_dir=str(tmp_path),
    )
    assert r1.extras["epoch_chunk"] == 4
    newest = max(
        glob.glob(os.path.join(str(tmp_path), "**", "*.npz"), recursive=True),
        key=os.path.getmtime,
    )
    _, opt_leaves, meta = load_fit_state(
        newest, params_like=jax.device_get(r1.params))
    assert opt_leaves is not None
    # the recorded best_loss is an f32 device scalar: it round-trips
    # through float64 JSON exactly and must equal one of the f32 epoch
    # means the device computed (the best one)
    assert np.float32(meta["best_loss"]) == np.float32(min(r1.losses[1:]))
    r2 = fit_surrogate_posterior(
        energy, surrogate, surrogate.init(), as_data_factory(ds),
        sample_size=8, num_steps=4, learning_rate=0.5, rel_tol=None,
        verbose=False, dtype=jnp.float32, seed=2, epoch_chunk=4,
        resume_from=str(tmp_path),
    )
    assert r2.learning_rate == meta["lr"]
    assert np.isfinite(r2.losses).all()


def test_keyboard_interrupt_returns_best_so_far(capsys):
    """Graceful interrupt: a KeyboardInterrupt mid-fit (Ctrl-C/SIGINT on a
    long run) returns a normal FitResult with the best params reached so
    far and extras['interrupted']=True, instead of losing the in-memory
    result."""
    x, surrogate, energy = _gaussian_problem()
    calls = {"n": 0}

    def factory():
        calls["n"] += 1
        if calls["n"] == 4:  # first call is the initial-loss batch
            raise KeyboardInterrupt
        return iter(ArrayDataset({"counts": x}).batch(64))

    result = fit_surrogate_posterior(
        energy, surrogate, surrogate.init(), factory,
        sample_size=8, num_steps=50, learning_rate=0.05, rel_tol=None,
        verbose=True, dtype=jnp.float64, seed=0,
    )
    assert result.extras["interrupted"]
    assert len(result.losses) == 3  # initial + 2 completed epochs
    assert np.isfinite(
        np.asarray(jax.tree_util.tree_leaves(result.params)[0])).all()
    assert "Interrupted at epoch" in capsys.readouterr().out
