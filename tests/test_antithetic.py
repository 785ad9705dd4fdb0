"""Antithetic ELBO sampling (``fit(antithetic=True)``): mirrored base
draws across the sample axis. Checks the mirror structure, marginal laws,
log q exactness at the mirrored draws, estimator unbiasedness, and the
engine threading."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spmf_tpu import bijectors as tfb
from spmf_tpu.ops.gamma import wilson_hilferty_gamma
from spmf_tpu.vi.minibatch import fit_surrogate_posterior
from spmf_tpu.vi.surrogates import (
    SurrogatePosterior,
    TrainableInverseGamma,
    TrainableNormal,
    TransformedSurrogate,
)

from test_engine import _gaussian_problem


def _mixed_surrogate():
    return SurrogatePosterior(
        {
            "a": TransformedSurrogate(
                TrainableNormal(1.5 * np.ones((3, 2)), 0.7 * np.ones((3, 2)), 2),
                tfb.Identity(),
            ),
            "b": TransformedSurrogate(
                TrainableNormal(-2.0 * np.ones((4,)), 0.3 * np.ones((4,)), 1),
                tfb.Softplus(),
            ),
            # concentration 5: the IG variance is finite (needs a>2), so
            # the moment comparison below is statistically meaningful
            "t": TransformedSurrogate(
                TrainableInverseGamma(
                    5.0 * np.ones((5,)), 1.0 * np.ones((5,)), 1
                ),
                tfb.Softplus(),
            ),
        },
        gamma_sampler="fast",
    )


def test_normal_pairs_mirror_exactly():
    sur = _mixed_surrogate()
    params = sur.init()
    S = 6
    values, logq = sur.sample_and_log_prob(
        params, jax.random.PRNGKey(0), (S,), antithetic=True
    )
    # identity bijector: x_{s+S/2} = 2*loc - x_s exactly
    loc = params["a"]["loc"]
    np.testing.assert_allclose(
        np.asarray(values["a"][: S // 2] + values["a"][S // 2 :]),
        np.broadcast_to(2 * np.asarray(loc), (S // 2,) + loc.shape),
        rtol=1e-12,
    )
    # softplus bijector: the PRE-bijector draws mirror around loc
    x = np.log(np.expm1(np.asarray(values["b"], np.float64)))
    locb = np.asarray(params["b"]["loc"])
    np.testing.assert_allclose(
        x[: S // 2] + x[S // 2 :],
        np.broadcast_to(2 * locb, (S // 2,) + locb.shape),
        atol=1e-6,
    )
    assert logq.shape == (S,)
    assert np.isfinite(np.asarray(logq)).all()


def test_logq_exact_at_mirrored_draws():
    sur = _mixed_surrogate()
    params = sur.init()
    values, logq = sur.sample_and_log_prob(
        params, jax.random.PRNGKey(1), (8,), antithetic=True
    )
    recomputed = sur.log_prob(params, values)
    np.testing.assert_allclose(
        np.asarray(logq), np.asarray(recomputed), rtol=1e-8
    )


def test_antithetic_marginals_match_independent():
    """Each mirrored draw must keep its marginal law: moments of large
    antithetic and independent sample sets agree."""
    sur = _mixed_surrogate()
    params = sur.init()
    S = 4096
    v_anti, _ = sur.sample_and_log_prob(
        params, jax.random.PRNGKey(2), (S,), antithetic=True
    )
    v_ind, _ = sur.sample_and_log_prob(
        params, jax.random.PRNGKey(3), (S,), antithetic=False
    )
    for name in ("a", "b", "t"):
        a = np.asarray(v_anti[name], np.float64)
        b = np.asarray(v_ind[name], np.float64)
        np.testing.assert_allclose(a.mean(), b.mean(), rtol=0.08)
        np.testing.assert_allclose(a.std(), b.std(), rtol=0.12)


def test_wh_gamma_antithetic_pair_structure():
    """boost=0 WH: g = ab*max(c,.05)^3 with c = 1 - 1/(9ab) + eps/(3√ab);
    mirrored eps ⇒ c_s + c_{s+S/2} = 2(1 - 1/(9ab))."""
    a = jnp.full((64, 10), 4.0)
    g = wilson_hilferty_gamma(jax.random.PRNGKey(4), a, boost=0,
                              antithetic=True)
    ab = 4.0
    c = np.cbrt(np.asarray(g, np.float64) / ab)
    target = 2.0 * (1.0 - 1.0 / (9.0 * ab))
    np.testing.assert_allclose(c[:32] + c[32:], target, atol=1e-6)


def test_antithetic_validation():
    sur = _mixed_surrogate()
    params = sur.init()
    with pytest.raises(ValueError, match="even"):
        sur.sample_and_log_prob(params, jax.random.PRNGKey(0), (7,),
                                antithetic=True)
    sur_exact = _mixed_surrogate()
    sur_exact.gamma_sampler = "exact"
    with pytest.raises(ValueError, match="antithetic"):
        sur_exact.sample_and_log_prob(params, jax.random.PRNGKey(0), (8,),
                                      antithetic=True)


def test_antithetic_gradient_unbiased_and_lower_variance():
    """Mean ELBO gradient over many keys matches the standard estimator
    (unbiasedness); per-key gradient variance is strictly reduced on the
    near-quadratic conjugate problem."""
    x, surrogate, energy = _gaussian_problem()
    params = surrogate.init()
    params = jax.tree_util.tree_map(lambda v: jnp.asarray(v, jnp.float64), params)
    batch = {"counts": jnp.asarray(x)}

    def loss(p, key, antithetic):
        samples, logq = surrogate.sample_and_log_prob(
            p, key, (8,), antithetic=antithetic
        )
        return -jnp.mean(energy(batch, samples, 1.0) - logq)

    def grads(antithetic, n=256):
        g = jax.vmap(
            lambda k: jax.grad(loss)(params, k, antithetic)
        )(jax.random.split(jax.random.PRNGKey(7), n))
        flat = jnp.concatenate(
            [v.reshape(n, -1) for v in jax.tree_util.tree_leaves(g)], axis=1
        )
        return np.asarray(flat, np.float64)

    g_std = grads(False)
    g_anti = grads(True)
    # unbiasedness: means agree within combined MC error (3 sigma)
    se = np.sqrt(g_std.var(0) / len(g_std) + g_anti.var(0) / len(g_anti))
    assert np.all(np.abs(g_std.mean(0) - g_anti.mean(0)) < 4 * se + 1e-12)
    # variance reduction: total gradient variance strictly smaller
    assert g_anti.var(0).sum() < 0.9 * g_std.var(0).sum()


def test_fit_antithetic_converges_to_analytic_posterior():
    x, surrogate, energy = _gaussian_problem()
    n = len(x)
    from spmf_tpu.data import ArrayDataset

    data = ArrayDataset({"counts": x}).batch(64)
    result = fit_surrogate_posterior(
        energy, surrogate, surrogate.init(), lambda: iter(data),
        sample_size=32, num_steps=400, learning_rate=0.05,
        rel_tol=None, verbose=False, dtype=jnp.float64, seed=0,
        antithetic=True,
    )
    loc = float(result.params["z"]["loc"][0, 0])
    sd = float(jax.nn.softplus(result.params["z"]["raw_scale"][0, 0]))
    np.testing.assert_allclose(loc, x.sum() / (n + 1), atol=0.1)
    np.testing.assert_allclose(sd, 1.0 / np.sqrt(n + 1), rtol=0.4)


def test_fused_ig_sharded_antithetic_on_cpu_mesh():
    """The fused-IG sampler path accepts antithetic=True: with the pure-JAX
    reference kernel on the virtual fp mesh, logq stays exact at the
    returned values and the mirrored pairs are negatively correlated."""
    from jax.sharding import Mesh

    from spmf_tpu import PoissonFactorization
    from spmf_tpu.ops.fused_ig import ig_sample_logq_reference

    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("dp", "fp"))
    m = PoissonFactorization(
        latent_dim=4, feature_dim=64, u_tau_scale=0.1, dtype="float32",
        scale_columns=False, mesh=mesh, gamma_sampler="fused",
        fused_likelihood=False,
    )
    sur = m._surrogate
    sur._ig_impl = lambda a, b, seed, S_, antithetic=False: (
        ig_sample_logq_reference(a, b, jax.random.PRNGKey(seed), S_,
                                 antithetic=antithetic)
    )
    names = sur._ig_names
    S = 8
    assert sur._fused_igs_sharded_ok(names, (S,))
    values, logq = jax.jit(
        lambda p: sur._sample_igs(names, p, jax.random.PRNGKey(5), (S,),
                                  antithetic=True)
    )(m.surrogate_params)

    manual = 0.0
    for n in names:
        manual = manual + sur.surrogates[n].log_prob(
            m.surrogate_params[n], values[n]
        )
    np.testing.assert_allclose(np.asarray(logq), np.asarray(manual),
                               rtol=1e-4)
    # mirrored pairs: anticorrelation across the pair axis. Demean/scale
    # per ELEMENT first (pooling raw values across elements with different
    # (a, b) would add a spurious common positive component).
    flat = np.concatenate([
        np.asarray(values[n], np.float64).reshape(S, -1) for n in names
    ], axis=1)
    z = (flat - flat.mean(0)) / (flat.std(0) + 1e-12)
    r = float((z[: S // 2] * z[S // 2 :]).mean())
    assert r < -0.2, f"expected anticorrelated pairs, corr={r:.3f}"


def test_model_fit_forwards_antithetic():
    """fit(antithetic=True) runs the flagship model end-to-end (XLA
    samplers on CPU) and produces finite losses."""
    from spmf_tpu import PoissonFactorization
    from spmf_tpu.data import ArrayDataset

    rng = np.random.default_rng(0)
    X = rng.poisson(1.0, size=(64, 8))
    data = ArrayDataset({"counts": X, "indices": np.arange(64)}).batch(32)
    model = PoissonFactorization(
        latent_dim=2, feature_dim=8, u_tau_scale=0.1, dtype="float64",
        gamma_sampler="fast",
    )
    losses = model.fit(data, num_steps=3, sample_size=4, rel_tol=None,
                       verbose=False, antithetic=True)
    assert len(losses) >= 1 and np.isfinite(losses).all()


def test_autoencoder_fit_antithetic():
    """fit(antithetic=True) composes with the PoissonAutoencoder's pure
    mean-field-Normal surrogate (the step-time lever measured in
    docs/autoencoder_sampler_ab.json: S=4 mirrored pairs halve both the
    sampled-weight materialization and the S-scaled network matmuls)."""
    from spmf_tpu import PoissonAutoencoder

    rng = np.random.default_rng(1)
    X = rng.poisson(1.0, size=(96, 10)).astype(float)
    model = PoissonAutoencoder(
        {"counts": X, "indices": np.arange(96)}, latent_dim=3,
        dtype="float64",
    )
    losses = model.fit(batch_size=48, num_steps=3, sample_size=4,
                       rel_tol=None, verbose=False, antithetic=True)
    assert len(losses) >= 1 and np.isfinite(losses).all()


def test_sparse_coo_fit_antithetic():
    """fit(antithetic=True) composes with the flat-gather COO energy
    (sparse_dense_scatter=False): antithetic lives entirely in the
    surrogate sampler, so the sparse scRNA path gets the same estimator
    lever as the dense headline (benchmarks/sparse_antithetic_ab.py
    measures the throughput side)."""
    from spmf_tpu import PoissonFactorization
    from spmf_tpu.data import SparseCounts

    rng = np.random.default_rng(3)
    dense = rng.poisson(0.3, size=(80, 12)).astype(float)
    sp = SparseCounts.from_dense(dense).shuffle(seed=0).batch(
        40, drop_remainder=True).as_coo()
    model = PoissonFactorization(
        latent_dim=2, feature_dim=12, u_tau_scale=0.1, dtype="float64",
        gamma_sampler="fast", sparse_dense_scatter=False, data=sp,
    )
    losses = model.fit(batched_data_factory=sp, num_steps=3, sample_size=4,
                       rel_tol=None, verbose=False, antithetic=True)
    assert len(losses) >= 1 and np.isfinite(losses).all()


def test_stratified_marginals_match_independent():
    """antithetic='stratified' (lattice-coupled pairs) keeps every
    marginal law: moments of large stratified and independent sample sets
    agree for every surrogate family."""
    sur = _mixed_surrogate()
    params = sur.init()
    S = 4096
    v_strat, _ = sur.sample_and_log_prob(
        params, jax.random.PRNGKey(2), (S,), antithetic="stratified"
    )
    v_ind, _ = sur.sample_and_log_prob(
        params, jax.random.PRNGKey(3), (S,), antithetic=False
    )
    for name in ("a", "b", "t"):
        a = np.asarray(v_strat[name], np.float64)
        b = np.asarray(v_ind[name], np.float64)
        np.testing.assert_allclose(a.mean(), b.mean(), rtol=0.08)
        np.testing.assert_allclose(a.std(), b.std(), rtol=0.12)


def test_lattice_uniform_grid_and_stratification():
    """lattice_uniform: exact half-ulp grid (log- and mirror-safe), exact
    marginal uniformity per pair row, and the pair rows of one coordinate
    are an equally-spaced cycle (the lattice property)."""
    from spmf_tpu.ops.gamma import lattice_uniform

    u = np.asarray(lattice_uniform(jax.random.PRNGKey(0), 4, (257,),
                                   jnp.float64))
    assert u.min() >= 2.0**-24 and u.max() <= 1 - 2.0**-24
    # exact grid: u*2^23 - 0.5 are integers
    k = u * 2.0**23 - 0.5
    np.testing.assert_allclose(k, np.round(k), atol=0)
    # lattice: within each coordinate, the 4 pair values are u0 + p/4 mod 1
    base = u[0]
    for p in range(4):
        np.testing.assert_allclose(
            np.sort((u[p] - base) % 1.0),
            np.full(257, p / 4.0), atol=2**-22)


def test_stratified_gradient_unbiased_and_lower_variance_than_anti():
    """Mean ELBO gradient matches the plain-antithetic estimator
    (unbiasedness); per-key variance at S=8 is at or below plain
    antithetic (the lattice can only remove across-pair noise)."""
    x, surrogate, energy = _gaussian_problem()
    params = surrogate.init()
    params = jax.tree_util.tree_map(lambda v: jnp.asarray(v, jnp.float64), params)
    batch = {"counts": jnp.asarray(x)}

    def loss(p, key, antithetic):
        samples, logq = surrogate.sample_and_log_prob(
            p, key, (8,), antithetic=antithetic
        )
        return -jnp.mean(energy(batch, samples, 1.0) - logq)

    def grads(antithetic, n=256):
        g = jax.vmap(
            lambda k: jax.grad(loss)(params, k, antithetic)
        )(jax.random.split(jax.random.PRNGKey(7), n))
        flat = jnp.concatenate(
            [v.reshape(n, -1) for v in jax.tree_util.tree_leaves(g)], axis=1
        )
        return np.asarray(flat, np.float64)

    g_anti = grads(True)
    g_strat = grads("stratified")
    se = np.sqrt(g_anti.var(0) / len(g_anti) + g_strat.var(0) / len(g_strat))
    assert np.all(np.abs(g_anti.mean(0) - g_strat.mean(0)) < 4 * se + 1e-12)
    assert g_strat.var(0).sum() < 1.05 * g_anti.var(0).sum()


def test_model_fit_forwards_stratified():
    """fit(antithetic='stratified') threads end-to-end through the public
    model surface and trains."""
    from spmf_tpu import PoissonFactorization

    rng = np.random.default_rng(0)
    X = rng.poisson(1.0, (128, 6)).astype(float)
    m = PoissonFactorization(latent_dim=2, feature_dim=6, u_tau_scale=0.1,
                             dtype="float64")
    losses = m.fit(batched_data_factory={"counts": X,
                                         "indices": np.arange(128)},
                   num_steps=3, learning_rate=0.05, sample_size=4,
                   antithetic="stratified", seed=0, verbose=False,
                   rel_tol=None)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


@pytest.mark.parametrize("antithetic", [False, True, "stratified"])
def test_eps_form_logq_matches_per_variable_density(antithetic):
    """The r5 eps-form logq fast path (surrogates.py _sample_normals:
    log q(x) = -eps^2/2 - log(scale) - log(2*pi)/2 summed over the flat
    draw) must match the per-variable Normal.log_prob route — values,
    logq, AND parameter gradients — at machine precision in f64. The
    per-variable route is forced by passing the LIVE params as
    logq_params (identical math: the density pytree is the sample
    pytree, so gradients flow through both)."""
    sur = _mixed_surrogate()
    params = sur.init()
    key = jax.random.PRNGKey(3)
    S = 4

    def run(p, force_pervar):
        return sur.sample_and_log_prob(
            p, key, (S,), antithetic=antithetic,
            logq_params=p if force_pervar else None)

    va, lqa = run(params, False)
    vb, lqb = run(params, True)
    for n in va:
        np.testing.assert_allclose(np.asarray(va[n]), np.asarray(vb[n]),
                                   rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(lqa), np.asarray(lqb),
                               rtol=1e-11, atol=1e-11)

    def scalar(p, force_pervar):
        values, logq = run(p, force_pervar)
        return (jnp.sum(logq)
                + sum(jnp.sum(v * (i + 1.0))
                      for i, v in enumerate(values.values())))

    ga = jax.grad(scalar)(params, False)
    gb = jax.grad(scalar)(params, True)
    fa = jax.tree_util.tree_leaves(ga)
    fb = jax.tree_util.tree_leaves(gb)
    for a, b in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-10, atol=1e-10)
