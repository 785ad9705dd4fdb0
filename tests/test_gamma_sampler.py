"""Fast (Wilson–Hilferty boosted) gamma sampler: distributional accuracy and
pathwise-gradient correctness."""
import jax
import jax.numpy as jnp
import numpy as np
import scipy.stats as st

from spmf_tpu.ops.gamma import sample_gamma, wilson_hilferty_gamma

KEY = jax.random.PRNGKey(0)


def test_wh_moments_match_gamma():
    for a in [0.7, 1.0, 2.0, 5.0]:
        conc = jnp.full((200_000,), a, jnp.float32)
        x = np.asarray(wilson_hilferty_gamma(KEY, conc))
        assert (x > 0).all()
        np.testing.assert_allclose(x.mean(), a, rtol=0.02)
        np.testing.assert_allclose(x.var(), a, rtol=0.05)
        # K-S distance vs the exact gamma cdf stays small
        ks = st.kstest(x[:20000], "gamma", args=(a,)).statistic
        assert ks < 0.02, (a, ks)


def test_wh_gradient_matches_analytic():
    # E[Gamma(a,1)] = a -> d/da mean(samples) ~= 1
    def f(a):
        conc = jnp.full((100_000,), 1.0) * a
        return jnp.mean(wilson_hilferty_gamma(KEY, conc))

    g = jax.grad(f)(jnp.asarray(2.0))
    np.testing.assert_allclose(float(g), 1.0, rtol=0.05)
    # compare against the exact implicit-reparam gradient path
    def f_exact(a):
        conc = jnp.full((100_000,), 1.0) * a
        return jnp.mean(jax.random.gamma(KEY, conc))

    g_exact = jax.grad(f_exact)(jnp.asarray(2.0))
    np.testing.assert_allclose(float(g), float(g_exact), rtol=0.1)


def test_sample_gamma_dispatch():
    conc = jnp.full((1000,), 3.0)
    x_exact = sample_gamma(KEY, conc, "exact")
    x_fast = sample_gamma(KEY, conc, "fast")
    assert x_exact.shape == x_fast.shape
    np.testing.assert_allclose(
        np.mean(np.asarray(x_fast)), np.mean(np.asarray(x_exact)), rtol=0.15
    )


def test_model_fast_gamma_trains():
    from spmf_tpu import PoissonFactorization
    from spmf_tpu.data import ArrayDataset

    rng = np.random.default_rng(0)
    X = rng.poisson(1.0, (200, 8))
    data = ArrayDataset({"counts": X, "indices": np.arange(200)}).batch(100)
    m = PoissonFactorization(
        latent_dim=3, feature_dim=8, u_tau_scale=0.1, dtype="float64",
        gamma_sampler="fast", data=data,
    )
    losses = m.fit(batched_data_factory=data, num_steps=3, learning_rate=0.1,
                   sample_size=4, verbose=False)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_small_concentration_never_underflows():
    # regression: uniform draws can hit minval (P~2^-24); for small a the
    # Stuart reduction then underflowed g to 0 in f32 -> IG sample inf -> NaN
    conc = jnp.full((1_000_000,), 0.05, jnp.float32)
    g = wilson_hilferty_gamma(jax.random.PRNGKey(7), conc)
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert (g >= np.sqrt(np.finfo(np.float32).tiny)).all()
    # IG transform stays finite too
    x = 1.0 / g
    assert np.isfinite(x).all()


def test_wh_accuracy_below_horseshoe_shape():
    """Extend the validated KS envelope below 0.7 (VERDICT r2 Weak #7): the
    trainable IG concentrations can drift toward the horseshoe's a=0.5
    during training, outside the originally validated 0.7-5 range. The
    boost construction keeps the WH core at shape a+8, and Stuart's
    reduction is exact, so accuracy must hold — measured here down to
    a=0.3 and up to a=50."""
    for a in [0.3, 0.5, 20.0, 50.0]:
        conc = jnp.full((200_000,), a, jnp.float32)
        x = np.asarray(wilson_hilferty_gamma(KEY, conc))
        assert (x > 0).all()
        ks = st.kstest(x[:20000], "gamma", args=(a,)).statistic
        assert ks < 0.02, (a, ks)


def test_converged_ig_concentrations_inside_validated_envelope():
    """Fit a noise config to convergence and check the (a, b) ranges the
    trainable IG surrogates actually visit against the measured KS
    envelope [0.3, 50] (VERDICT r2 #8: the sampler accuracy claim must
    hold at the converged operating point, not just at init)."""
    from spmf_tpu import PoissonFactorization
    from spmf_tpu.data import ArrayDataset

    rng = np.random.default_rng(1)
    X = rng.poisson(1.0, (2000, 12))
    data = ArrayDataset({"counts": X, "indices": np.arange(2000)}).batch(500)
    m = PoissonFactorization(
        latent_dim=3, feature_dim=12, u_tau_scale=1 / np.sqrt(2000 * 12),
        dtype="float64", data=data, gamma_sampler="fast",
    )
    m.fit(batched_data_factory=data, num_steps=25, learning_rate=0.05,
          sample_size=8, verbose=False, rel_tol=None)
    lo, hi = np.inf, -np.inf
    for name, p in m.surrogate_params.items():
        if "raw_concentration" not in p:
            continue
        a = np.asarray(jax.nn.softplus(np.asarray(p["raw_concentration"],
                                                  np.float64)))
        lo, hi = min(lo, a.min()), max(hi, a.max())
    assert np.isfinite(lo) and np.isfinite(hi)
    assert lo >= 0.3, f"converged concentration {lo} below validated 0.3"
    assert hi <= 50.0, f"converged concentration {hi} above validated 50"
