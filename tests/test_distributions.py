"""Distribution log-probs vs scipy closed forms; sampler moments."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import scipy.stats as st

from spmf_tpu import distributions as dist

KEY = jax.random.PRNGKey(0)


def test_normal_logprob():
    d = dist.Normal(loc=jnp.array([0.0, 1.5]), scale=jnp.array([1.0, 2.5]))
    x = np.array([0.3, -2.0])
    np.testing.assert_allclose(
        d.log_prob(x), st.norm(loc=[0.0, 1.5], scale=[1.0, 2.5]).logpdf(x), rtol=1e-10
    )


def test_halfnormal_logprob_and_mean():
    d = dist.HalfNormal(scale=jnp.array([0.5, 1.0, 3.0]))
    x = np.array([0.2, 1.1, 4.0])
    np.testing.assert_allclose(
        d.log_prob(x), st.halfnorm(scale=[0.5, 1.0, 3.0]).logpdf(x), rtol=1e-10
    )
    np.testing.assert_allclose(
        d.mean(), st.halfnorm(scale=np.array([0.5, 1.0, 3.0])).mean(), rtol=1e-10
    )


def test_halfcauchy_logprob():
    d = dist.HalfCauchy(loc=jnp.zeros(2), scale=jnp.array([1.0, 0.01]))
    x = np.array([0.7, 0.004])
    np.testing.assert_allclose(
        d.log_prob(x), st.halfcauchy(scale=[1.0, 0.01]).logpdf(x), rtol=1e-8
    )


def test_cauchy_logprob():
    d = dist.Cauchy(loc=jnp.array(1.0), scale=jnp.array(2.0))
    x = np.array([-3.0, 0.0, 5.0])
    np.testing.assert_allclose(
        d.log_prob(x), st.cauchy(loc=1.0, scale=2.0).logpdf(x), rtol=1e-8
    )


def test_gamma_logprob():
    d = dist.Gamma(concentration=jnp.array([0.5, 3.0]), rate=jnp.array([1.0, 2.0]))
    x = np.array([0.25, 1.7])
    np.testing.assert_allclose(
        d.log_prob(x),
        st.gamma(a=[0.5, 3.0], scale=[1.0, 0.5]).logpdf(x),
        rtol=1e-10,
    )


def test_inversegamma_logprob_mean():
    d = dist.InverseGamma(concentration=jnp.array([0.5, 2.0]), scale=jnp.array([1.0, 3.0]))
    x = np.array([0.8, 2.2])
    np.testing.assert_allclose(
        d.log_prob(x),
        st.invgamma(a=[0.5, 2.0], scale=[1.0, 3.0]).logpdf(x),
        rtol=1e-10,
    )
    np.testing.assert_allclose(d.mean()[1], 3.0, rtol=1e-10)


def test_sqrt_inversegamma_logprob():
    # density of sqrt(Y), Y ~ IG(a, b): check against change of variables
    a, b = 0.5, 2.0
    d = dist.SqrtInverseGamma(concentration=a, scale=b)
    x = np.array([0.5, 1.0, 2.0])
    expected = st.invgamma(a=a, scale=b).logpdf(x**2) + np.log(2 * x)
    np.testing.assert_allclose(d.log_prob(x), expected, rtol=1e-10)
    # density integrates to 1 (vectorized log-spaced trapezoid; a=0.5 has a
    # x^{-2} tail so the grid must reach far out)
    grid = np.logspace(-6, 8, 60000)
    pdf = np.exp(np.asarray(d.log_prob(jnp.asarray(grid))))
    assert abs(np.trapezoid(pdf, grid) - 1.0) < 1e-4


def test_lognormal_logprob():
    d = dist.LogNormal(loc=jnp.array(0.3), scale=jnp.array(0.8))
    x = np.array([0.5, 2.0])
    np.testing.assert_allclose(
        d.log_prob(x), st.lognorm(s=0.8, scale=np.exp(0.3)).logpdf(x), rtol=1e-10
    )


def test_exp1_vs_scipy():
    import scipy.special as sp

    # dense grid over both rational intervals + the series branch; the
    # loop-free rationals (tools/fit_exp1.py) are validated at 3.3e-14
    z = np.concatenate(
        [np.geomspace(1e-10, 1.0, 500), np.linspace(1.0, 650.0, 2000)]
    )
    np.testing.assert_allclose(dist.exp1(jnp.array(z)), sp.exp1(z), rtol=1e-12)
    # log_exp1 must stay finite deep into the tail (scipy underflows ~700)
    zt = np.array([50.0, 200.0, 600.0, 1e4, 1e8, 1e12])
    lt = dist.log_exp1(jnp.array(zt))
    np.testing.assert_allclose(lt[:2], np.log(sp.exp1(zt[:2])), rtol=1e-12)
    assert np.isfinite(np.asarray(lt)).all()
    # asymptotic tail: log E1(z) = -z - log z + log(1 - 1/z + 2/z^2 - ...)
    za = np.asarray(zt[3:], float)
    asym = -za - np.log(za) + np.log1p(-1.0 / za + 2.0 / za**2)
    np.testing.assert_allclose(lt[3:], asym, rtol=1e-10)


def test_exp1_gradients_match_analytic():
    """E1'(z) = -e^{-z}/z exactly; d/dz log E1 = -e^{-z}/(z E1(z)).

    The custom JVPs (special.py) must reproduce these — the log_exp1 one
    backs the DenseHorseshoe weight-prior gradient in the autoencoder."""
    import scipy.special as sp

    z = np.array([1e-3, 0.2, 0.9, 1.0, 1.5, 3.8, 6.0, 12.0, 40.0, 300.0])
    g1 = jax.vmap(jax.grad(dist.exp1))(jnp.array(z))
    np.testing.assert_allclose(g1, -np.exp(-z) / z, rtol=1e-12)
    g2 = jax.vmap(jax.grad(dist.log_exp1))(jnp.array(z))
    np.testing.assert_allclose(g2, -np.exp(-z) / (z * sp.exp1(z)), rtol=1e-12)


def test_horseshoe_density_integrates_to_one():
    d = dist.Horseshoe(scale=jnp.array(1.0))
    # symmetric: integrate the positive half on a log grid (handles the
    # log-singularity at 0 and the fat tail)
    grid = np.logspace(-10, 5, 40000)
    pdf = np.exp(np.asarray(d.log_prob(jnp.asarray(grid))))
    val = 2 * np.trapezoid(pdf, grid)
    assert abs(val - 1.0) < 1e-4


def test_horseshoe_tail_matches_analytic():
    # p(x) ~ K * log(1 + 2/x^2) with K = (2 pi^3)^{-1/2} sandwich bounds
    d = dist.Horseshoe(scale=jnp.array(1.0))
    K = (2 * np.pi**3) ** -0.5
    for x in [0.5, 1.0, 3.0, 10.0]:
        p = np.exp(float(d.log_prob(jnp.array(x))))
        lo = K / 2 * np.log(1 + 4 / x**2)
        hi = K * np.log(1 + 2 / x**2)
        assert lo < p < hi, (x, lo, p, hi)


def test_abs_horseshoe_integrates_to_one():
    d = dist.AbsHorseshoe(scale=jnp.array(2.0))
    grid = np.logspace(-10, 5, 40000)
    pdf = np.exp(np.asarray(d.log_prob(jnp.asarray(grid))))
    assert abs(np.trapezoid(pdf, grid) - 1.0) < 1e-4


def test_poisson_logprob():
    d = dist.Poisson(rate=jnp.array([0.5, 4.0]))
    x = np.array([2.0, 7.0])
    np.testing.assert_allclose(
        d.log_prob(x), st.poisson(mu=[0.5, 4.0]).logpmf(x), rtol=1e-10
    )


def test_bernoulli_logprob():
    logits = np.array([-2.0, 0.5, 8.0])
    d = dist.Bernoulli(logits=jnp.array(logits))
    for x in [np.zeros(3), np.ones(3)]:
        p = 1 / (1 + np.exp(-logits))
        np.testing.assert_allclose(
            d.log_prob(x), st.bernoulli(p).logpmf(x), rtol=1e-8, atol=1e-12
        )
    # extreme logits stay stable (scipy itself loses precision here)
    d2 = dist.Bernoulli(logits=jnp.array([30.0]))
    np.testing.assert_allclose(d2.log_prob(np.zeros(1)), [-30.0], rtol=1e-12)
    assert float(d2.log_prob(np.ones(1))[0]) < 0.0


def test_independent_sums_event_dims():
    d = dist.Independent(dist.Normal(jnp.zeros((3, 4)), jnp.ones((3, 4))), 2)
    x = np.random.RandomState(0).randn(5, 3, 4)
    lp = d.log_prob(x)
    assert lp.shape == (5,)
    np.testing.assert_allclose(lp, st.norm.logpdf(x).sum((-1, -2)), rtol=1e-10)


@pytest.mark.parametrize(
    "maker,m,v",
    [
        (lambda: dist.Normal(2.0, 3.0), 2.0, 9.0),
        (lambda: dist.HalfNormal(2.0), 2.0 * np.sqrt(2 / np.pi), 4 * (1 - 2 / np.pi)),
        (lambda: dist.Gamma(concentration=3.0, rate=2.0), 1.5, 0.75),
        (lambda: dist.InverseGamma(concentration=4.0, scale=3.0), 1.0, 1.0 / 2),
        (lambda: dist.Poisson(rate=3.5), 3.5, 3.5),
    ],
)
def test_sampler_moments(maker, m, v):
    d = maker()
    s = d.sample(KEY, (200_000,))
    np.testing.assert_allclose(np.mean(np.asarray(s)), m, rtol=0.02, atol=0.02)
    np.testing.assert_allclose(np.var(np.asarray(s)), v, rtol=0.05, atol=0.05)


def test_gamma_sample_grad_wrt_concentration():
    # implicit reparameterization: E[X] = a for Gamma(a, 1); dE/da = 1
    def f(a):
        d = dist.Gamma(concentration=a, rate=1.0)
        return jnp.mean(d.sample(KEY, (50_000,)))

    g = jax.grad(f)(jnp.array(2.0))
    np.testing.assert_allclose(g, 1.0, rtol=0.05)


def test_joint_distribution_named():
    joint = dist.JointDistributionNamed(
        {
            "tau": dist.Independent(dist.HalfCauchy(jnp.zeros(3), jnp.ones(3)), 1),
            "x": lambda tau: dist.Independent(dist.Normal(jnp.zeros(3), tau), 1),
        }
    )
    sample = joint.sample(KEY)
    assert set(sample) == {"tau", "x"}
    parts = joint.log_prob_parts(sample)
    expected_tau = st.halfcauchy.logpdf(np.asarray(sample["tau"])).sum()
    expected_x = st.norm(scale=np.asarray(sample["tau"])).logpdf(
        np.asarray(sample["x"])
    ).sum()
    np.testing.assert_allclose(parts["tau"], expected_tau, rtol=1e-10)
    np.testing.assert_allclose(parts["x"], expected_x, rtol=1e-10)
    np.testing.assert_allclose(
        joint.log_prob(sample), expected_tau + expected_x, rtol=1e-10
    )


def test_joint_distribution_sample_shape():
    joint = dist.JointDistributionNamed(
        {
            "a": dist.Independent(dist.HalfNormal(jnp.ones((2, 3))), 2),
            "b": lambda a: dist.Independent(dist.Normal(jnp.zeros((2, 3)), a), 2),
        }
    )
    s = joint.sample(KEY, (5,))
    assert s["a"].shape == (5, 2, 3)
    assert s["b"].shape == (5, 2, 3)
    lp = joint.log_prob(s)
    assert lp.shape == (5,)
