"""Pallas fused Poisson-likelihood kernel vs the XLA reference path.

Runs in interpreter mode on CPU (the fake backend for TPU kernels)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spmf_tpu.ops import fused_poisson_loglik, poisson_loglik_reference

S, B, K, D = 3, 70, 5, 40  # deliberately NOT tile-aligned (tests masking)
RNG = np.random.default_rng(0)


def _inputs(log_transform=False):
    theta = jnp.asarray(RNG.gamma(1.0, 0.1, size=(S, B, K)), jnp.float32)
    v = jnp.asarray(RNG.gamma(1.0, 0.1, size=(S, K, D)), jnp.float32)
    phi = jnp.asarray(RNG.gamma(1.0, 0.05, size=(S, 1, D)) + 1e-3, jnp.float32)
    x = jnp.asarray(RNG.poisson(1.0, size=(B, D)), jnp.float32)
    eta = jnp.asarray(1.0 + RNG.random((1, D)), jnp.float32)
    return theta, v, phi, x, eta


@pytest.mark.parametrize("log_transform", [False, True])
def test_fused_matches_reference(log_transform):
    theta, v, phi, x, eta = _inputs(log_transform)
    ref = poisson_loglik_reference(theta, v, phi, x, eta, log_transform)
    out = fused_poisson_loglik(theta, v, phi, x, eta, log_transform, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5)


def test_fused_handles_nonfinite():
    theta, v, phi, x, eta = _inputs(False)
    # zero-out phi on some columns and force rate<=0 -> log(0)/log(neg) paths
    phi = phi.at[:, :, :5].set(0.0)
    theta = theta.at[:, :10, :].set(0.0)  # rate=0 where phi=0 -> ll = nan/-inf
    ref = poisson_loglik_reference(theta, v, phi, x, eta, False)
    out = fused_poisson_loglik(theta, v, phi, x, eta, False, True)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5)


def test_fused_gradients_match_reference():
    theta, v, phi, x, eta = _inputs(False)

    def loss_fused(t, vv, p):
        return jnp.sum(fused_poisson_loglik(t, vv, p, x, eta, False, True))

    def loss_ref(t, vv, p):
        return jnp.sum(poisson_loglik_reference(t, vv, p, x, eta, False))

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(theta, v, phi)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(theta, v, phi)
    # the fused backward stop-grads the clip bound; with no clipped entries in
    # this smooth regime the grads agree tightly
    for a, b, name in zip(g_fused, g_ref, "theta v phi".split()):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5, err_msg=name
        )


def test_model_fused_flag_matches_default():
    from spmf_tpu import PoissonFactorization
    from spmf_tpu.data import ArrayDataset

    N, D2, P = 64, 12, 3
    X = RNG.poisson(1.0, size=(N, D2))
    data = ArrayDataset({"counts": X, "indices": np.arange(N)}).batch(32)
    m = PoissonFactorization(
        latent_dim=P, feature_dim=D2, u_tau_scale=0.1, dtype="float32", data=data
    )
    key = jax.random.PRNGKey(0)
    samples, _ = m._surrogate.sample_and_log_prob(m.surrogate_params, key, (2,))
    batch = next(iter(data))
    ref_parts = m.unormalized_log_prob_parts(batch, **samples)
    m.fused_likelihood = True
    m._fused_interpret = True  # CPU: run the kernel in interpreter mode
    fused_parts = m.unormalized_log_prob_parts(batch, **samples)
    np.testing.assert_allclose(
        np.asarray(fused_parts["x"]), np.asarray(ref_parts["x"]), rtol=1e-4
    )
    for k in ref_parts:
        if k != "x":
            np.testing.assert_allclose(
                np.asarray(fused_parts[k]), np.asarray(ref_parts[k]), rtol=1e-6
            )


def test_sparse_encode_matches_dense():
    from spmf_tpu.data.sparse import SparseCounts
    from spmf_tpu.ops import sparse_encode_coo
    from spmf_tpu import PoissonFactorization
    from spmf_tpu.data import ArrayDataset

    dense = RNG.poisson(0.6, (40, 9)).astype(float)
    data = ArrayDataset({"counts": dense, "indices": np.arange(40)}).batch(40)
    m = PoissonFactorization(
        latent_dim=3, feature_dim=9, u_tau_scale=0.1, dtype="float64", data=data
    )
    z_dense = np.asarray(m.encode(dense))
    sp = SparseCounts.from_dense(dense)
    z_sparse = np.asarray(m.encode_sparse(sp))
    np.testing.assert_allclose(z_sparse, z_dense, rtol=1e-9, atol=1e-12)


def test_sparse_encode_log_transform():
    from spmf_tpu.data.sparse import SparseCounts
    from spmf_tpu import PoissonFactorization
    from spmf_tpu.data import ArrayDataset

    dense = RNG.poisson(2.0, (30, 6)).astype(float)
    data = ArrayDataset({"counts": dense, "indices": np.arange(30)}).batch(30)
    m = PoissonFactorization(
        latent_dim=2, feature_dim=6, u_tau_scale=0.1, dtype="float64",
        log_transform=True, data=data,
    )
    z_dense = np.asarray(m.encode(dense))
    z_sparse = np.asarray(m.encode_sparse(SparseCounts.from_dense(dense)))
    np.testing.assert_allclose(z_sparse, z_dense, rtol=1e-9, atol=1e-12)


def test_fused_exp_rate_sum_matches_direct():
    """Sparse-energy exp total kernel vs direct XLA sum, value + grads
    (interpret mode on CPU)."""
    from spmf_tpu.ops import fused_exp_rate_sum

    rng = np.random.default_rng(5)
    S, B, K, D = 3, 20, 4, 17
    theta = jnp.asarray(rng.normal(0.1, 0.2, (S, B, K)), jnp.float32)
    v = jnp.asarray(abs(rng.normal(0.1, 0.1, (S, K, D))), jnp.float32)
    eta = jnp.asarray(abs(rng.normal(1.0, 0.1, (1, D))), jnp.float32)

    def direct(t, vv):
        return jnp.sum(jnp.exp(jnp.matmul(t, vv) * eta), axis=(-1, -2))

    out = fused_exp_rate_sum(theta, v, eta, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(direct(theta, v)),
                               rtol=1e-5)
    g1 = jax.grad(lambda t, vv: jnp.sum(fused_exp_rate_sum(t, vv, eta, True)),
                  (0, 1))(theta, v)
    g2 = jax.grad(lambda t, vv: jnp.sum(direct(t, vv)), (0, 1))(theta, v)
    for a, b, n in zip(g1, g2, "tv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-6, err_msg=n)


@pytest.mark.parametrize("log_transform", [False, True])
def test_fused_row_loglik_matches_xla(log_transform):
    """Per-row WAIC kernel: raw (unclipped) feature-summed ll must match
    the XLA computation (reference poisson.py:156-184 -> sum(axis=-1))."""
    from jax.scipy.special import gammaln

    from spmf_tpu.ops import fused_poisson_row_loglik

    theta, v, phi, x, eta = _inputs(log_transform)
    tv = jnp.matmul(theta, v)
    rate = (jnp.exp(tv * eta) - 1.0 + phi) if log_transform else tv * eta + phi
    ll = x * jnp.log(rate) - rate - gammaln(x + 1.0)
    ref = jnp.sum(ll, axis=-1)  # (S, B)
    out = fused_poisson_row_loglik(theta, v, phi, x, eta, log_transform, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=3e-5)


def test_streaming_waic_terms_exact():
    """Chunked accumulation == one-shot formulas on the concatenated ll."""
    from scipy.special import logsumexp as sp_lse

    from spmf_tpu.vi.waic import streaming_waic_terms

    lls = RNG.normal(-3.0, 2.0, size=(23, 17))
    lppd_i, pwaic_i = streaming_waic_terms(
        [lls[:10], lls[10:20], lls[20:]]
    )
    np.testing.assert_allclose(lppd_i, sp_lse(lls, axis=0) - np.log(23.0),
                               rtol=1e-12)
    np.testing.assert_allclose(pwaic_i, lls.var(axis=0, ddof=1), rtol=1e-10)


@pytest.mark.parametrize("log_transform", [False, True])
def test_fused_bernoulli_matches_reference(log_transform):
    """likelihood='bernoulli': the same stats kernel with the logit-space
    Bernoulli ll (reference bernoulli.py:148) must match the XLA frame."""
    from spmf_tpu.ops import bernoulli_loglik_reference

    theta, v, phi, x, eta = _inputs(log_transform)
    theta = theta - 0.3  # real-valued logits path: signed operands
    v = v - 0.05
    x = jnp.asarray(RNG.integers(0, 2, size=x.shape), jnp.float32)
    ref = bernoulli_loglik_reference(theta, v, phi, x, eta, log_transform)
    out = fused_poisson_loglik(theta, v, phi, x, eta, log_transform, True,
                               likelihood="bernoulli")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5)


def test_fused_bernoulli_gradients_match_reference():
    from spmf_tpu.ops import bernoulli_loglik_reference

    theta, v, phi, x, eta = _inputs(False)
    theta = theta - 0.3
    v = v - 0.05
    x = jnp.asarray(RNG.integers(0, 2, size=x.shape), jnp.float32)

    def f_fused(t, vv, p):
        return jnp.sum(fused_poisson_loglik(t, vv, p, x, eta, False, True,
                                            likelihood="bernoulli"))

    def f_ref(t, vv, p):
        return jnp.sum(bernoulli_loglik_reference(t, vv, p, x, eta, False))

    g_fused = jax.grad(f_fused, argnums=(0, 1, 2))(theta, v, phi)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(theta, v, phi)
    for a, b, name in zip(g_fused, g_ref, ("theta", "v", "phi")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6, err_msg=name)


def test_fused_bernoulli_row_loglik_matches_xla():
    from spmf_tpu.ops import fused_poisson_row_loglik

    theta, v, phi, x, eta = _inputs(False)
    theta = theta - 0.3
    v = v - 0.05
    x = jnp.asarray(RNG.integers(0, 2, size=x.shape), jnp.float32)
    logits = jnp.matmul(theta, v) * eta + phi
    ll = x * logits - (jnp.maximum(logits, 0.0)
                       + jnp.log1p(jnp.exp(-jnp.abs(logits))))
    ref = jnp.sum(ll, axis=-1)
    out = fused_poisson_row_loglik(theta, v, phi, x, eta, False, True,
                                   likelihood="bernoulli")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=3e-5)


def test_fused_normal_obs_matches_reference_and_grads():
    """likelihood=('normal', s): true-Gaussian observation decoder branch
    (the net-new mode of GaussianFactorization, SURVEY.md §2.4)."""
    from spmf_tpu.ops import normal_loglik_reference

    theta, v, phi, x, eta = _inputs(False)
    theta = theta - 0.3
    v = v - 0.05
    x = jnp.asarray(RNG.normal(0.5, 1.0, size=x.shape), jnp.float32)
    for scale in (1.0, 0.25):  # 0.25: positive ll exists -> upper clip binds
        ref = normal_loglik_reference(theta, v, phi, x, eta, scale)
        out = fused_poisson_loglik(theta, v, phi, x, eta, False, True,
                                   likelihood=("normal", scale))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=3e-5, err_msg=f"scale={scale}")

        g_fused = jax.grad(lambda t, vv, p: jnp.sum(fused_poisson_loglik(
            t, vv, p, x, eta, False, True, likelihood=("normal", scale))),
            argnums=(0, 1, 2))(theta, v, phi)
        g_ref = jax.grad(lambda t, vv, p: jnp.sum(normal_loglik_reference(
            t, vv, p, x, eta, scale)), argnums=(0, 1, 2))(theta, v, phi)
        for a, b, name in zip(g_fused, g_ref, ("theta", "v", "phi")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6,
                                       err_msg=f"{name} scale={scale}")


def test_fused_gradients_finite_under_rescue():
    """In rescue mode (non-finite ll entries -> the cnt*m correction), the
    speculative-gradient backward must stay finite everywhere — a NaN rate
    in some entries must not poison the training gradient (the reference
    XLA path deliberately differs here: it autodiffs the clip bound)."""
    theta, v, phi, x, eta = _inputs(False)
    phi = phi.at[:, :, :5].set(0.0)
    theta = theta.at[:, :10, :].set(0.0)  # rate=0 -> ll = nan/-inf entries

    g = jax.grad(
        lambda t, vv, p: jnp.sum(
            fused_poisson_loglik(t, vv, p, x, eta, False, True)
        ),
        argnums=(0, 1, 2),
    )(theta, v, phi)
    for a, name in zip(g, "theta v phi".split()):
        a = np.asarray(a)
        assert np.isfinite(a).all(), name
        assert np.abs(a).max() > 0, name


def test_unknown_likelihood_raises():
    """r2 advisor: an unrecognized likelihood used to fall through to the
    Poisson branch silently; now every kernel entry point validates."""
    import pytest

    from spmf_tpu.ops import fused_poisson_row_loglik

    theta = np.zeros((1, 8, 2), np.float32)
    v = np.zeros((1, 2, 4), np.float32)
    phi = np.zeros((1, 1, 4), np.float32)
    x = np.zeros((8, 4), np.float32)
    for bad in ("mixed", "normal", ("gamma", 1.0), 7):
        with pytest.raises(ValueError, match="unknown likelihood"):
            fused_poisson_loglik(theta, v, phi, x, 1.0, False, True,
                                 likelihood=bad)
        with pytest.raises(ValueError, match="unknown likelihood"):
            fused_poisson_row_loglik(theta, v, phi, x, 1.0, False, True,
                                     likelihood=bad)


def test_mixed_codes_kernel_matches_per_family_kernels():
    """The ('mixed', s) codes lane must agree with running each
    single-family kernel on its own column block and combining the clip
    stats — the r2 per-block construction, now one kernel pass."""
    from spmf_tpu.ops.fused_poisson import (
        CODE_BERNOULLI,
        CODE_NORMAL,
        CODE_POISSON,
        _floor_min_val,
        _fused_stats,
        _prep,
    )

    S, B, K, D = 2, 16, 3, 12
    rng = np.random.default_rng(2)
    codes = np.asarray(
        [[CODE_POISSON] * 4 + [CODE_BERNOULLI] * 4 + [CODE_NORMAL] * 4],
        np.float32,
    )
    perm = rng.permutation(D)
    codes = codes[:, perm]
    theta = rng.normal(size=(S, B, K)).astype(np.float32) * 0.2
    v = rng.normal(size=(S, K, D)).astype(np.float32)
    phi = rng.normal(size=(S, 1, D)).astype(np.float32) * 0.1
    x = rng.poisson(1.0, size=(B, D)).astype(np.float32)
    scale = 0.8

    out_mixed = fused_poisson_loglik(
        theta, v, phi, x, 1.0, False, True, likelihood=("mixed", scale),
        codes=codes,
    )

    ssum = np.zeros(S, np.float32)
    cnt = np.zeros(S, np.int64)
    gmin = 0.0
    for code, kind in ((CODE_POISSON, "poisson_softplus"),
                       (CODE_BERNOULLI, "bernoulli"),
                       (CODE_NORMAL, ("normal", scale))):
        idx = np.where(codes[0] == code)[0]
        args = _prep(theta, v[:, :, idx], phi[:, :, idx], x[:, idx], 1.0)
        s_t, c_t, m_t = _fused_stats(*args, False, True, kind)
        ssum += np.asarray(s_t)
        cnt += np.asarray(c_t)
        gmin = min(gmin, float(m_t[0]))
    m = float(_floor_min_val(jnp.float32(gmin - 10.0)))
    expected = ssum + cnt * m
    np.testing.assert_allclose(np.asarray(out_mixed), expected, rtol=1e-5)


def test_fused_mixed_likelihood_requires_codes():
    """('mixed', s) without the per-column codes lane would zero-fill to
    all-Poisson (_prep) — rejected at the entry point."""
    theta, v, phi, x, eta = _inputs()
    with pytest.raises(ValueError, match="codes"):
        fused_poisson_loglik(theta, v, phi, x, eta, False, True,
                             likelihood=("mixed", 1.0), codes=None)


def test_static_clip_matches_reference_on_healthy_data():
    """clip='static' (r4): identical clipped sums on in-range data (the
    dynamic bound is a rescue-mode no-op there) and BIT-identical
    gradients always (both modes share the static active set)."""
    from spmf_tpu.ops import fused_poisson_loglik

    rng = np.random.default_rng(3)
    S, B, K, D = 3, 16, 4, 24
    theta = jnp.asarray(rng.gamma(1.0, 1.0, (S, B, K)).astype(np.float32))
    v = jnp.asarray(rng.gamma(1.0, 1.0, (S, K, D)).astype(np.float32))
    phi = jnp.asarray(rng.gamma(1.0, 0.1, (S, 1, D)).astype(np.float32))
    x = rng.poisson(1.0, (B, D)).astype(np.float32)

    def run(mode):
        val = fused_poisson_loglik(theta, v, phi, x, 1.0, False, True,
                                   clip=mode)
        grads = jax.grad(
            lambda t, vv, p: jnp.sum(
                fused_poisson_loglik(t, vv, p, x, 1.0, False, True,
                                     clip=mode)),
            argnums=(0, 1, 2),
        )(theta, v, phi)
        return np.asarray(val), grads

    v_ref, g_ref = run("reference")
    v_st, g_st = run("static")
    np.testing.assert_allclose(v_st, v_ref, rtol=1e-6)
    for a, b in zip(g_st, g_ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    with pytest.raises(ValueError, match="clip"):
        fused_poisson_loglik(theta, v, phi, x, 1.0, False, True,
                             clip="bogus")


def test_static_clip_model_energy_matches_reference_mode():
    """The model-level routing: likelihood_clip='static' trains the same
    energy as the default on healthy data, and rejects unknown modes."""
    from spmf_tpu import PoissonFactorization

    rng = np.random.default_rng(4)
    B, D, P = 12, 16, 3
    X = rng.poisson(1.0, (B, D)).astype(float)

    def build(mode):
        m = PoissonFactorization(
            latent_dim=P, feature_dim=D, u_tau_scale=0.1, dtype="float64",
            scale_columns=False, fused_likelihood=True,
            likelihood_clip=mode,
        )
        m._fused_interpret = True
        return m

    ref = build("reference")
    st = build("static")
    batch = {"counts": X, "indices": np.arange(B)}
    key = jax.random.PRNGKey(0)
    samples, _ = ref._surrogate.sample_and_log_prob(
        ref.surrogate_params, key, (2,))
    lp_ref = np.asarray(ref.unormalized_log_prob(data=batch, **samples))
    lp_st = np.asarray(st.unormalized_log_prob(data=batch, **samples))
    np.testing.assert_allclose(lp_st, lp_ref, rtol=1e-10)
    assert st._config()["likelihood_clip"] == "static"

    import pytest as _pytest

    with _pytest.raises(ValueError, match="likelihood_clip"):
        PoissonFactorization(latent_dim=P, feature_dim=D,
                             dtype="float64", likelihood_clip="bogus")
