"""Model-family tests: energy correctness, fit smoke, exports, save/restore.

Shapes are deliberately tiny — the CI host is a single CPU core and XLA
compile time dominates; the persistent compilation cache (conftest) keeps
re-runs fast.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spmf_tpu import (
    BernoulliFactorization,
    GaussianFactorization,
    MixedFactorization,
    PoissonAutoencoder,
    PoissonFactorization,
    PoissonMatrixFactorization,
)
from spmf_tpu.data import ArrayDataset

N, D, P = 200, 8, 3
RNG = np.random.default_rng(0)
X = RNG.poisson(1.0, size=(N, D))
DATA = ArrayDataset({"counts": X, "indices": np.arange(N)}).batch(50)


@pytest.fixture(scope="module")
def pois():
    return PoissonFactorization(
        latent_dim=P, feature_dim=D, u_tau_scale=1 / np.sqrt(N * D),
        dtype="float64", data=DATA,
    )


def test_shapes_and_energy(pois):
    m = pois
    key = jax.random.PRNGKey(0)
    samples, logq = m._surrogate.sample_and_log_prob(m.surrogate_params, key, (4,))
    assert samples["u"].shape == (4, D, P)
    assert samples["v"].shape == (4, P, D)
    assert samples["w"].shape == (4, 1, D)
    assert samples["s"].shape == (4, 2, D)
    assert logq.shape == (4,)
    batch = next(iter(DATA))
    lp = m.unormalized_log_prob(data=batch, **samples)
    assert lp.shape == (4,)
    assert np.isfinite(np.asarray(lp)).all()


def test_energy_matches_manual_computation(pois):
    """Cross-check the full energy against an independent numpy computation
    of the reference equations (poisson.py:582-621)."""
    import scipy.stats as st
    import scipy.special as sp

    m = pois
    key = jax.random.PRNGKey(1)
    samples, _ = m._surrogate.sample_and_log_prob(m.surrogate_params, key, ())
    batch = next(iter(DATA))
    s = {k: np.asarray(v) for k, v in samples.items()}
    x = np.asarray(batch["counts"], np.float64)
    eta = np.asarray(m.eta_i, np.float64)
    # encode
    weights = s["s"] / s["s"].sum(-2, keepdims=True)
    A = weights[0][:, None] * s["u"]
    z = (x / eta) @ A
    z *= x.sum(-1, keepdims=True) / np.asarray(m.xi_u_global)
    # rate
    phi = eta * weights[1][None, :] * s["w"]
    rate = (z @ s["v"]) * eta + phi
    ll = st.poisson(mu=rate).logpmf(x)
    min_val = ll[np.isfinite(ll)].min() - 10
    ll = np.clip(ll, min_val, 0.0)
    ll = np.where(np.isfinite(ll), ll, min_val)
    expected_x = ll.sum()
    expected_z = st.halfnorm.logpdf(z).sum()

    parts = m.unormalized_log_prob_parts(batch, **samples)
    np.testing.assert_allclose(float(parts["x"]), expected_x, rtol=1e-9)
    np.testing.assert_allclose(float(parts["z"]), expected_z, rtol=1e-9)
    # prior parts for v (HalfNormal 0.1) and w (HalfNormal 1)
    np.testing.assert_allclose(
        float(parts["v"]), st.halfnorm(scale=0.1).logpdf(s["v"]).sum(), rtol=1e-9
    )
    np.testing.assert_allclose(
        float(parts["w"]), st.halfnorm(scale=1.0).logpdf(s["w"]).sum(), rtol=1e-9
    )


def test_fit_decreases_loss_and_exports(pois):
    m = pois
    losses = m.fit(
        batched_data_factory=DATA, num_steps=3, learning_rate=0.1,
        sample_size=4, verbose=False, seed=0,
    )
    assert len(losses) >= 3
    assert losses[-1] < losses[0]
    enc = np.asarray(m.encoding_matrix())
    dec = np.asarray(m.decoding_matrix())
    phi = np.asarray(m.intercept_matrix())
    assert enc.shape == (D, P) and dec.shape == (P, D) and phi.shape == (1, D)
    assert (enc >= 0).all() and (dec >= 0).all() and (phi >= 0).all()
    z = np.asarray(m.encode(X[:10]))
    assert z.shape == (10, P)
    w = m.waic(num_samples=10)
    assert set(w) == {"waic", "se", "lppd", "pwaic", "n_rows"}
    assert np.isfinite(list(w.values())).all()


def test_save_and_reconstitute(tmp_path, pois):
    m = pois
    path = str(tmp_path / "model.npz")
    m.save(path)
    m2 = PoissonFactorization(
        latent_dim=P, feature_dim=D, u_tau_scale=1 / np.sqrt(N * D), dtype="float64"
    )
    m2.load_params(path)
    for name in m.surrogate_params:
        for leaf in m.surrogate_params[name]:
            np.testing.assert_allclose(
                m.surrogate_params[name][leaf], m2.surrogate_params[name][leaf]
            )
    # reconstitute() from a flat state dict (reference poisson.py:711-717;
    # NOTE it deliberately does NOT refresh calibrated expectations — the
    # reference leaves that line commented out — so recalibrate explicitly)
    flat, _ = jax.tree_util.tree_flatten(m.surrogate_params)
    m2.reconstitute({"surrogate_vars": [np.asarray(a) for a in flat]})
    m2.set_calibration_expectations()
    np.testing.assert_allclose(
        np.asarray(m2.encode(X[:5])), np.asarray(m.encode(X[:5])), rtol=1e-7
    )


def test_bernoulli_model():
    Xb = (RNG.random((N, D)) < 0.3).astype(np.float64)
    data = ArrayDataset({"counts": Xb, "indices": np.arange(N)}).batch(50)
    m = BernoulliFactorization(
        latent_dim=P, feature_dim=D, u_tau_scale=0.1, dtype="float64", data=data
    )
    losses = m.fit(batched_data_factory=data, num_steps=2, learning_rate=0.1,
                   sample_size=4, verbose=False)
    assert losses[-1] < losses[0]
    # encode has no row-scaling branch
    z = np.asarray(m.encode(Xb[:7]))
    assert z.shape == (7, P)


def test_gaussian_model_faithful_and_normal_obs():
    data = ArrayDataset({"counts": X, "indices": np.arange(N)}).batch(50)
    m = GaussianFactorization(
        latent_dim=P, feature_dim=D, u_tau_scale=0.1, dtype="float64", data=data
    )
    key = jax.random.PRNGKey(0)
    samples, _ = m._surrogate.sample_and_log_prob(m.surrogate_params, key, (2,))
    batch = next(iter(data))
    # prior_weight IS forwarded here (reference gaussian.py:600-605)
    lp1 = m.unormalized_log_prob(data=batch, prior_weight=1.0, **samples)
    lp0 = m.unormalized_log_prob(data=batch, prior_weight=0.0, **samples)
    assert not np.allclose(np.asarray(lp1), np.asarray(lp0))

    Xr = RNG.normal(size=(N, D))
    data_r = ArrayDataset({"counts": Xr, "indices": np.arange(N)}).batch(50)
    mn = GaussianFactorization(
        latent_dim=P, feature_dim=D, u_tau_scale=0.1, dtype="float64",
        observation_model="normal", scale_columns=False, data=data_r,
    )
    losses = mn.fit(batched_data_factory=data_r, num_steps=2, learning_rate=0.05,
                    sample_size=4, verbose=False)
    assert np.isfinite(losses).all()


def test_mixed_model():
    cols = ["poisson"] * 3 + ["bernoulli"] * 3 + ["normal"] * 2
    Xm = np.concatenate(
        [
            RNG.poisson(1.0, size=(N, 3)),
            (RNG.random((N, 3)) < 0.4).astype(float),
            RNG.normal(size=(N, 2)),
        ],
        axis=1,
    )
    data = ArrayDataset({"counts": Xm, "indices": np.arange(N)}).batch(50)
    m = MixedFactorization(
        latent_dim=P, column_types=cols, u_tau_scale=0.1, dtype="float64",
        scale_columns=False, data=data,
    )
    losses = m.fit(batched_data_factory=data, num_steps=2, learning_rate=0.05,
                   sample_size=4, verbose=False)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_autoencoder():
    data = ArrayDataset({"data": X, "indices": np.arange(N)}).batch(50)
    m = PoissonAutoencoder(data, latent_dim=P, dtype="float64")
    losses = m.fit(batched_data_factory=data, num_steps=2, learning_rate=0.05,
                   sample_size=4, verbose=False)
    assert np.isfinite(losses).all()
    z = np.asarray(m.encode(X[:6]))
    assert z.shape == (6, P)
    w = m.waic(num_samples=5)
    assert np.isfinite(list(w.values())).all()


def test_encode_batched_matches_encode(pois):
    """encode_batched streams row chunks (padded remainder) and must equal
    the one-shot encode exactly — including the scale_rows branch, whose
    per-row sums must not see the zero padding rows."""
    full = np.asarray(pois.encode(X))
    chunked = pois.encode_batched(X, row_chunk=7)  # N=100 -> remainder 2
    np.testing.assert_allclose(chunked, full, rtol=1e-6)
    m = PoissonMatrixFactorization(
        None, latent_dim=P, feature_dim=D, strategy=None,
        u_tau_scale=1 / np.sqrt(N * D), dtype="float64", scale_rates=True,
    )
    np.testing.assert_allclose(
        m.encode_batched(X, row_chunk=7), np.asarray(m.encode(X)), rtol=1e-6
    )


def test_legacy_api():
    data = ArrayDataset({"counts": X, "indices": np.arange(N)}).batch(50)
    m = PoissonMatrixFactorization(
        data, latent_dim=P, strategy=None, u_tau_scale=1 / np.sqrt(N * D),
        dtype="float64", scale_rates=True,
    )
    assert m.feature_dim == D
    assert m.scale_rows is True
    assert np.asarray(m.column_norm_factor).shape == (1, D)
    # surrogate_distribution.sample(n) notebook API
    s = m.surrogate_distribution.sample(5)
    assert s["u"].shape == (5, D, P)


def test_load_model_roundtrip(tmp_path, pois):
    from spmf_tpu.models import load_model

    path = str(tmp_path / "m2.npz")
    pois.save(path)
    m2 = load_model(path)
    assert type(m2).__name__ == "PoissonFactorization"
    np.testing.assert_allclose(
        np.asarray(m2.encode(X[:4])), np.asarray(pois.encode(X[:4])), rtol=1e-6
    )


def test_gaussian_vw_surrogate_inits_dispatch_through_hook():
    """create_distributions must honour the subclass _vw_surrogates hook
    (ADVICE.md r1): Gaussian v loc -5, w loc +0.5 (reference
    gaussian.py:427-443), not the Poisson -6/-6."""
    from spmf_tpu.models import GaussianFactorization

    m = GaussianFactorization(latent_dim=2, feature_dim=5, u_tau_scale=0.1,
                              dtype="float64")
    np.testing.assert_allclose(np.asarray(m.surrogate_params["v"]["loc"]), -5.0)
    np.testing.assert_allclose(np.asarray(m.surrogate_params["w"]["loc"]), 0.5)


def test_class_level_decoder_override_disables_fusion():
    """_can_fuse must reject class-level decoder_function overrides too
    (ADVICE.md r1) — the decode link is baked into the Pallas kernel."""
    from spmf_tpu.models import PoissonFactorization

    class CustomDecode(PoissonFactorization):
        def decoder_function(self, x):
            return x * 2.0

    m = CustomDecode(latent_dim=2, feature_dim=5, u_tau_scale=0.1,
                     dtype="float64", fused_likelihood=True)
    assert not m._can_fuse()


def test_bernoulli_fused_energy_matches_xla():
    """The Bernoulli model's fused Pallas path (likelihood='bernoulli') must
    reproduce the XLA energy and gradients (interpret mode on CPU)."""
    from spmf_tpu import BernoulliFactorization

    B, D, P, S = 24, 12, 3, 2
    X = np.random.default_rng(3).integers(0, 2, size=(B, D)).astype(np.float64)

    def build(fused):
        m = BernoulliFactorization(
            latent_dim=P, feature_dim=D, u_tau_scale=0.1, dtype="float64",
            fused_likelihood=fused,
        )
        m._fused_interpret = True
        return m

    ref = build(False)
    fused = build(True)
    assert fused._can_fuse()
    batch = {"counts": jnp.asarray(X)}
    key = jax.random.PRNGKey(5)
    samples, _ = ref._surrogate.sample_and_log_prob(
        ref.surrogate_params, key, (S,)
    )
    px = np.asarray(ref.unormalized_log_prob_parts(batch, **samples)["x"])
    fx = np.asarray(fused.unormalized_log_prob_parts(batch, **samples)["x"])
    np.testing.assert_allclose(fx, px, rtol=1e-5)

    def loss(model):
        def f(p):
            s, lq = model._surrogate.sample_and_log_prob(p, key, (S,))
            return -jnp.mean(model.unormalized_log_prob(data=batch, **s) - lq)
        return f

    g_ref = jax.jit(jax.grad(loss(ref)))(ref.surrogate_params)
    g_fused = jax.jit(jax.grad(loss(fused)))(fused.surrogate_params)
    for name in g_ref:
        for leaf in g_ref[name]:
            np.testing.assert_allclose(
                np.asarray(g_fused[name][leaf]), np.asarray(g_ref[name][leaf]),
                rtol=5e-4, atol=1e-7, err_msg=f"{name}.{leaf}",
            )


@pytest.mark.parametrize("obs", ["poisson", "normal"])
def test_gaussian_fused_energy_matches_xla(obs):
    """GaussianFactorization now fuses in BOTH observation modes (the
    faithful Poisson-obs mode shares the Poisson kernel; normal-obs uses
    the ('normal', obs_scale) branch)."""
    from spmf_tpu import GaussianFactorization

    B, D, P, S = 24, 12, 3, 2
    X = np.random.default_rng(4).poisson(1.0, size=(B, D)).astype(np.float64)

    def build(fused):
        m = GaussianFactorization(
            latent_dim=P, feature_dim=D, u_tau_scale=0.1, dtype="float64",
            scale_columns=False, fused_likelihood=fused,
            observation_model=obs, obs_scale=0.7,
        )
        m._fused_interpret = True
        return m

    ref = build(False)
    fused = build(True)
    assert fused._can_fuse()
    batch = {"counts": jnp.asarray(X)}
    key = jax.random.PRNGKey(6)
    samples, _ = ref._surrogate.sample_and_log_prob(
        ref.surrogate_params, key, (S,)
    )
    px = np.asarray(ref.unormalized_log_prob_parts(batch, **samples)["x"])
    fx = np.asarray(fused.unormalized_log_prob_parts(batch, **samples)["x"])
    np.testing.assert_allclose(fx, px, rtol=1e-5)

    def loss(model):
        def f(p):
            s, lq = model._surrogate.sample_and_log_prob(p, key, (S,))
            return -jnp.mean(model.unormalized_log_prob(data=batch, **s) - lq)
        return f

    g_ref = jax.jit(jax.grad(loss(ref)))(ref.surrogate_params)
    g_fused = jax.jit(jax.grad(loss(fused)))(fused.surrogate_params)
    for name in g_ref:
        for leaf in g_ref[name]:
            np.testing.assert_allclose(
                np.asarray(g_fused[name][leaf]), np.asarray(g_ref[name][leaf]),
                rtol=5e-4, atol=1e-7, err_msg=f"{name}.{leaf}",
            )


def test_mixed_fused_energy_matches_xla():
    """MixedFactorization's fused path: one stats-kernel call per column
    type, combined exactly on the (sums, counts, global-min) scalars —
    must reproduce the XLA where-mask assembly and its gradients."""
    from spmf_tpu import MixedFactorization

    B, D, P, S = 24, 13, 3, 2  # odd D: exercises partition masking
    rng = np.random.default_rng(7)
    types = ["poisson"] * 5 + ["bernoulli"] * 5 + ["normal"] * 3
    rng.shuffle(types)  # non-contiguous blocks
    X = rng.poisson(1.0, size=(B, D)).astype(np.float64)
    X[:, [i for i, t in enumerate(types) if t == "bernoulli"]] %= 2

    def build(fused):
        m = MixedFactorization(
            column_types=types, latent_dim=P, feature_dim=D,
            u_tau_scale=0.1, dtype="float64", fused_likelihood=fused,
            obs_scale=0.8,
        )
        m._fused_interpret = True
        return m

    ref = build(False)
    fused = build(True)
    assert fused._can_fuse()
    batch = {"counts": jnp.asarray(X)}
    key = jax.random.PRNGKey(8)
    samples, _ = ref._surrogate.sample_and_log_prob(
        ref.surrogate_params, key, (S,)
    )
    px = np.asarray(ref.unormalized_log_prob_parts(batch, **samples)["x"])
    fx = np.asarray(fused.unormalized_log_prob_parts(batch, **samples)["x"])
    np.testing.assert_allclose(fx, px, rtol=1e-5)

    def loss(model):
        def f(p):
            s, lq = model._surrogate.sample_and_log_prob(p, key, (S,))
            return -jnp.mean(model.unormalized_log_prob(data=batch, **s) - lq)
        return f

    g_ref = jax.jit(jax.grad(loss(ref)))(ref.surrogate_params)
    g_fused = jax.jit(jax.grad(loss(fused)))(fused.surrogate_params)
    for name in g_ref:
        for leaf in g_ref[name]:
            np.testing.assert_allclose(
                np.asarray(g_fused[name][leaf]), np.asarray(g_ref[name][leaf]),
                rtol=5e-4, atol=1e-7, err_msg=f"{name}.{leaf}",
            )


def test_mixed_waic_fused_matches_xla():
    """r2 advisor (high): the fused Mixed WAIC used to fall through to the
    plain-Poisson kernel branch for every column (NaN on negative Normal
    rates). The ('mixed', s) kernel likelihood + codes lane must reproduce
    the XLA per-row log-likelihood exactly."""
    import jax

    from spmf_tpu import MixedFactorization

    B, D, P, S = 24, 13, 3, 4
    rng = np.random.default_rng(11)
    types = ["poisson"] * 5 + ["bernoulli"] * 5 + ["normal"] * 3
    rng.shuffle(types)
    Xm = rng.poisson(1.0, size=(B, D)).astype(np.float64)
    bern = [i for i, t in enumerate(types) if t == "bernoulli"]
    norm = [i for i, t in enumerate(types) if t == "normal"]
    Xm[:, bern] %= 2
    Xm[:, norm] = rng.normal(size=(B, len(norm)))

    def build(fused):
        m = MixedFactorization(
            column_types=types, latent_dim=P, feature_dim=D,
            u_tau_scale=0.1, dtype="float64", fused_likelihood=fused,
            obs_scale=0.8,
        )
        m._fused_interpret = True
        return m

    ref = build(False)
    fused = build(True)
    assert fused._can_fuse()
    batch = {"counts": Xm}
    key = jax.random.PRNGKey(3)
    samples, _ = ref._surrogate.sample_and_log_prob(
        ref.surrogate_params, key, (S,)
    )
    ll_ref = np.asarray(ref._row_log_likelihood(batch, samples))
    ll_fused = np.asarray(fused._row_log_likelihood(batch, samples))
    assert np.isfinite(ll_fused).all()
    np.testing.assert_allclose(ll_fused, ll_ref, rtol=2e-5)

    # the full waic dict is finite and consistent between paths
    ref.surrogate_params = fused.surrogate_params
    data = ArrayDataset({"counts": Xm, "indices": np.arange(B)}).batch(B)
    w_ref = ref.waic(data, num_samples=6, sample_chunk=3)
    w_fused = fused.waic(data, num_samples=6, sample_chunk=3)
    for k in ("waic", "se", "lppd", "pwaic"):
        assert np.isfinite(w_fused[k])
        np.testing.assert_allclose(w_fused[k], w_ref[k], rtol=1e-3)


def test_fusion_fallback_warns_once_with_reason():
    """VERDICT r2 #5: silently losing the ~3x fused kernel (e.g. B % dp
    != 0) is a support trap — the fallback must warn once and leave a
    queryable reason."""
    import warnings

    from spmf_tpu.parallel import data_parallel_mesh

    m = PoissonFactorization(
        latent_dim=2, feature_dim=5, u_tau_scale=0.1, dtype="float64",
        scale_columns=False, fused_likelihood=True,
    )
    m.mesh = data_parallel_mesh(2)
    assert m.fusion_active  # divisibility unknown yet: structurally eligible
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        assert not m._can_fuse(batch_shape=(7, 5))  # 7 rows over dp=2
        assert not m._can_fuse(batch_shape=(7, 5))  # second call: no new warning
    assert len(caught) == 1
    assert "falling back to the XLA path" in str(caught[0].message)
    # r5 multi-slice support reports the joint row-axis tuple
    assert "does not divide mesh axes ('dp',)" in m.fusion_inactive_reason

    # CPU default (fused_likelihood=False) stays silent
    m2 = PoissonFactorization(
        latent_dim=2, feature_dim=5, u_tau_scale=0.1, dtype="float64",
        scale_columns=False, fused_likelihood=False,
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        assert not m2._can_fuse()
    assert not caught
    assert "fused_likelihood=False" in m2.fusion_inactive_reason


def _coo_batch_from(dense, extra_pad=13):
    from spmf_tpu.data.sparse import SparseCounts

    sp = SparseCounts.from_dense(dense)
    ids = np.arange(dense.shape[0])
    rows, cols, vals = sp.batch_coo(ids)
    pad = len(vals) + extra_pad
    batch = {"coo_rows": np.zeros(pad, np.int32),
             "coo_cols": np.zeros(pad, np.int32),
             "coo_vals": np.zeros(pad),
             "indices": ids}
    batch["coo_rows"][:len(vals)] = rows
    batch["coo_cols"][:len(vals)] = cols
    batch["coo_vals"][:len(vals)] = vals
    return batch


def test_bernoulli_coo_batch_densifies_not_poisson_energy():
    """A COO batch fed to a model whose likelihood is NOT the stock Poisson
    must go through the on-device densify + the subclass's own dense
    machinery — the gather COO energy computes Poisson math only, and
    routing a Bernoulli model through it would silently train the wrong
    likelihood."""
    Xb = (RNG.random((40, D)) < 0.3).astype(np.float64)
    data = ArrayDataset({"counts": Xb, "indices": np.arange(40)}).batch(40)
    m = BernoulliFactorization(latent_dim=2, feature_dim=D, u_tau_scale=0.1,
                               dtype="float64", data=data)
    assert not m._coo_energy_supported()
    key = jax.random.PRNGKey(0)
    samples, _ = m._surrogate.sample_and_log_prob(m.surrogate_params, key, (2,))
    lp_d = m.unormalized_log_prob(
        data={"counts": Xb, "indices": np.arange(40)}, **samples)
    lp_c = m.unormalized_log_prob(data=_coo_batch_from(Xb), **samples)
    np.testing.assert_allclose(np.asarray(lp_c), np.asarray(lp_d), rtol=1e-12)


def test_custom_encoder_disables_coo_energy():
    """The gather COO energy bakes in the stock encode link
    (sparse_encode_coo takes log_transform directly); a custom
    encoder_function must route COO batches through densify so the
    override actually applies."""
    stock = PoissonFactorization(latent_dim=2, feature_dim=D, u_tau_scale=0.1,
                                 dtype="float64", data=DATA)
    assert stock._coo_energy_supported()
    m = PoissonFactorization(latent_dim=2, feature_dim=D, u_tau_scale=0.1,
                             dtype="float64", data=DATA,
                             encoder_function=lambda x: jnp.sqrt(x + 1.0))
    assert not m._coo_energy_supported()
    Xc = X[:40].astype(np.float64)
    key = jax.random.PRNGKey(1)
    samples, _ = m._surrogate.sample_and_log_prob(m.surrogate_params, key, (2,))
    lp_d = m.unormalized_log_prob(
        data={"counts": Xc, "indices": np.arange(40)}, **samples)
    lp_c = m.unormalized_log_prob(data=_coo_batch_from(Xc), **samples)
    np.testing.assert_allclose(np.asarray(lp_c), np.asarray(lp_d), rtol=1e-12)


def test_fusion_active_reports_last_dispatch():
    """fusion_active reflects the LAST _can_fuse evaluation — reading the
    property must not re-evaluate shapeless and clobber a shape-based
    rejection recorded when the training batch was dispatched."""
    import warnings

    from spmf_tpu.parallel import data_parallel_mesh

    m = PoissonFactorization(latent_dim=2, feature_dim=5, u_tau_scale=0.1,
                             dtype="float64", scale_columns=False,
                             fused_likelihood=True)
    m.mesh = data_parallel_mesh(2)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        assert not m._can_fuse(batch_shape=(7, 5))
    assert m.fusion_active is False
    assert "divide" in m.fusion_inactive_reason
    assert m._can_fuse(batch_shape=(8, 5))
    assert m.fusion_active is True


def test_waic_query_does_not_clobber_fusion_record():
    """_can_fuse(record=False) (the WAIC/query path) must not overwrite
    the rejection recorded at the last training dispatch."""
    import warnings

    from spmf_tpu.parallel import data_parallel_mesh

    m = PoissonFactorization(latent_dim=2, feature_dim=5, u_tau_scale=0.1,
                             dtype="float64", scale_columns=False,
                             fused_likelihood=True)
    m.mesh = data_parallel_mesh(2)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        assert not m._can_fuse(batch_shape=(7, 5))  # training dispatch
    reason = m.fusion_inactive_reason
    assert m._can_fuse(record=False)  # shapeless query passes...
    assert m.fusion_active is False   # ...but the dispatch record stands
    assert m.fusion_inactive_reason == reason


def test_query_does_not_consume_one_shot_fusion_warning():
    """A record=False evaluation (fusion_active property, WAIC) must not
    fire — and thereby consume — the one-time fallback warning meant for
    the training dispatch."""
    import warnings

    m = PoissonFactorization(latent_dim=2, feature_dim=5, u_tau_scale=0.1,
                             dtype="float64", scale_columns=False,
                             fused_likelihood=True)
    m.decoder_function = lambda x: x  # instance override: fusion ineligible
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        assert m.fusion_active is False       # query: silent
        assert not m._can_fuse(record=False)  # query: silent
    assert caught == []
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        assert not m._can_fuse()              # training dispatch: warns
    assert len(caught) == 1


def test_coo_gather_dispatch_does_not_false_warn():
    """When a COO batch routes to the gather energy (the designed sparse
    path), no 'falling back to the XLA path (~3x slower)' warning may
    fire — that claim would be false — and the dispatch is observable."""
    import warnings

    from spmf_tpu.data import SparseCounts

    rng = np.random.default_rng(0)
    X = (rng.random((12, 6)) < 0.3) * rng.poisson(2.0, (12, 6))
    m = PoissonFactorization(latent_dim=2, feature_dim=6, u_tau_scale=0.1,
                             dtype="float64", scale_columns=False,
                             fused_likelihood=True)
    # auto mode, slab ceiling forced to 0: the scatter probe declines and
    # routes to the gather energy (same decision path as a fusion-shape
    # rejection — which must stay silent, record=False)
    m._DENSE_SCATTER_MAX_SLAB_BYTES = 0
    batch = next(iter(SparseCounts.from_dense(X).batch(12).as_coo()))
    key = jax.random.PRNGKey(0)
    samples = m._surrogate.sample(m.surrogate_params, key, (2,))
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        lp = m.unormalized_log_prob(data=batch, **samples)
    assert np.isfinite(np.asarray(lp)).all()
    assert not any("falling back to the XLA path" in str(w.message)
                   for w in caught)
    assert "COO gather energy" in m.fusion_inactive_reason


def test_coo_auto_dispatch_is_density_aware():
    """Auto mode routes ultra-sparse batches (padded nnz / (B*D) below
    _COO_ENERGY_MAX_DENSITY) to the flat-gather COO energy even when the
    dense slab would fit — the measured crossover is ~0.17% density
    (benchmarks/sparse_ab.py interleaved A/B; docs/gather_probe.json) —
    while ordinary scRNA densities keep the dense-scatter fused path."""
    from spmf_tpu.data import SparseCounts

    m = PoissonFactorization(latent_dim=2, feature_dim=7000,
                             u_tau_scale=0.1, dtype="float64",
                             scale_columns=False)
    # decision surface: B=100 x D=7000 = 700k cells; bound = 1050 nnz
    assert not m._sparse_dense_scatter(100, 1024)      # 0.146% -> COO
    dense_decision = m._sparse_dense_scatter(100, 2048)  # 0.293% -> slab
    # (on CPU the fused kernel gate may also decline; only the sparse
    # branch of the rule is asserted unconditionally)
    assert dense_decision == m._can_fuse((100, 7000), record=False)
    # forcing wins over the density rule
    m.sparse_dense_scatter = True
    assert m._sparse_dense_scatter(100, 1024)

    # end-to-end: an ultra-sparse batch dispatches the gather energy
    rng = np.random.default_rng(1)
    X = np.zeros((100, 7000))
    X[rng.integers(0, 100, 500), rng.integers(0, 7000, 500)] = \
        rng.poisson(2.0, 500) + 1.0
    m2 = PoissonFactorization(latent_dim=2, feature_dim=7000,
                              u_tau_scale=0.1, dtype="float64",
                              scale_columns=False)
    batch = next(iter(SparseCounts.from_dense(X).batch(100).as_coo()))
    assert batch["coo_rows"].shape[-1] / (100 * 7000) \
        < m2._COO_ENERGY_MAX_DENSITY
    key = jax.random.PRNGKey(0)
    samples = m2._surrogate.sample(m2.surrogate_params, key, (2,))
    lp = m2.unormalized_log_prob(data=batch, **samples)
    assert np.isfinite(np.asarray(lp)).all()
    assert "COO gather energy" in m2.fusion_inactive_reason


def test_log_likelihood_heldout_scoring():
    """model.log_likelihood: lppd-based predictive scoring (the BASELINE.md
    'held-out Poisson log-likelihood' metric). On bound data it equals
    waic()['lppd']; on a held-out split, training must improve it (the
    calibrated posterior beats the prior-scale init)."""
    rng = np.random.default_rng(0)
    X = rng.poisson(1.0, (100, 6))
    train = ArrayDataset(
        {"counts": X[:80], "indices": np.arange(80)}).batch(80)
    test = ArrayDataset(
        {"counts": X[80:], "indices": np.arange(20)}).batch(20)

    m = PoissonFactorization(latent_dim=2, feature_dim=6, u_tau_scale=0.1,
                             dtype="float64", data=train)
    before = m.log_likelihood(test, num_samples=20, seed=3)
    m.fit(batched_data_factory=train, num_steps=15, learning_rate=0.1,
          rel_tol=None, sample_size=4, verbose=False)
    after = m.log_likelihood(test, num_samples=20, seed=3)
    assert after["n_rows"] == 20
    assert np.isfinite(after["per_row"])
    assert after["per_row"] > before["per_row"]
    np.testing.assert_allclose(after["total"],
                               after["per_row"] * after["n_rows"],
                               rtol=1e-12)
    # bound-data consistency: same draws as waic -> total == lppd
    w = m.waic(num_samples=20, seed=3)
    ll = m.log_likelihood(num_samples=20, seed=3)
    np.testing.assert_allclose(ll["total"], w["lppd"], rtol=1e-12)
    assert ll["n_rows"] == 80 == w["n_rows"]


def test_dense_horseshoe_unit():
    """DenseHorseshoe direct coverage (reference API surface:
    poisson.py:763-789 — var_list, joint_prior, bijectors,
    assemble_networks): sample shapes, finite joint log_prob, forward
    shapes with leading sample dims, and the log_prob equals the sum of
    its per-variable parts."""
    from spmf_tpu.nn.dense import DenseHorseshoe

    net = DenseHorseshoe(5, [4, 3], dtype="float64")
    assert net.var_list == ["w_0", "b_0", "w_1", "b_1"]
    key = jax.random.PRNGKey(0)
    s = net.sample(key, (2,))
    assert s["w_0"].shape == (2, 5, 4) and s["b_1"].shape == (2, 1, 3)
    lp = net.log_prob(s)
    assert lp.shape == (2,) and np.isfinite(np.asarray(lp)).all()
    # joint = sum of independent parts
    parts = sum(
        net.joint_prior.model[k].log_prob(s[k]) for k in net.var_list
    )
    np.testing.assert_allclose(np.asarray(lp), np.asarray(parts), rtol=1e-12)
    # forward pass broadcasts the sample dim: (B,5) -> (2,B,3)
    f = net.assemble_networks(s)
    x = np.linspace(0, 1, 35).reshape(7, 5)
    out = np.asarray(f(x))
    assert out.shape == (2, 7, 3)
    assert np.isfinite(out).all()
    # single-draw params give an unbatched forward
    s1 = net.sample(jax.random.PRNGKey(1))
    out1 = np.asarray(net.assemble_networks(s1)(x))
    assert out1.shape == (7, 3)


def test_model_fit_forwards_checkpoint_full_state(tmp_path):
    """The strict fit-kwargs allowlist must pass checkpoint_full_state
    through to the engine (a typo'd engine option raises TypeError)."""
    rng = np.random.default_rng(0)
    X = rng.poisson(1.0, (40, 5))
    data = ArrayDataset({"counts": X, "indices": np.arange(40)}).batch(40)
    m = PoissonFactorization(latent_dim=2, feature_dim=5, u_tau_scale=0.1,
                             dtype="float64", data=data)
    m.fit(batched_data_factory=data, num_steps=2, learning_rate=0.1,
          rel_tol=None, sample_size=2, verbose=False,
          checkpoint_dir=str(tmp_path), checkpoint_full_state=False)
    import glob
    import os

    files = glob.glob(os.path.join(str(tmp_path), "**", "*.npz"),
                      recursive=True)
    assert files
    with np.load(max(files, key=os.path.getmtime)) as zf:
        assert "opt_0" not in zf  # params-only honored through model.fit
    with pytest.raises(TypeError, match="unknown keyword"):
        m.fit(batched_data_factory=data, num_steps=1, verbose=False,
              checkpoint_full_stat=True)  # typo must not be swallowed
