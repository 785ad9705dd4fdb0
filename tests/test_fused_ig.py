"""Math of the fused IG-sampler kernel (spmf_tpu/ops/fused_ig.py).

The kernel itself needs TPU hardware RNG (no interpret-mode support), so the
default CPU suite pins the shared pure-JAX tile math instead:

- the hand-derived VJP (_tile_bwd) against jax autodiff of the full forward
  chain (including the gradient that flows through the Stuart log-uniform
  sums), and
- the elementwise logq against an independent IG-density + softplus-fldj
  computation.

The kernel's RNG plumbing is validated on TPU by
benchmarks/validate_fused_ig_tpu.py (statistical + finite-difference checks,
results recorded in docs/PARITY.md).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import special, stats

from spmf_tpu.ops.fused_ig import (
    BOOST,
    _softplus,
    _tile_bwd,
    _tile_fwd,
    _wh_gamma,
)

RNG = np.random.default_rng(0)
N = 512


def _full_chain(a, b, eps, logu):
    """Forward as a function of (a, b) only — randomness held fixed — so
    autodiff produces the exact pathwise gradient the kernel must match."""
    logb = jnp.log(b)
    t0 = a * logb - jax.lax.lgamma(a)
    s1 = 0.0
    for k in range(BOOST):
        s1 = s1 + logu[k] / (a + float(k))
    return _tile_fwd(a, b, logb, t0, eps, s1)


def _draws(n=N):
    a = jnp.asarray(RNG.uniform(0.6, 6.0, n), jnp.float64)
    b = jnp.asarray(RNG.uniform(0.2, 4.0, n), jnp.float64)
    eps = jnp.asarray(RNG.normal(0.0, 1.0, n), jnp.float64)
    logu = jnp.asarray(np.log(RNG.uniform(1e-6, 1.0, (BOOST, n))), jnp.float64)
    return a, b, eps, logu


def test_tile_bwd_matches_autodiff():
    a, b, eps, logu = _draws()
    gy = jnp.asarray(RNG.normal(0.0, 1.0, N), jnp.float64)
    glq = jnp.asarray(RNG.normal(0.0, 1.0, ()), jnp.float64)

    def scalar_loss(a_, b_):
        y, lq = _full_chain(a_, b_, eps, logu)
        return jnp.sum(y * gy) + glq * jnp.sum(lq)

    ga_ad, gb_ad = jax.grad(scalar_loss, (0, 1))(a, b)

    # hand-derived path (what the backward kernel computes)
    s1 = sum(logu[k] / (a + float(k)) for k in range(BOOST))
    s2 = sum(logu[k] / (a + float(k)) ** 2 for k in range(BOOST))
    dg0 = jnp.log(b) - jax.lax.digamma(a)
    dy_da, dy_db, dlq_da, dlq_db = _tile_bwd(a, b, jnp.log(b), dg0, eps, s1, s2)
    ga = gy * dy_da + glq * dlq_da
    gb = gy * dy_db + glq * dlq_db

    np.testing.assert_allclose(np.asarray(ga), np.asarray(ga_ad),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gb_ad),
                               rtol=1e-9, atol=1e-12)


def test_tile_fwd_logq_matches_direct_density():
    """lq must equal log IG(x; a, b) + softplus(-x) for x = b / G_a
    (the - fldj of the softplus bijector is -log sigmoid(x) = +softplus(-x))."""
    a, b, eps, logu = _draws()
    s1 = sum(logu[k] / (a + float(k)) for k in range(BOOST))
    y, lq = _tile_fwd(a, b, jnp.log(b), a * jnp.log(b) - jax.lax.lgamma(a),
                      eps, s1)
    g = _wh_gamma(a, eps, s1)
    x = np.asarray(b / g)
    direct = (
        stats.invgamma.logpdf(x, np.asarray(a), scale=np.asarray(b))
        + np.asarray(_softplus(-jnp.asarray(x)))
    )
    np.testing.assert_allclose(np.asarray(lq), direct, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(y), np.log1p(np.exp(x)), rtol=1e-9)


def test_tile_fwd_matches_surrogate_sampler_math():
    """The WH gamma inside the kernel must be the exact sampler the XLA path
    uses (spmf_tpu.ops.gamma.wilson_hilferty_gamma) given the same base
    randomness."""
    from spmf_tpu.ops.gamma import _wh_value

    a, _, eps, logu = _draws()
    s1 = sum(logu[k] / (a + float(k)) for k in range(BOOST))
    np.testing.assert_allclose(
        np.asarray(_wh_gamma(a, eps, s1)),
        np.asarray(_wh_value(a, eps, s1, BOOST)),
        rtol=1e-12,
    )


def test_normal_tile_bwd_matches_autodiff():
    """Hand-derived VJP of the fused Normal sampler tile math vs autodiff
    (spmf_tpu/ops/fused_normal.py), both bijector branches."""
    from spmf_tpu.ops.fused_normal import _ntile_bwd, _ntile_fwd

    loc = jnp.asarray(RNG.normal(0.0, 2.0, N), jnp.float64)
    rs = jnp.asarray(RNG.normal(0.0, 1.5, N), jnp.float64)
    eps = jnp.asarray(RNG.normal(0.0, 1.0, N), jnp.float64)
    mask = jnp.asarray((RNG.random(N) < 0.5).astype(np.float64))
    gy = jnp.asarray(RNG.normal(0.0, 1.0, N), jnp.float64)
    glq = jnp.asarray(RNG.normal(0.0, 1.0, ()), jnp.float64)

    def scalar_loss(loc_, rs_):
        scale = jax.nn.softplus(rs_)
        y, lq = _ntile_fwd(loc_, scale, jnp.log(scale), mask, eps)
        return jnp.sum(y * gy) + glq * jnp.sum(lq)

    gl_ad, gr_ad = jax.grad(scalar_loss, (0, 1))(loc, rs)

    scale = jax.nn.softplus(rs)
    dy_dloc, dy_drs, dlq_dloc, dlq_drs = _ntile_bwd(
        loc, scale, jax.nn.sigmoid(rs), mask, eps
    )
    gl = gy * dy_dloc + glq * dlq_dloc
    gr = gy * dy_drs + glq * dlq_drs
    np.testing.assert_allclose(np.asarray(gl), np.asarray(gl_ad),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(gr), np.asarray(gr_ad),
                               rtol=1e-9, atol=1e-12)


def test_normal_tile_fwd_matches_surrogate_math():
    """y and logq must equal the XLA _sample_normals math given the same
    eps: x = loc + scale*eps, logq = N(x; loc, scale) - fldj."""
    from scipy import stats as st

    from spmf_tpu.ops.fused_normal import _ntile_fwd

    loc = RNG.normal(0.0, 2.0, N)
    rs = RNG.normal(0.0, 1.5, N)
    eps = RNG.normal(0.0, 1.0, N)
    scale = np.log1p(np.exp(rs))
    for m in (0.0, 1.0):
        mask = np.full(N, m)
        y, lq = _ntile_fwd(jnp.asarray(loc), jnp.asarray(scale),
                           jnp.asarray(np.log(scale)), jnp.asarray(mask),
                           jnp.asarray(eps))
        x = loc + scale * eps
        expect_y = np.log1p(np.exp(-np.abs(x))) + np.maximum(x, 0) if m else x
        np.testing.assert_allclose(np.asarray(y), expect_y, rtol=1e-12)
        expect_lq = st.norm.logpdf(x, loc, scale)
        if m:
            expect_lq += np.log1p(np.exp(-np.abs(-x))) + np.maximum(-x, 0)
        np.testing.assert_allclose(np.asarray(lq), expect_lq, rtol=1e-9)
