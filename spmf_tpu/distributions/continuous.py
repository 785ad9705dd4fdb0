"""Continuous distributions (JAX-native).

Covers every prior / surrogate family the reference uses
(reference: mederrata_spmf/poisson.py:228-401 and the bayesianquilts
``SqrtInverseGamma`` / ``AbsHorseshoe`` imports at poisson.py:16).
Log-probs are validated against scipy closed forms in
tests/test_distributions.py.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln

from .base import Distribution
from .special import log_exp1

__all__ = [
    "Normal",
    "HalfNormal",
    "Cauchy",
    "HalfCauchy",
    "Gamma",
    "InverseGamma",
    "SqrtInverseGamma",
    "LogNormal",
    "Horseshoe",
    "AbsHorseshoe",
]

_LOG_2PI = math.log(2.0 * math.pi)
_HALF_LOG_2_OVER_PI = 0.5 * math.log(2.0 / math.pi)
# log((2 pi^3)^{-1/2}) — normalizer of the exact horseshoe marginal
_LOG_HORSESHOE_K = -0.5 * math.log(2.0 * math.pi**3)


def _bshape(*arrs):
    shape = ()
    for a in arrs:
        shape = jnp.broadcast_shapes(shape, jnp.shape(a))
    return shape


class Normal(Distribution):
    def __init__(self, loc, scale):
        self.loc = jnp.asarray(loc)
        self.scale = jnp.asarray(scale)
        self.dtype = jnp.result_type(self.loc, self.scale)

    @property
    def batch_shape(self):
        return _bshape(self.loc, self.scale)

    def log_prob(self, x):
        z = (self._promote(x) - self.loc) / self.scale
        return -0.5 * z * z - jnp.log(self.scale) - 0.5 * _LOG_2PI

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        eps = jax.random.normal(key, shape, self.dtype)
        return self.loc + self.scale * eps

    def mean(self):
        return jnp.broadcast_to(self.loc, self.batch_shape)

    def entropy(self):
        return jnp.broadcast_to(
            0.5 * (1.0 + _LOG_2PI) + jnp.log(self.scale), self.batch_shape
        )


class HalfNormal(Distribution):
    """|Z|, Z ~ Normal(0, scale). reference: poisson.py:230 (``tfd.HalfNormal``)."""

    def __init__(self, scale):
        self.scale = jnp.asarray(scale)
        self.dtype = self.scale.dtype

    @property
    def batch_shape(self):
        return jnp.shape(self.scale)

    def log_prob(self, x):
        z = self._promote(x) / self.scale
        return _HALF_LOG_2_OVER_PI - jnp.log(self.scale) - 0.5 * z * z

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        return jnp.abs(jax.random.normal(key, shape, self.dtype)) * self.scale

    def mean(self):
        return self.scale * math.sqrt(2.0 / math.pi)


class Cauchy(Distribution):
    def __init__(self, loc, scale):
        self.loc = jnp.asarray(loc)
        self.scale = jnp.asarray(scale)
        self.dtype = jnp.result_type(self.loc, self.scale)

    @property
    def batch_shape(self):
        return _bshape(self.loc, self.scale)

    def log_prob(self, x):
        z = (self._promote(x) - self.loc) / self.scale
        return -jnp.log(jnp.pi * self.scale) - jnp.log1p(z * z)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        u = jax.random.uniform(key, shape, self.dtype, minval=1e-7, maxval=1.0 - 1e-7)
        return self.loc + self.scale * jnp.tan(jnp.pi * (u - 0.5))


class HalfCauchy(Distribution):
    """reference: poisson.py:253 (``tfd.HalfCauchy`` horseshoe hyperpriors)."""

    def __init__(self, loc, scale):
        self.loc = jnp.asarray(loc)
        self.scale = jnp.asarray(scale)
        self.dtype = jnp.result_type(self.loc, self.scale)

    @property
    def batch_shape(self):
        return _bshape(self.loc, self.scale)

    def log_prob(self, x):
        z = (self._promote(x) - self.loc) / self.scale
        return math.log(2.0 / math.pi) - jnp.log(self.scale) - jnp.log1p(z * z)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        u = jax.random.uniform(key, shape, self.dtype, minval=1e-7, maxval=1.0 - 1e-7)
        return self.loc + self.scale * jnp.tan(jnp.pi * u / 2.0)


class Gamma(Distribution):
    def __init__(self, concentration, rate=None, scale=None):
        if (rate is None) == (scale is None):
            raise ValueError("Provide exactly one of rate / scale")
        self.concentration = jnp.asarray(concentration)
        self.rate = jnp.asarray(rate) if rate is not None else 1.0 / jnp.asarray(scale)
        self.dtype = jnp.result_type(self.concentration, self.rate)

    @property
    def batch_shape(self):
        return _bshape(self.concentration, self.rate)

    def log_prob(self, x):
        x = self._promote(x)
        a, b = self.concentration, self.rate
        return a * jnp.log(b) + (a - 1.0) * jnp.log(x) - b * x - gammaln(a)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        a = jnp.broadcast_to(self.concentration, shape).astype(self.dtype)
        # jax.random.gamma implements implicit reparameterization gradients
        # w.r.t. the concentration — this is what makes the horseshoe(+)
        # InverseGamma surrogates trainable by ADVI.
        return jax.random.gamma(key, a, dtype=self.dtype) / self.rate

    def mean(self):
        return self.concentration / self.rate


class InverseGamma(Distribution):
    """reference: poisson.py:313 (``tfd.InverseGamma`` horseshoe+ auxiliaries)."""

    def __init__(self, concentration, scale):
        self.concentration = jnp.asarray(concentration)
        self.scale = jnp.asarray(scale)
        self.dtype = jnp.result_type(self.concentration, self.scale)

    @property
    def batch_shape(self):
        return _bshape(self.concentration, self.scale)

    def log_prob(self, x):
        x = self._promote(x)
        a, b = self.concentration, self.scale
        return a * jnp.log(b) - (a + 1.0) * jnp.log(x) - b / x - gammaln(a)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        a = jnp.broadcast_to(self.concentration, shape).astype(self.dtype)
        g = jax.random.gamma(key, a, dtype=self.dtype)
        # guard b/g against a float32 gamma underflow in the extreme tail
        g = jnp.maximum(g, jnp.sqrt(jnp.finfo(self.dtype).tiny))
        return self.scale / g

    def mean(self):
        # defined for concentration > 1
        return self.scale / (self.concentration - 1.0)


class SqrtInverseGamma(Distribution):
    """Distribution of sqrt(Y) with Y ~ InverseGamma(concentration, scale).

    Rebuild of ``bayesianquilts.distributions.SqrtInverseGamma``
    (reference import: mederrata_spmf/poisson.py:16; used for the
    Makalic–Schmidt half-Cauchy decomposition at poisson.py:303-341).
    """

    def __init__(self, concentration, scale):
        self.ig = InverseGamma(concentration, scale)
        self.dtype = self.ig.dtype

    @property
    def batch_shape(self):
        return self.ig.batch_shape

    def log_prob(self, x):
        # p_X(x) = p_Y(x^2) * 2x, expanded in log space so x^2 never
        # materializes (x > 1.8e19 would overflow float32):
        #   a log b - (2a+1) log x - b e^{-2 log x} - lgamma(a) + log 2
        x = self._promote(x)
        a, b = self.ig.concentration, self.ig.scale
        logx = jnp.log(x)
        return (
            a * jnp.log(b)
            - (2.0 * a + 1.0) * logx
            - jnp.exp(jnp.log(b) - 2.0 * logx)
            - gammaln(a)
            + math.log(2.0)
        )

    def sample(self, key, sample_shape=()):
        return jnp.sqrt(self.ig.sample(key, sample_shape))


class LogNormal(Distribution):
    def __init__(self, loc, scale):
        self.normal = Normal(loc, scale)
        self.dtype = self.normal.dtype

    @property
    def batch_shape(self):
        return self.normal.batch_shape

    def log_prob(self, x):
        x = self._promote(x)
        return self.normal.log_prob(jnp.log(x)) - jnp.log(x)

    def sample(self, key, sample_shape=()):
        return jnp.exp(self.normal.sample(key, sample_shape))

    def mean(self):
        return jnp.exp(self.normal.loc + 0.5 * self.normal.scale**2)


class Horseshoe(Distribution):
    """Horseshoe prior marginal: x | lam ~ N(0, lam^2 scale^2), lam ~ C+(0,1).

    Exact marginal density p(x) = (2 pi^3)^{-1/2} e^{z} E1(z) / scale with
    z = x^2 / (2 scale^2) (TFP approximates this; we use the exact form —
    reference: tfd.Horseshoe used by mederrata_spmf/gaussian.py:402-414).
    """

    def __init__(self, scale):
        self.scale = jnp.asarray(scale)
        self.dtype = self.scale.dtype

    @property
    def batch_shape(self):
        return jnp.shape(self.scale)

    def log_prob(self, x):
        x = self._promote(x)
        z = jnp.square(x / self.scale) / 2.0
        # guard z=0: density diverges logarithmically; clamp like TFP does
        z = jnp.maximum(z, jnp.finfo(self.dtype).tiny)
        return _LOG_HORSESHOE_K - jnp.log(self.scale) + z + log_exp1(z)

    def sample(self, key, sample_shape=()):
        k1, k2 = jax.random.split(key)
        shape = tuple(sample_shape) + self.batch_shape
        lam = jnp.abs(
            jnp.tan(
                jnp.pi / 2.0
                * jax.random.uniform(k1, shape, self.dtype, minval=1e-7, maxval=1.0 - 1e-7)
            )
        )
        return jax.random.normal(k2, shape, self.dtype) * lam * self.scale


class AbsHorseshoe(Horseshoe):
    """|X| for X ~ Horseshoe(scale) — rebuild of
    ``bayesianquilts.distributions.AbsHorseshoe`` (reference import:
    mederrata_spmf/poisson.py:16, used at poisson.py:381-397)."""

    def log_prob(self, x):
        return super().log_prob(x) + math.log(2.0)

    def sample(self, key, sample_shape=()):
        return jnp.abs(super().sample(key, sample_shape))
