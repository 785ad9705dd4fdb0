"""Discrete observation distributions.

Poisson is the reference's flagship likelihood
(reference: mederrata_spmf/poisson.py:177-183), Bernoulli the binary-data
decoder (reference: mederrata_spmf/bernoulli.py:148).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln

from .base import Distribution

__all__ = ["Poisson", "Bernoulli"]


class Poisson(Distribution):
    def __init__(self, rate=None, log_rate=None):
        if (rate is None) == (log_rate is None):
            raise ValueError("Provide exactly one of rate / log_rate")
        if rate is not None:
            self.rate = jnp.asarray(rate)
            self._log_rate = None
        else:
            self._log_rate = jnp.asarray(log_rate)
            self.rate = jnp.exp(self._log_rate)
        self.dtype = self.rate.dtype

    @property
    def log_rate(self):
        if self._log_rate is not None:
            return self._log_rate
        return jnp.log(self.rate)

    @property
    def batch_shape(self):
        return jnp.shape(self.rate)

    def log_prob(self, x):
        """x * log(rate) - rate - lgamma(x+1).

        The log uses max(rate, tiny): in float32 the positive-by-construction
        rates of the factorization models can underflow to exactly 0, and a
        bare log(0) poisons *gradients* through the downstream finite-masking
        (the where-NaN-grad trap) even though the masked value is correct.
        With the floor, rate==0 & x>0 gives a hugely negative finite value
        (clipped by the energy's min_val exactly like the reference's
        non-finite path, poisson.py:606-616), and rate==0 & x==0 gives 0 —
        the mathematically correct lp(0|0), where the reference produced NaN.
        Negative rates still propagate NaN (reference behavior).
        """
        x = self._promote(x)
        if self._log_rate is not None:
            log_rate = self._log_rate
        else:
            tiny = jnp.finfo(self.dtype).tiny
            log_rate = jnp.log(jnp.maximum(self.rate, tiny))
            log_rate = jnp.where(self.rate < 0, jnp.nan, log_rate)
        return x * log_rate - self.rate - gammaln(x + 1.0)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        lam = jnp.broadcast_to(self.rate, shape)
        return jax.random.poisson(key, lam, shape).astype(self.dtype)

    def mean(self):
        return self.rate


class Bernoulli(Distribution):
    def __init__(self, logits=None, probs=None):
        if (logits is None) == (probs is None):
            raise ValueError("Provide exactly one of logits / probs")
        if logits is not None:
            self.logits = jnp.asarray(logits)
        else:
            p = jnp.asarray(probs)
            self.logits = jnp.log(p) - jnp.log1p(-p)
        self.dtype = self.logits.dtype

    @property
    def batch_shape(self):
        return jnp.shape(self.logits)

    def log_prob(self, x):
        x = self._promote(x)
        # x*logits - softplus(logits), stable for large |logits|
        return x * self.logits - jax.nn.softplus(self.logits)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        return jax.random.bernoulli(key, jax.nn.sigmoid(self.logits), shape).astype(
            self.dtype
        )

    def mean(self):
        return jax.nn.sigmoid(self.logits)
