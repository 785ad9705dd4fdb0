"""Distribution base classes.

Idiomatic-JAX rebuild of the distribution objects the reference pulls from
TFP / bayesianquilts (reference: mederrata_spmf/poisson.py:11-20). These are
lightweight, stateless pytree-friendly objects: parameters are arrays captured
at construction, all methods are pure and trace cleanly under ``jax.jit``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["Distribution", "Independent"]


class Distribution:
    """Minimal distribution interface: elementwise log_prob + sampling."""

    #: dtype of the distribution's parameters / samples
    dtype = None

    def log_prob(self, x):  # pragma: no cover - interface
        raise NotImplementedError

    def sample(self, key, sample_shape=()):  # pragma: no cover - interface
        raise NotImplementedError

    def mean(self):  # pragma: no cover - interface
        raise NotImplementedError

    @property
    def batch_shape(self):
        """Broadcast shape of the parameters."""
        raise NotImplementedError

    def _promote(self, x):
        return jnp.asarray(x, self.dtype)


class Independent(Distribution):
    """Reinterpret the last ``reinterpreted_batch_ndims`` batch dims as event
    dims: ``log_prob`` sums over them (mirrors ``tfd.Independent``,
    reference: mederrata_spmf/poisson.py:229-242)."""

    def __init__(self, distribution, reinterpreted_batch_ndims=1):
        self.distribution = distribution
        self.reinterpreted_batch_ndims = int(reinterpreted_batch_ndims)

    @property
    def dtype(self):
        return self.distribution.dtype

    @property
    def batch_shape(self):
        shape = self.distribution.batch_shape
        k = self.reinterpreted_batch_ndims
        return shape[: len(shape) - k] if k else shape

    def log_prob(self, x):
        lp = self.distribution.log_prob(x)
        k = self.reinterpreted_batch_ndims
        if k == 0:
            return lp
        return jnp.sum(lp, axis=tuple(range(-k, 0)))

    def sample(self, key, sample_shape=()):
        return self.distribution.sample(key, sample_shape)

    def mean(self):
        return self.distribution.mean()
