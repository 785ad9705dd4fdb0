"""Trainable mean-field surrogate posteriors.

Rebuild of ``bayesianquilts.vi.advi`` (reference imports:
mederrata_spmf/poisson.py:19-20):

- ``build_trainable_normal_dist(loc, scale, ndims)``  -> TrainableNormal
- ``build_trainable_InverseGamma_dist(conc, scale, ndims)`` -> TrainableInverseGamma
- bijector wrapping ``self.bijectors['u'](dist)``      -> TransformedSurrogate
- the assembled ``tfd.JointDistributionNamed(surrogate_dict)`` -> SurrogatePosterior

Everything is a pure function of a parameter pytree: ``init()`` builds the
initial (unconstrained) parameters, ``sample_and_log_prob(params, key, shape)``
draws reparameterized samples together with their log-density (computed in
pre-bijector space for stability, then corrected by the forward
log-det-Jacobian).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from spmf_tpu import bijectors as tfb
from spmf_tpu import distributions as tfd

__all__ = [
    "TrainableNormal",
    "TrainableInverseGamma",
    "TransformedSurrogate",
    "SurrogatePosterior",
    "build_trainable_normal_dist",
    "build_trainable_InverseGamma_dist",
    "build_surrogate_posterior",
]

_softplus = tfb.Softplus()


def _sum_event(x, event_ndims):
    if event_ndims == 0:
        return x
    return jnp.sum(x, axis=tuple(range(-event_ndims, 0)))


class TrainableNormal:
    """Mean-field Normal with trainable loc and softplus-parameterized scale.

    Mirrors bayesianquilts ``build_trainable_normal_dist`` (call sites e.g.
    reference poisson.py:404-414: loc init -6, scale init 5e-4)."""

    def __init__(self, loc, scale, event_ndims=None, dtype=None):
        loc = jnp.asarray(loc, dtype)
        scale = jnp.asarray(scale, dtype)
        self.dtype = loc.dtype
        self.shape = jnp.broadcast_shapes(loc.shape, scale.shape)
        self.event_ndims = len(self.shape) if event_ndims is None else int(event_ndims)
        self._loc0 = jnp.broadcast_to(loc, self.shape).astype(self.dtype)
        self._raw_scale0 = _softplus.inverse(
            jnp.broadcast_to(scale, self.shape).astype(self.dtype)
        )

    def init(self) -> Dict[str, jnp.ndarray]:
        return {"loc": self._loc0, "raw_scale": self._raw_scale0}

    def dist(self, params):
        return tfd.Normal(params["loc"], _softplus.forward(params["raw_scale"]))

    def sample_and_log_prob(self, params, key, sample_shape=()):
        d = self.dist(params)
        x = d.sample(key, sample_shape)
        return x, _sum_event(d.log_prob(x), self.event_ndims)

    def log_prob(self, params, x):
        return _sum_event(self.dist(params).log_prob(x), self.event_ndims)

    def mean(self, params):
        return params["loc"]


class TrainableInverseGamma:
    """Trainable InverseGamma surrogate (softplus-parameterized concentration
    and scale). Used for horseshoe(+) auxiliary variables; gradients flow via
    JAX's implicit-reparameterized ``random.gamma``.

    Mirrors bayesianquilts ``build_trainable_InverseGamma_dist`` (call sites
    e.g. reference poisson.py:438-459)."""

    def __init__(self, concentration, scale, event_ndims=None, dtype=None):
        conc = jnp.asarray(concentration, dtype)
        scale = jnp.asarray(scale, dtype)
        self.dtype = conc.dtype
        self.shape = jnp.broadcast_shapes(conc.shape, scale.shape)
        self.event_ndims = len(self.shape) if event_ndims is None else int(event_ndims)
        self._raw_conc0 = _softplus.inverse(
            jnp.broadcast_to(conc, self.shape).astype(self.dtype)
        )
        self._raw_scale0 = _softplus.inverse(
            jnp.broadcast_to(scale, self.shape).astype(self.dtype)
        )

    def init(self) -> Dict[str, jnp.ndarray]:
        return {"raw_concentration": self._raw_conc0, "raw_scale": self._raw_scale0}

    def dist(self, params):
        return tfd.InverseGamma(
            _softplus.forward(params["raw_concentration"]),
            _softplus.forward(params["raw_scale"]),
        )

    def sample_and_log_prob(self, params, key, sample_shape=()):
        d = self.dist(params)
        x = d.sample(key, sample_shape)
        return x, _sum_event(d.log_prob(x), self.event_ndims)

    def log_prob(self, params, x):
        return _sum_event(self.dist(params).log_prob(x), self.event_ndims)

    def mean(self, params):
        return self.dist(params).mean()


class TransformedSurrogate:
    """base surrogate pushed through a bijector: y = b(x).

    log q(y) = log q_base(x) - fldj(x), accumulated in base space
    (reference pattern: ``self.bijectors['u'](build_trainable_normal_dist(...))``,
    poisson.py:427-437).
    """

    def __init__(self, base, bijector):
        self.base = base
        self.bijector = bijector or tfb.Identity()

    @property
    def event_ndims(self):
        return self.base.event_ndims

    @property
    def shape(self):
        return self.base.shape

    def init(self):
        return self.base.init()

    def sample_and_log_prob(self, params, key, sample_shape=()):
        x, lp = self.base.sample_and_log_prob(params, key, sample_shape)
        fldj = _sum_event(self.bijector.forward_log_det_jacobian(x), self.base.event_ndims)
        return self.bijector.forward(x), lp - fldj

    def log_prob(self, params, y):
        x = self.bijector.inverse(y)
        fldj = _sum_event(self.bijector.forward_log_det_jacobian(x), self.base.event_ndims)
        return self.base.log_prob(params, x) - fldj

    def mean(self, params, key=None, num_samples=250):
        """Posterior-mean estimate of the *constrained* variable (sampled;
        softplus of a Normal has no closed-form mean)."""
        if key is None:
            key = jax.random.PRNGKey(42)
        y, _ = self.sample_and_log_prob(params, key, (num_samples,))
        return jnp.mean(y, axis=0)


class SurrogatePosterior:
    """Named mean-field surrogate: dict of independent TransformedSurrogates.

    Plays the role of the reference's surrogate
    ``tfd.JointDistributionNamed(surrogate_dict)`` (poisson.py:567-569).
    """

    def __init__(self, surrogates: Dict[str, TransformedSurrogate]):
        self.surrogates = dict(surrogates)

    @property
    def names(self):
        return list(self.surrogates.keys())

    def init(self):
        return {k: s.init() for k, s in self.surrogates.items()}

    def sample_and_log_prob(self, params, key, sample_shape=()):
        keys = jax.random.split(key, len(self.surrogates))
        values, logq = {}, 0.0
        for k, (name, s) in zip(keys, self.surrogates.items()):
            values[name], lp = s.sample_and_log_prob(params[name], k, sample_shape)
            logq = logq + lp
        return values, logq

    def sample(self, params, key, sample_shape=()):
        return self.sample_and_log_prob(params, key, sample_shape)[0]

    def log_prob(self, params, values):
        logq = 0.0
        for name, s in self.surrogates.items():
            logq = logq + s.log_prob(params[name], values[name])
        return logq

    def mean(self, params, key=None, num_samples=250):
        """Calibrated expectations (reference
        ``set_calibration_expectations()``, poisson.py:573)."""
        if key is None:
            key = jax.random.PRNGKey(42)
        keys = jax.random.split(key, len(self.surrogates))
        return {
            name: s.mean(params[name], k, num_samples)
            for k, (name, s) in zip(keys, self.surrogates.items())
        }


def build_trainable_normal_dist(loc, scale, ndims=None, dtype=None, strategy=None):
    """API-parity helper (bayesianquilts.vi.advi.build_trainable_normal_dist).
    ``strategy`` accepted and ignored — sharding is orthogonal in spmf_tpu."""
    del strategy
    return TrainableNormal(loc, scale, event_ndims=ndims, dtype=dtype)


def build_trainable_InverseGamma_dist(concentration, scale, ndims=None, dtype=None, strategy=None):
    del strategy
    return TrainableInverseGamma(concentration, scale, event_ndims=ndims, dtype=dtype)


def build_surrogate_posterior(joint_prior, bijectors, dtype=None, strategy=None):
    """Auto-build a mean-field surrogate for an arbitrary named joint prior
    (bayesianquilts.vi.advi.build_surrogate_posterior; reference call site:
    poisson.py:778-781 for the PoissonAutoencoder).

    Strategy: for each variable, a TrainableNormal in unconstrained space,
    initialized near zero with small scale, pushed through the model bijector.
    """
    del strategy
    # Draw a deterministic structure sample to get shapes
    probe = joint_prior.sample(jax.random.PRNGKey(0))
    surrogates = {}
    for name, val in probe.items():
        b = bijectors.get(name, tfb.Identity()) if isinstance(bijectors, dict) else tfb.Identity()
        loc = jnp.full(jnp.shape(val), -3.0, dtype or val.dtype)
        if isinstance(b, tfb.Identity):
            loc = jnp.zeros(jnp.shape(val), dtype or val.dtype)
        scale = jnp.full(jnp.shape(val), 1e-3, dtype or val.dtype)
        surrogates[name] = TransformedSurrogate(
            TrainableNormal(loc, scale, event_ndims=len(jnp.shape(val))), b
        )
    return SurrogatePosterior(surrogates)
