"""Gaussian-prior (signed-loadings) sparse factorization.

Reference: mederrata_spmf/gaussian.py:30-753. Differences vs the Poisson
model: real-valued priors (u/v/w ~ Normal with Identity bijectors,
gaussian.py:228-272), Normal(0,1) theta prior (gaussian.py:632-638),
``prior_weight`` forwarded correctly (gaussian.py:600-605). NOTE the
reference's observation model is *still* Poisson (gaussian.py:195) —
"Gaussian" refers to the prior structure. We reproduce that faithfully as
the default, and additionally offer ``observation_model='normal'`` (a true
Normal likelihood decoder, net-new per BASELINE.json).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from spmf_tpu import bijectors as tfb
from spmf_tpu import distributions as tfd
from spmf_tpu.models.poisson import PoissonFactorization
from spmf_tpu.vi.surrogates import TrainableNormal, TransformedSurrogate

__all__ = ["GaussianFactorization"]


class GaussianFactorization(PoissonFactorization):
    """Signed-loadings factorization (reference: mederrata_spmf/gaussian.py:30)."""

    _u_signed = True

    def __init__(self, *args, observation_model="poisson", obs_scale=1.0, **kwargs):
        self.observation_model = observation_model
        self.obs_scale = obs_scale
        super().__init__(*args, **kwargs)

    def _vw_bijectors(self):
        # reference gaussian.py:228-235: Identity on u, v, w
        return {"v": tfb.Identity(), "w": tfb.Identity()}

    def _vw_priors(self, ones):
        D, K = self.feature_dim, self.latent_dim
        # reference gaussian.py:241-260: v ~ Normal(0, 0.1), w ~ Normal(0, 1)
        return {
            "v": tfd.Independent(
                tfd.Normal(loc=0.0 * ones(K, D), scale=0.1 * ones(K, D)), 2
            ),
            "w": tfd.Independent(
                tfd.Normal(loc=0.0 * ones(1, D), scale=ones(1, D)), 2
            ),
        }

    def _vw_surrogates(self, ones):
        D, K = self.feature_dim, self.latent_dim
        # reference gaussian.py:427-443: v loc -5 scale 5e-4; w loc 0.5 scale 1e-3
        return {
            "v": TransformedSurrogate(
                TrainableNormal(-5.0 * ones(K, D), 5e-4 * ones(K, D), 2),
                self.bijectors["v"],
            ),
            "w": TransformedSurrogate(
                TrainableNormal(0.5 * ones(1, D), 1e-3 * ones(1, D), 2),
                self.bijectors["w"],
            ),
        }

    def _theta_prior_log_prob(self, theta):
        # reference gaussian.py:632-638: Normal(0, 1) instead of HalfNormal
        rv = tfd.Independent(
            tfd.Normal(loc=jnp.zeros_like(theta), scale=jnp.ones_like(theta)), 2
        )
        return rv.log_prob(theta)

    def _fused_kind(self):
        # poisson-obs (the faithful reference mode, gaussian.py:195) shares
        # the Poisson kernel; the net-new normal-obs mode gets the
        # ('normal', obs_scale) kernel branch
        if self.observation_model == "poisson":
            return "poisson"
        if self.observation_model == "normal":
            return ("normal", float(self.obs_scale))
        return None

    def _observation_distribution(self, rate):
        if self.observation_model == "normal":
            return tfd.Normal(loc=rate, scale=jnp.asarray(self.obs_scale, self.dtype))
        # faithful mode: Poisson likelihood (reference gaussian.py:195)
        return tfd.Poisson(rate=rate)

    def unormalized_log_prob(self, data=None, prior_weight=1.0, **params):
        # unlike the Poisson/Bernoulli quirk, the Gaussian model forwards
        # prior_weight correctly (reference gaussian.py:600-605)
        parts = self.unormalized_log_prob_parts(
            data, prior_weight=prior_weight, **params
        )
        out = 0.0
        for v in parts.values():
            out = out + v
        return out

    def _config(self):
        cfg = super()._config()
        cfg.update(observation_model=self.observation_model, obs_scale=float(self.obs_scale))
        return cfg
