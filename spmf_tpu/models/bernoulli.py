"""Bernoulli-decoder sparse factorization.

Reference: mederrata_spmf/bernoulli.py:32-649. Subclasses the Poisson model
and swaps: likelihood -> Bernoulli(logits=rate) (bernoulli.py:148), v/w
priors -> real-valued Normal with Identity bijectors (bernoulli.py:187-217),
encode -> no row scaling (bernoulli.py:572-589).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from spmf_tpu import bijectors as tfb
from spmf_tpu import distributions as tfd
from spmf_tpu.models.poisson import PoissonFactorization
from spmf_tpu.vi.surrogates import TrainableNormal, TransformedSurrogate

__all__ = ["BernoulliFactorization"]


class BernoulliFactorization(PoissonFactorization):
    """Sparse (horseshoe) Bernoulli matrix factorization
    (reference: mederrata_spmf/bernoulli.py:32)."""

    def __init__(
        self,
        latent_dim=None,
        feature_dim=None,
        u_tau_scale=0.01,
        s_tau_scale=1.0,
        symmetry_breaking_decay=0.99,
        strategy=None,
        mesh=None,
        encoder_function=None,
        decoder_function=None,
        log_transform=False,
        horshoe_plus=True,
        horseshoe_plus=None,
        column_norms=None,
        count_key="counts",
        dtype=None,
        data=None,
        **kwargs,
    ):
        # reference bernoulli.py:64-80 exposes no scale_rows/scale_columns;
        # row scaling is dropped in encode() below regardless.
        super().__init__(
            latent_dim=latent_dim,
            feature_dim=feature_dim,
            u_tau_scale=u_tau_scale,
            s_tau_scale=s_tau_scale,
            symmetry_breaking_decay=symmetry_breaking_decay,
            strategy=strategy,
            mesh=mesh,
            encoder_function=encoder_function,
            decoder_function=decoder_function,
            log_transform=log_transform,
            horshoe_plus=horshoe_plus,
            horseshoe_plus=horseshoe_plus,
            column_norms=column_norms,
            count_key=count_key,
            dtype=dtype,
            data=data,
            **kwargs,
        )

    def _vw_bijectors(self):
        return {"v": tfb.Identity(), "w": tfb.Identity()}

    def _vw_priors(self, ones):
        D, K = self.feature_dim, self.latent_dim
        # reference bernoulli.py:200-216: v ~ Normal(0, 0.1), w ~ Normal(0, 1)
        return {
            "v": tfd.Independent(
                tfd.Normal(loc=0.0 * ones(K, D), scale=0.1 * ones(K, D)), 2
            ),
            "w": tfd.Independent(
                tfd.Normal(loc=0.0 * ones(1, D), scale=ones(1, D)), 2
            ),
        }

    def _fused_kind(self):
        # the fused Pallas kernels implement the Bernoulli(logits)
        # likelihood natively (spmf_tpu.ops.fused_poisson 'bernoulli')
        return "bernoulli"

    def _observation_distribution(self, rate):
        """rate plays the role of logits (reference bernoulli.py:148)."""
        return tfd.Bernoulli(logits=rate)

    def encode(self, x, u=None, s=None):
        """theta = g(x) @ A — no row-scaling branch
        (reference bernoulli.py:572-589)."""
        u = self.calibrated_expectations["u"] if u is None else u
        s = self.calibrated_expectations["s"] if s is None else s
        x = jnp.asarray(x, self.dtype)
        return jnp.matmul(self.encoder_function(x), self.encoding_matrix(u, s))
