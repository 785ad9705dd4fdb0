"""Mixed-type decoder factorization.

The reference planned this component but never wrote it
(mederrata_spmf/mixed.py is 0 bytes — SURVEY.md §2.5); BASELINE.json lists
"mixed/gaussian/bernoulli decoders ... on mixed-type synthetic matrix" among
the target configs. Design (net-new): one shared sparse encoder
(horseshoe+ u/s machinery inherited from PoissonFactorization) with a
per-column-block likelihood dispatch:

- 'poisson'   columns: x_ij ~ Poisson(softplus(rate_ij))
- 'bernoulli' columns: x_ij ~ Bernoulli(logits=rate_ij)
- 'normal'    columns: x_ij ~ Normal(rate_ij, obs_scale)

Because Bernoulli/Normal columns need signed natural parameters, v and w get
real-valued Normal priors with Identity bijectors (as in the Bernoulli
reference model, bernoulli.py:187-217) and Poisson columns are kept positive
through a softplus link. Column types are static and ride a (1, D) code lane
into ONE fused kernel pass (ops/fused_poisson likelihood=('mixed', s)):
a vectorized per-column select, no gather/scatter, and the lane shards over
'fp' like eta — so the mixed family composes with dp x fp meshes through
the same sharded kernel as the single families.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from spmf_tpu import distributions as tfd
from spmf_tpu.models.bernoulli import BernoulliFactorization

__all__ = ["MixedFactorization"]

_TYPES = ("poisson", "bernoulli", "normal")


class MixedFactorization(BernoulliFactorization):
    """Shared sparse encoder, per-column-block decoder likelihoods."""

    def __init__(self, *args, column_types=None, obs_scale=1.0, **kwargs):
        if column_types is None:
            raise ValueError(
                "column_types is required: sequence of "
                "'poisson'|'bernoulli'|'normal' per feature column"
            )
        column_types = list(column_types)
        for t in column_types:
            if t not in _TYPES:
                raise ValueError(f"Unknown column type {t!r}")
        self.column_types = column_types
        self.obs_scale = obs_scale
        self._masks = {
            t: np.asarray([ct == t for ct in column_types], np.bool_)[None, :]
            for t in _TYPES
        }
        kwargs.setdefault("feature_dim", len(column_types))
        if kwargs["feature_dim"] != len(column_types):
            raise ValueError("feature_dim must match len(column_types)")
        super().__init__(*args, **kwargs)

    def _fused_kind(self):
        # ('mixed', obs_scale) is a first-class kernel likelihood: the
        # per-column type codes ride a (1, D) lane (ops/fused_poisson
        # CODE_*) that shards over 'fp' exactly like eta, so the mixed
        # family composes with dp x fp meshes through the SAME
        # fused_poisson_loglik(_sharded) path as the single families —
        # one kernel pass, one matmul, a vectorized per-column select.
        return ("mixed", float(self.obs_scale))

    def _fused_codes(self):
        from spmf_tpu.ops.fused_poisson import (
            CODE_BERNOULLI,
            CODE_NORMAL,
            CODE_POISSON,
        )

        code_of = {"poisson": CODE_POISSON, "bernoulli": CODE_BERNOULLI,
                   "normal": CODE_NORMAL}
        return np.asarray([[code_of[t] for t in self.column_types]],
                          np.float32)

    def log_likelihood_components(self, s, u, v, w, data, **kwargs):
        x = jnp.asarray(self._counts(data), self.dtype)
        theta_u = self.encode(x, u, s)
        phi = self.intercept_matrix(w, s)
        B = self.decoding_matrix(v)
        rate = self.decoder_function(jnp.matmul(theta_u, B)) + phi

        m_p = jnp.asarray(self._masks["poisson"])
        m_b = jnp.asarray(self._masks["bernoulli"])
        m_n = jnp.asarray(self._masks["normal"])

        ll = jnp.zeros_like(rate)
        if self._masks["poisson"].any():
            lam = jax.nn.softplus(rate)
            lp = tfd.Poisson(rate=lam).log_prob(x)
            ll = jnp.where(m_p, lp, ll)
        if self._masks["bernoulli"].any():
            lp = tfd.Bernoulli(logits=rate).log_prob(x)
            ll = jnp.where(m_b, lp, ll)
        if self._masks["normal"].any():
            lp = tfd.Normal(
                loc=rate, scale=jnp.asarray(self.obs_scale, self.dtype)
            ).log_prob(x)
            ll = jnp.where(m_n, lp, ll)
        return {"log_likelihood": ll, "rate": rate}

    def _config(self):
        cfg = super()._config()
        cfg.update(column_types=self.column_types, obs_scale=float(self.obs_scale))
        return cfg
