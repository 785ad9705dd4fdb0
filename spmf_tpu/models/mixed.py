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
through a softplus link. Column types are static, so the dispatch compiles
to three masked fused kernels — no gather/scatter.
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
        # per-column-block dispatch: _fused_x_part composes one fused
        # stats-kernel call per column type and combines the scalar
        # (sums, counts, global-min) outputs exactly — the clip
        # decomposition (ops/fused_poisson.py docstring) is partition-
        # independent. Single-device for now.
        return "mixed" if self.mesh is None else None

    _KERNEL_KINDS = {"poisson": "poisson_softplus", "bernoulli": "bernoulli"}

    def _fused_x_part(self, theta, B, phi, x):
        import jax.numpy as jnp

        from spmf_tpu.ops.fused_poisson import (
            _floor_min_val,
            _fused_stats,
            _prep,
        )

        S = theta.shape[0]
        ssum = jnp.zeros((S,), jnp.float32)
        cnt = jnp.zeros((S,), jnp.int32)
        gmin = jnp.zeros((1,), jnp.float32)
        eta = jnp.asarray(self.eta_i, self.dtype)
        for t in _TYPES:
            mask = self._masks[t][0]
            if not mask.any():
                continue
            idx = jnp.asarray(np.where(mask)[0])
            kind = self._KERNEL_KINDS.get(t, ("normal", float(self.obs_scale)))
            args = _prep(
                theta,
                B[:, :, idx],
                phi[:, :, idx],
                x[:, idx],
                eta[:, idx] if eta.ndim >= 2 else eta,
            )
            s_t, c_t, m_t = _fused_stats(*args, self.log_transform,
                                         self._fused_interpret, kind)
            ssum = ssum + s_t
            cnt = cnt + c_t
            gmin = jnp.minimum(gmin, m_t)
        sg = jax.lax.stop_gradient
        m = _floor_min_val(sg(gmin) - 10.0)
        return ssum + sg(cnt).astype(jnp.float32) * m[0]

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
