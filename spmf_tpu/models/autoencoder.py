"""Deep Bayesian Poisson autoencoder.

Reference: mederrata_spmf/poisson.py:720-833 (``PoissonAutoencoder``). The
reference implementation is broken as written (``super(DenseHorseshoe,
self).__init__`` MRO TypeError at poisson.py:740-741 and an undefined
``self.log_likelihood`` at poisson.py:824 — SURVEY.md §2.2); this is the
repaired, working rebuild: a DenseHorseshoe MLP
[D]*encoder_layers + [K] + [D]*decoder_layers + [D] (poisson.py:763-767)
with rates ``exp(net(x / colnorm)) * colnorm`` and Poisson likelihood
(poisson.py:788-811).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from spmf_tpu.models.base import BayesianModel
from spmf_tpu.nn.dense import DenseHorseshoe
from spmf_tpu.vi.surrogates import build_surrogate_posterior

__all__ = ["PoissonAutoencoder"]


class PoissonAutoencoder(BayesianModel):
    def __init__(
        self,
        data,
        data_transform_fn=None,
        latent_dim=None,
        scale_columns=True,
        column_norms=None,
        encoder_layers=1,
        decoder_layers=1,
        activation_function=jax.nn.softplus,
        strategy=None,
        mesh=None,
        count_key=None,
        dtype=None,
        **kwargs,
    ):
        super().__init__(data=data, data_transform_fn=data_transform_fn,
                         strategy=strategy, mesh=mesh, dtype=dtype)
        record = next(iter(self.data()))
        if count_key is None:
            count_key = "data" if "data" in record else "counts"
        self.count_key = count_key
        x = np.asarray(record[self.count_key], np.float64)

        self.column_norm_factor = np.ones((1, x.shape[-1]))
        if scale_columns:
            if column_norms is not None:
                self.column_norm_factor = np.asarray(column_norms, np.float64).reshape(1, -1)
            else:
                # reference poisson.py:748-754: mean of the first batch
                self.column_norm_factor = x.mean(axis=0, keepdims=True)
        self.column_norm_factor = jnp.asarray(self.column_norm_factor, self.dtype)

        self.feature_dim = x.shape[-1]
        self.latent_dim = self.feature_dim if latent_dim is None else latent_dim

        self.neural_network_model = DenseHorseshoe(
            self.feature_dim,
            [self.feature_dim] * encoder_layers
            + [self.latent_dim]
            + [self.feature_dim] * decoder_layers
            + [self.feature_dim],
            activation=activation_function,
            dtype=self.dtype,
        )
        self.joint_prior = self.neural_network_model.joint_prior
        # scaling.md-derived surrogate inits (VERDICT r2 #7; reference
        # docs/scaling.md product-variance argument): posterior scale per
        # weight layer tracks the prior's 1/sqrt(fan_in) so each layer's
        # sampled-weight noise contributes O(0.1) pre-activation std
        # regardless of width — the generic 1e-3 made wide layers start
        # ~sqrt(D)x noisier than narrow ones. Biases keep the tiny 1e-3.
        nn = self.neural_network_model
        dims = [nn.input_size] + nn.layer_sizes
        init_scale = {}
        for l, d_in in enumerate(dims[:-1]):
            init_scale[f"w_{l}"] = 0.1 * nn.weight_scale / np.sqrt(d_in)
            init_scale[f"b_{l}"] = 1e-3
        self._surrogate = build_surrogate_posterior(
            self.joint_prior, self.neural_network_model.bijectors,
            dtype=self.dtype, init_scale=init_scale,
        )
        self.surrogate_params = self._surrogate.init()
        self.var_list = list(self._surrogate.names)
        self.set_calibration_expectations()

    def _counts(self, data):
        if self.count_key in data:
            return data[self.count_key]
        for k in ("data", "counts"):
            if k in data:
                return data[k]
        raise KeyError(f"No count key in batch: {list(data)}")

    def _rates(self, data, params):
        net = self.neural_network_model.assemble_networks(params)
        x = jnp.asarray(self._counts(data), self.dtype)
        rates = jnp.exp(net(x / self.column_norm_factor))
        return rates * self.column_norm_factor

    def log_likelihood_components(self, data, **params):
        from spmf_tpu import distributions as tfd

        rates = self._rates(data, params)
        x = jnp.asarray(self._counts(data), self.dtype)
        return {
            "log_likelihood": tfd.Poisson(rate=rates).log_prob(x),
            "rates": rates,
        }

    def predictive_distribution(self, data, **params):
        """rates + row/feature-summed log-likelihood (reference
        poisson.py:788-811)."""
        comp = self.log_likelihood_components(data, **params)
        ll = jnp.sum(comp["log_likelihood"], axis=(-1, -2))
        return {"log_likelihood": ll, "rates": comp["rates"]}

    def unormalized_log_prob_parts(self, data=None, prior_weight=1.0, **params):
        prior_parts = self.joint_prior.log_prob_parts(params)
        prior_parts = {k: v * prior_weight for k, v in prior_parts.items()}
        ll = self.log_likelihood_components(data, **params)["log_likelihood"]
        prior_parts["x"] = jnp.sum(ll, axis=(-1, -2))
        return prior_parts

    def unormalized_log_prob(self, data=None, prior_weight=1.0, **params):
        parts = self.unormalized_log_prob_parts(data, prior_weight=prior_weight, **params)
        out = 0.0
        for v in parts.values():
            out = out + v
        return out

    def _row_log_likelihood(self, batch, samples):
        ll = self.log_likelihood_components(batch, **samples)["log_likelihood"]
        return jnp.sum(ll, axis=-1)

    def encode(self, x, params=None):
        """Deterministic encoder pass to the latent layer (net-new utility:
        runs the first encoder_layers+1 layers of the calibrated network)."""
        params = params or self.calibrated_expectations
        x = jnp.asarray(x, self.dtype) / self.column_norm_factor
        nn = self.neural_network_model
        h = x
        latent_layer_idx = None
        for l, size in enumerate(nn.layer_sizes):
            if size == self.latent_dim:
                latent_layer_idx = l
                break
        for l in range(latent_layer_idx + 1):
            h = jnp.matmul(h, params[f"w_{l}"]) + params[f"b_{l}"]
            if l < latent_layer_idx:
                h = nn.activation(h)
        return h

    def _config(self):
        return {
            "latent_dim": self.latent_dim,
            "feature_dim": self.feature_dim,
            "count_key": self.count_key,
        }
