"""Bayesian dense networks with horseshoe weight priors.

Rebuild of ``bayesianquilts.nn.dense.DenseHorseshoe`` (reference import:
mederrata_spmf/poisson.py:17; API surface from its call sites at
poisson.py:763-789: ``var_list``, ``joint_prior``, ``bijectors``,
``assemble_networks(params)``).

Design: per layer l, weights ``w_l ~ Horseshoe(scale)`` elementwise (exact
E1-based marginal density, spmf_tpu.distributions.Horseshoe) and biases
``b_l ~ Normal(0, 1)``; mean-field Normal surrogates over the raw values
(Identity bijectors). Sampled parameters can carry leading sample dims —
``assemble_networks`` broadcasts them through the matmuls.
"""
from __future__ import annotations

from typing import Dict, List

import numpy as np
import jax
import jax.numpy as jnp

from spmf_tpu import bijectors as tfb
from spmf_tpu import distributions as tfd

__all__ = ["DenseHorseshoe"]


class DenseHorseshoe:
    def __init__(
        self,
        input_size: int,
        layer_sizes: List[int],
        activation=jax.nn.softplus,
        weight_scale: float = 1.0,
        dtype=np.float64,
    ):
        self.input_size = int(input_size)
        self.layer_sizes = [int(s) for s in layer_sizes]
        self.activation = activation
        self.dtype = jnp.dtype(dtype) if not hasattr(dtype, "name") else jnp.dtype(dtype)
        self.weight_scale = float(weight_scale)

        dims = [self.input_size] + self.layer_sizes
        prior = {}
        self.bijectors: Dict[str, tfb.Bijector] = {}
        for l, (d_in, d_out) in enumerate(zip(dims[:-1], dims[1:])):
            # 1/sqrt(fan_in) keeps pre-activations O(1) per docs/scaling.md's
            # product-variance argument (reference docs/scaling.md:1-24)
            scale = self.weight_scale / np.sqrt(d_in)
            prior[f"w_{l}"] = tfd.Independent(
                tfd.Horseshoe(scale=scale * np.ones((d_in, d_out), self.dtype)), 2
            )
            prior[f"b_{l}"] = tfd.Independent(
                tfd.Normal(
                    loc=np.zeros((1, d_out), self.dtype),
                    scale=np.ones((1, d_out), self.dtype),
                ),
                2,
            )
            self.bijectors[f"w_{l}"] = tfb.Identity()
            self.bijectors[f"b_{l}"] = tfb.Identity()

        self.joint_prior = tfd.JointDistributionNamed(prior)
        self.var_list = list(prior.keys())
        self.num_layers = len(self.layer_sizes)

    def assemble_networks(self, params: Dict[str, jnp.ndarray], activation=None):
        """Return net(x) applying the sampled layers; sample dims broadcast
        (x: (B, D_in); w_l: (..., d_in, d_out) -> out (..., B, d_out))."""
        act = activation or self.activation

        def net(x):
            h = jnp.asarray(x, self.dtype)
            for l in range(self.num_layers):
                h = jnp.matmul(h, params[f"w_{l}"]) + params[f"b_{l}"]
                if l < self.num_layers - 1:
                    h = act(h)
            return h

        return net

    def log_prob(self, params):
        return self.joint_prior.log_prob(params)

    def sample(self, key, sample_shape=()):
        return self.joint_prior.sample(key, sample_shape)
