"""Bijectors with forward / inverse / log-det-Jacobian.

The reference constrains its mean-field surrogates through TFP bijectors
(``tfb.Softplus`` for positive params, ``tfb.Identity`` for real ones;
reference: mederrata_spmf/poisson.py:215-224, bernoulli.py:185-194).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["Bijector", "Identity", "Softplus", "Exp", "Chain"]


class Bijector:
    def forward(self, x):  # pragma: no cover - interface
        raise NotImplementedError

    def inverse(self, y):  # pragma: no cover - interface
        raise NotImplementedError

    def forward_log_det_jacobian(self, x):  # pragma: no cover - interface
        raise NotImplementedError

    def inverse_log_det_jacobian(self, y):
        return -self.forward_log_det_jacobian(self.inverse(y))

    def __call__(self, x):
        return self.forward(x)


class Identity(Bijector):
    def forward(self, x):
        return x

    def inverse(self, y):
        return y

    def forward_log_det_jacobian(self, x):
        return jnp.zeros_like(x)

    def inverse_log_det_jacobian(self, y):
        return jnp.zeros_like(y)


class Softplus(Bijector):
    """y = log(1 + e^x); d y/d x = sigmoid(x).

    The forward output is floored at the dtype's tiny: in float32,
    softplus underflows to exactly 0 below x ~ -104, and the factorization
    models divide by softplus-constrained quantities (the s-split
    normalization s/sum(s), the horseshoe+ 1/u_eta_a scales — reference
    poisson.py:303-341, 661) — an exact zero there poisons gradients with
    inf/NaN. The floor (1.2e-38 f32 / 2.2e-308 f64) is invisible at any
    representable operating point and keeps those divisions finite.
    """

    def forward(self, x):
        y = jax.nn.softplus(x)
        return jnp.maximum(y, jnp.finfo(y.dtype).tiny)

    def inverse(self, y):
        # softplus^{-1}(y) = y + log(1 - e^{-y}), stable for y > 0
        return y + jnp.log(-jnp.expm1(-y))

    def forward_log_det_jacobian(self, x):
        return jax.nn.log_sigmoid(x)

    def inverse_log_det_jacobian(self, y):
        # -log(sigmoid(softplus^{-1}(y))) = -(log(1 - e^{-y}))
        return -jnp.log(-jnp.expm1(-y))


class Exp(Bijector):
    def forward(self, x):
        return jnp.exp(x)

    def inverse(self, y):
        return jnp.log(y)

    def forward_log_det_jacobian(self, x):
        return x

    def inverse_log_det_jacobian(self, y):
        return -jnp.log(y)


class Chain(Bijector):
    """Apply bijectors right-to-left: Chain([f, g]).forward(x) = f(g(x))."""

    def __init__(self, bijectors):
        self.bijectors = list(bijectors)

    def forward(self, x):
        for b in reversed(self.bijectors):
            x = b.forward(x)
        return x

    def inverse(self, y):
        for b in self.bijectors:
            y = b.inverse(y)
        return y

    def forward_log_det_jacobian(self, x):
        total = jnp.zeros_like(x)
        for b in reversed(self.bijectors):
            total = total + b.forward_log_det_jacobian(x)
            x = b.forward(x)
        return total
