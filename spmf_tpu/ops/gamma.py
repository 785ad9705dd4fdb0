"""Fast differentiable Gamma sampling for TPU.

``jax.random.gamma`` is exact and carries implicit-reparameterization
gradients via the ``random_gamma_grad`` primitive — but that primitive
evaluates an expensive per-element series (measured ~260 ms for the 11M
gamma draws of one ADVI step at D=20k on v5e, i.e. ~70% of the whole
training step). This module provides a cheap, fully *pathwise*
reparameterized sampler:

**Boosted Wilson–Hilferty.** For shape ``a + B`` (B = 8 boost), the
Wilson–Hilferty cube approximation

    G_{a+B} ~= (a+B) * (1 - 1/(9(a+B)) + eps / (3 sqrt(a+B)))^3,  eps~N(0,1)

is accurate to ~1e-3 relative density error (the approximation improves
rapidly with shape; at shape >= 8 it is excellent). The boosted sample is
then reduced to shape ``a`` by Stuart's theorem — if X ~ Gamma(a+1) and
U ~ Uniform(0,1) then X * U^{1/a} ~ Gamma(a) — applied B times:

    G_a = G_{a+B} * prod_{i=0}^{B-1} U_i^{1/(a+i)}

Every operation is elementary and differentiable in ``a``, so gradients are
plain pathwise derivatives (no special function). The ELBO estimator becomes
very slightly biased (the surrogate samples follow the WH-approximate
distribution while log q uses the exact density); the converged ELBO on the
reference parity config is unchanged within sampling noise (docs/PARITY.md).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["sample_gamma", "wilson_hilferty_gamma"]

_BOOST = 8


def wilson_hilferty_gamma(key, concentration, boost: int = _BOOST):
    """Pathwise-differentiable Gamma(concentration, 1) sampler."""
    a = concentration
    kn, ku = jax.random.split(key)
    ab = a + float(boost)
    eps = jax.random.normal(kn, jnp.shape(a), jnp.result_type(a))
    c = 1.0 - 1.0 / (9.0 * ab) + eps / (3.0 * jnp.sqrt(ab))
    # the WH cube can go non-positive ~1e-5 of the time at shape 8; clamp
    g = ab * jnp.maximum(c, 0.05) ** 3
    if boost > 0:
        u = jax.random.uniform(
            ku, (boost,) + jnp.shape(a), jnp.result_type(a),
            minval=jnp.finfo(jnp.result_type(a)).tiny, maxval=1.0,
        )
        i = jnp.arange(boost, dtype=jnp.result_type(a)).reshape(
            (boost,) + (1,) * jnp.ndim(a)
        )
        # log prod U_i^{1/(a+i)} = sum log(U_i) / (a + i)
        g = g * jnp.exp(jnp.sum(jnp.log(u) / (a + i), axis=0))
    # random.uniform hits its minval with prob ~2^-24 per draw; for small
    # concentrations log(minval)/a then underflows g to exactly 0 in f32 and
    # the downstream InverseGamma sample b/g becomes inf (-> -inf + inf NaNs
    # in the ELBO). Floor at sqrt(tiny) — below any legit operating point.
    return jnp.maximum(g, jnp.sqrt(jnp.finfo(jnp.result_type(a)).tiny))


def sample_gamma(key, concentration, method: str = "exact"):
    """Gamma(concentration, 1) with selectable gradient machinery:
    - 'exact': jax.random.gamma (implicit reparameterization; exact but the
      backward primitive is very slow on TPU)
    - 'fast':  boosted Wilson–Hilferty pathwise sampler (above)
    """
    if method == "fast":
        return wilson_hilferty_gamma(key, concentration)
    g = jax.random.gamma(key, concentration, dtype=jnp.result_type(concentration))
    return jnp.maximum(g, jnp.sqrt(jnp.finfo(jnp.result_type(concentration)).tiny))
