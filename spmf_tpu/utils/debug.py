"""Numerical debugging helpers.

The reference's numerical sanitization is a ``check_numerics`` guard on the
encoding (poisson.py:634-639) plus NaN/clip guards in the energy
(poisson.py:606-616). The energy guards are reproduced inside the models
(they shape the ELBO values); these helpers add the opt-in tooling the
reference lacked (SURVEY.md §5.2).
"""
from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp

__all__ = ["debug_nans", "check_finite"]


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """Scoped jax_debug_nans: any NaN produced inside raises with the
    offending primitive."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def check_finite(tree, name="pytree"):
    """Raise if any leaf contains non-finite values (host-side check)."""
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = jnp.asarray(leaf)
        if jnp.issubdtype(arr.dtype, jnp.floating) and not bool(
            jnp.isfinite(arr).all()
        ):
            bad.append(jax.tree_util.keystr(path))
    if bad:
        raise FloatingPointError(f"non-finite values in {name}: {bad}")
    return tree
