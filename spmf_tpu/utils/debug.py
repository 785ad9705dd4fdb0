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

__all__ = ["debug_nans", "check_finite", "warn_known_bad_sample_dim"]

# Sample dims observed to trigger an XLA:TPU miscompilation of the fused
# sample->encode graph in this jax/libtpu stack: the jitted batched encode
# emits NEGATIVE outputs from all-positive operands -> NaN likelihoods
# (S in 1..9, 12, 16, 20 are all clean; Pallas exonerated — pure-XLA
# reproduces). See tools/xla_s10_repro.py and
# tests/test_tpu_env.py::test_s10_encode_not_miscompiled.
_KNOWN_BAD_TPU_SAMPLE_DIMS = (10,)


def warn_known_bad_sample_dim(s, context):
    """One warning when a sample dim known to miscompile on this XLA:TPU
    stack is requested on the TPU backend (fit(sample_size=...) /
    waic(sample_chunk=...)). The run proceeds — the engine's NaN guards
    make the corruption loud — but the warning names the known cause and
    the fix (any power-of-two dim, or 12/20)."""
    if s in _KNOWN_BAD_TPU_SAMPLE_DIMS and jax.default_backend() == "tpu":
        import warnings

        warnings.warn(
            f"{context}={s} is a KNOWN-BAD sample dim on this XLA:TPU "
            "stack: the jitted sample->encode graph miscompiles (negative "
            "encode outputs from positive operands -> NaN likelihoods; "
            "tools/xla_s10_repro.py, isolation record docs/xla_s10/). "
            "Use a power-of-two dim (8, 16) or 12/20 instead.",
            UserWarning,
            stacklevel=3,
        )
        return True
    return False


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
