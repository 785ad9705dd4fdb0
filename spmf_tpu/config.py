"""Global configuration helpers for spmf_tpu.

The reference library (mederrata/spmf) runs everything in float64 on CPU
(reference: mederrata_spmf/poisson.py:64 ``dtype=tf.float64``). TPU matrix
units are f32/bf16, so the TPU-native default is float32; float64 is still
honoured when ``jax_enable_x64`` is active (the CPU parity-test path).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["default_dtype", "canonical_dtype", "x64_enabled"]


def x64_enabled() -> bool:
    return bool(jax.config.read("jax_enable_x64"))


def default_dtype():
    """float64 when x64 is enabled (CPU parity runs), else float32 (TPU)."""
    return jnp.float64 if x64_enabled() else jnp.float32


def canonical_dtype(dtype=None):
    """Map user-provided dtype (including tf-style strings / np dtypes) to a
    jnp dtype that is actually representable under the current x64 setting."""
    if dtype is None:
        return default_dtype()
    if isinstance(dtype, str):
        dtype = dtype.replace("tf.", "").replace("torch.", "")
        dtype = {"double": "float64", "float": "float32"}.get(dtype, dtype)
    dt = np.dtype(dtype)
    if dt == np.float64 and not x64_enabled():
        return jnp.float32
    return jnp.dtype(dt)
