"""Fused Normal-surrogate sampling Pallas kernel (TPU).

Companion of spmf_tpu/ops/fused_ig.py for the Normal mean-field surrogates
(u, v, w, s — ~1.34M parameters x S ELBO samples): one kernel draws the
standard normals with in-kernel hardware RNG (inverse-CDF), applies
x = loc + softplus(raw_scale) * eps, pushes x through the per-variable
bijector (softplus or identity, selected by a per-element mask), and
accumulates the per-sample logq partial sums

    log q(x) - fldj = -log(scale) - eps^2/2 - log(2 pi)/2 + m*softplus(-x)

The custom VJP replays the RNG per (tile, sample) — no sample-shaped
residuals. Tile math is shared pure-JAX (_ntile_fwd/_ntile_bwd), pinned
against autodiff on CPU (tests/test_fused_ig.py); the kernel itself is
validated on TPU by benchmarks/validate_fused_ig_tpu.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spmf_tpu.ops.fused_ig import (  # shared layout + RNG helpers
    LANES,
    TR,
    _SQRT2,
    _pad_rows,
    _softplus,
    _to_tiles,
    _uniform_from_bits,
)

__all__ = ["fused_normal_sample_logq"]

_HALF_LOG_2PI = 0.9189385332046727


# --------------------------------------------------------------- tile math
def _ntile_fwd(loc, scale, logscale, mask, eps):
    """y and elementwise logq from the standard normal ``eps``; ``mask`` is
    1.0 where the variable's bijector is softplus, 0.0 for identity."""
    x = loc + scale * eps
    y = jnp.where(mask > 0, _softplus(x), x)
    lq = -logscale - 0.5 * eps * eps - _HALF_LOG_2PI + mask * _softplus(-x)
    return y, lq


def _ntile_bwd(loc, scale, sig_rs, mask, eps):
    """(dy_dloc, dy_drs, dlq_dloc, dlq_drs) holding eps fixed (pathwise)."""
    x = loc + scale * eps
    sig_x = jax.nn.sigmoid(x)
    dy_dx = jnp.where(mask > 0, sig_x, 1.0)
    dy_dloc = dy_dx
    dy_drs = dy_dx * eps * sig_rs
    dlq_dx = mask * (sig_x - 1.0)
    dlq_dloc = dlq_dx
    dlq_drs = -sig_rs / scale + dlq_dx * eps * sig_rs
    return dy_dloc, dy_drs, dlq_dloc, dlq_drs


# ------------------------------------------------------------------ kernels
def _draw_eps(shape):
    u0 = _uniform_from_bits(shape)
    return _SQRT2 * jax.lax.erf_inv(2.0 * u0 - 1.0)


def _flat_mask(shape, i, total):
    flat_ids = (
        jax.lax.broadcasted_iota(jnp.int32, shape, 0) * LANES
        + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        + i * (TR * LANES)
    )
    return flat_ids < total


def _nfwd_kernel(seed_ref, loc_ref, scale_ref, logscale_ref, mask_ref,
                 y_ref, lq_ref, *, total, S):
    i = pl.program_id(0)
    s = pl.program_id(1)
    pltpu.prng_seed(seed_ref[0], i * S + s)
    shape = loc_ref.shape
    eps = _draw_eps(shape)
    y, lq = _ntile_fwd(loc_ref[:], scale_ref[:], logscale_ref[:],
                       mask_ref[:], eps)
    y_ref[0] = y
    in_bounds = _flat_mask(shape, i, total)

    @pl.when(i == 0)
    def _init():
        lq_ref[s] = jnp.float32(0.0)

    lq_ref[s] = lq_ref[s] + jnp.sum(jnp.where(in_bounds, lq, 0.0))


def _nbwd_kernel(seed_ref, loc_ref, scale_ref, sigrs_ref, mask_ref,
                 glq_ref, gy_ref, gloc_ref, grs_ref, *, total, S):
    i = pl.program_id(0)
    s = pl.program_id(1)
    pltpu.prng_seed(seed_ref[0], i * S + s)  # replay the forward stream
    shape = loc_ref.shape
    eps = _draw_eps(shape)
    dy_dloc, dy_drs, dlq_dloc, dlq_drs = _ntile_bwd(
        loc_ref[:], scale_ref[:], sigrs_ref[:], mask_ref[:], eps
    )
    gy = gy_ref[0]
    glq = glq_ref[s]
    m = _flat_mask(shape, i, total).astype(jnp.float32)
    gl = (gy * dy_dloc + glq * dlq_dloc) * m
    gr = (gy * dy_drs + glq * dlq_drs) * m

    @pl.when(s == 0)
    def _init():
        gloc_ref[:] = gl
        grs_ref[:] = gr

    @pl.when(s != 0)
    def _accum():
        gloc_ref[:] = gloc_ref[:] + gl
        grs_ref[:] = grs_ref[:] + gr


# ------------------------------------------------------------------- driver
def _nprep(loc_flat, raw_scale_flat, mask_flat, total, rows_padded):
    loc = _to_tiles(loc_flat, total, rows_padded, 0.0)
    rs = _to_tiles(raw_scale_flat, total, rows_padded, 0.0)
    mask = _to_tiles(mask_flat, total, rows_padded, 0.0)
    scale = jax.nn.softplus(rs)
    return loc, rs, mask, scale


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_normal_sample_logq(loc_flat, raw_scale_flat, mask_flat, seed, S):
    """Sample the Normal surrogates S times (pathwise), bijector applied.

    Args: loc_flat, raw_scale_flat (total,) f32; mask_flat (total,) with 1.0
    where the bijector is softplus, 0.0 for identity; seed: int32 scalar.
    Returns: y (S, total), logq (S,) — logq includes the -fldj correction.
    """
    out, _ = _nfwd(loc_flat, raw_scale_flat, mask_flat, seed, S)
    return out


def _nfwd(loc_flat, raw_scale_flat, mask_flat, seed, S):
    total = loc_flat.shape[0]
    _, rows_padded = _pad_rows(total)
    loc, rs, mask, scale = _nprep(loc_flat, raw_scale_flat, mask_flat,
                                  total, rows_padded)
    logscale = jnp.log(scale)
    n_tiles = rows_padded // TR
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    spec = pl.BlockSpec((TR, LANES), lambda i, s: (i, 0),
                        memory_space=pltpu.VMEM)
    y, lq = pl.pallas_call(
        functools.partial(_nfwd_kernel, total=total, S=S),
        grid=(n_tiles, S),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [spec] * 4,
        out_specs=(
            pl.BlockSpec((1, TR, LANES), lambda i, s: (s, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((S, rows_padded, LANES), jnp.float32),
            jax.ShapeDtypeStruct((S,), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=20 * S * rows_padded * LANES,
            bytes_accessed=(4 + S) * rows_padded * LANES * 4,
            transcendentals=4 * S * rows_padded * LANES,
        ),
    )(seed_arr, loc, scale, logscale, mask)
    y_flat = y.reshape(S, rows_padded * LANES)[:, :total]
    return (y_flat, lq), (loc_flat, raw_scale_flat, mask_flat, seed)


def _nbwd(S, res, cot):
    loc_flat, raw_scale_flat, mask_flat, seed = res
    gy, glq = cot
    total = loc_flat.shape[0]
    _, rows_padded = _pad_rows(total)
    loc, rs, mask, scale = _nprep(loc_flat, raw_scale_flat, mask_flat,
                                  total, rows_padded)
    sig_rs = jax.nn.sigmoid(rs)
    n_tiles = rows_padded // TR
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)

    gy_padded = jnp.zeros((S, rows_padded * LANES), jnp.float32)
    gy_padded = gy_padded.at[:, :total].set(gy.astype(jnp.float32))
    gy_padded = gy_padded.reshape(S, rows_padded, LANES)
    glq = jnp.asarray(glq, jnp.float32)

    spec = pl.BlockSpec((TR, LANES), lambda i, s: (i, 0),
                        memory_space=pltpu.VMEM)
    gloc, grs = pl.pallas_call(
        functools.partial(_nbwd_kernel, total=total, S=S),
        grid=(n_tiles, S),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [spec] * 4 + [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, TR, LANES), lambda i, s: (s, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct((rows_padded, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows_padded, LANES), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=30 * S * rows_padded * LANES,
            bytes_accessed=(6 + S) * rows_padded * LANES * 4,
            transcendentals=4 * S * rows_padded * LANES,
        ),
    )(seed_arr, loc, scale, sig_rs, mask, glq, gy_padded)
    gloc_flat = gloc.reshape(-1)[:total].astype(loc_flat.dtype)
    grs_flat = grs.reshape(-1)[:total].astype(raw_scale_flat.dtype)
    return gloc_flat, grs_flat, None, None


fused_normal_sample_logq.defvjp(_nfwd, _nbwd)
