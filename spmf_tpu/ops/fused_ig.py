"""Fused InverseGamma-surrogate sampling Pallas kernel (TPU).

The horseshoe(+) auxiliary pipeline — 8 InverseGamma surrogates totalling
~1.4M parameters, sampled S times per ADVI step (reference structure:
mederrata_spmf/poisson.py:303-341) — dominates the training step at wide D
(~60% at D=20k, docs/ROADMAP.md). Per element it needs 9 random draws
(1 normal + 8 boost uniforms for the Wilson–Hilferty pathwise gamma of
spmf_tpu.ops.gamma), an IG transform, a softplus bijector, and the IG/softplus
log-density — dozens of XLA elementwise ops with (S, ~1.4M) HBM round-trips
between fusion islands, plus the threefry bit generation for ~100M draws.

This kernel does the whole chain in one pass per (tile, sample) grid step
with **in-kernel hardware RNG** (`pltpu.prng_seed(seed, tile*S+s)` +
`pltpu.prng_random_bits`): uniforms by mantissa bit-twiddling, the normal by
inverse-CDF (`erfinv`). Nothing of sample shape is read from HBM; only the
constrained values y = softplus(b / G_a) (needed downstream by the prior
log-probs) and the per-sample logq partial sums are written.

Gradients: a hand-derived VJP. The backward kernel **replays the RNG** with
the same per-(tile, sample) seeds instead of saving residuals, recomputes the
forward quantities, and accumulates the pathwise gradients

    d y / d(a,b),   d logq / d(a,b)

over samples (math shared with the forward via the pure-JAX `_tile_*` helper
functions, which are unit-tested against jax autodiff on CPU —
tests/test_fused_ig.py). Parameter-sized transcendentals that Mosaic lacks
(lgamma, digamma) are precomputed in XLA and passed in.

Semantics match SurrogatePosterior._sample_igs with gamma_sampler='fast'
exactly, except the random stream (hardware PRNG vs threefry) and the
f32-only dtype. Mesh composition (r2): replicated params (dp-only meshes)
run the kernel replicated; fp-sharded params run it per-shard under
shard_map with shard-distinct seeds — see
SurrogatePosterior._sample_igs_fused_sharded (vi/surrogates.py) and
tests/test_sharding.py::test_fused_ig_sampler_sharded_assembly_exact.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_ig_sample_logq", "ig_sample_logq_reference"]

BOOST = 8          # WH shape boost (matches spmf_tpu.ops.gamma._BOOST)
LANES = 1024       # lane tile (last dim)
TR = 128           # row tile (sublane dim)
_SQRT2 = 1.4142135623730951


# --------------------------------------------------------------- tile math
# Pure-JAX elementwise helpers shared by the kernels and the CPU unit tests.

def _wh_gamma(a, eps, s1):
    """Boosted Wilson–Hilferty Gamma(a, 1) from a standard normal ``eps``
    and the Stuart log-uniform sum ``s1`` (spmf_tpu/ops/gamma.py:38-47)."""
    ab = a + float(BOOST)
    c = 1.0 - 1.0 / (9.0 * ab) + eps / (3.0 * jnp.sqrt(ab))
    g = ab * jnp.maximum(c, 0.05) ** 3 * jnp.exp(s1)
    return jnp.maximum(g, jnp.sqrt(jnp.finfo(jnp.result_type(a)).tiny))


def _softplus(x):
    return jnp.maximum(x, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(x)))


def _tile_fwd(a, b, logb, t0, eps, s1):
    """Forward chain from the gamma randomness: y = softplus(b / G_a) and the
    elementwise logq = log q_IG(x) - fldj_softplus(x), x = b/G_a.

    t0 = a*log(b) - lgamma(a) is precomputed (Mosaic has no lgamma).
    logq = t0 - (a+1)(log b - log g) - g + softplus(-x)   [since b/x = g].
    """
    g = _wh_gamma(a, eps, s1)
    x = b / g
    y = _softplus(x)
    lq = t0 - (a + 1.0) * (logb - jnp.log(g)) - g + _softplus(-x)
    return y, lq


def _tile_bwd(a, b, logb, dg0, eps, s1, s2):
    """Analytic per-element derivatives of (y, logq) w.r.t. (a, b), holding
    the base randomness (eps, uniforms) fixed — the pathwise gradient.

    dg0 = log(b) - digamma(a) is precomputed. Returns
    (dy_da, dy_db, dlq_da, dlq_db)."""
    ab = a + float(BOOST)
    sqrt_ab = jnp.sqrt(ab)
    c = 1.0 - 1.0 / (9.0 * ab) + eps / (3.0 * sqrt_ab)
    cc = jnp.maximum(c, 0.05)
    active_c = (c > 0.05).astype(a.dtype)
    g_raw = ab * cc**3 * jnp.exp(s1)
    floor = jnp.sqrt(jnp.finfo(a.dtype).tiny)
    g = jnp.maximum(g_raw, floor)
    not_floored = (g_raw > floor).astype(a.dtype)
    x = b / g
    sig_x = jax.nn.sigmoid(x)

    dc_da = 1.0 / (9.0 * ab * ab) - eps / (6.0 * ab * sqrt_ab)
    dlogg_da = (1.0 / ab + 3.0 * active_c * dc_da / cc - s2) * not_floored
    dx_da = -x * dlogg_da
    dx_db = 1.0 / g

    dy_da = sig_x * dx_da
    dy_db = sig_x * dx_db
    # logq = t0 - (a+1)(logb - logg) - g + softplus(-x)
    dlq_da = (
        dg0
        - (logb - jnp.log(g))
        + (a + 1.0) * dlogg_da
        - g * dlogg_da
        - (1.0 - sig_x) * dx_da
    )
    dlq_db = -1.0 / b - (1.0 - sig_x) * dx_db
    return dy_da, dy_db, dlq_da, dlq_db


# ------------------------------------------------------------- RNG helpers
def _uniform_from_bits(shape, ishift=None):
    """U in (0, 1): 23 low bits + half-ulp offset (never 0 -> log safe).
    Mosaic can't cast uint32->f32, so mask the int32 bits non-negative.
    ``ishift`` (traced int32 scalar, stratified mode): lattice shift added
    in the BIT domain (mod 2^23) — exact, and the half-ulp grid is
    preserved (no f32 rounding of frac(u + shift) near 1)."""
    bits = pltpu.prng_random_bits(shape) & 0x7FFFFF  # int32, 23 bits
    if ishift is not None:
        bits = (bits + ishift) & 0x7FFFFF
    return bits.astype(jnp.float32) * (2.0**-23) + (2.0**-24)


def _draw_eps_s1_s2(a, shape, mirror=None, strat=None):
    """In-kernel randomness for one (tile, sample): standard normal ``eps``
    (inverse-CDF; |eps| <= ~5.2 at 23-bit resolution, far inside the WH
    cube's own clamp) and the two Stuart weighted log-uniform sums. The
    draw ORDER here is the replay contract between forward and backward.

    ``mirror`` (traced bool scalar, antithetic mode): flip every uniform
    U -> 1-U, which negates eps exactly (erf_inv is odd and 2(1-U)-1 is
    the exact f32 negation of 2U-1) and mirrors the Stuart factors. The
    bit-twiddled U lives in [2^-24, 1-2^-24], which is symmetric, so 1-U
    stays log-safe with no extra clamp.

    ``strat`` ((pair, half), stratified mode): lattice-shift the j-th
    uniform of the draw sequence by (pair * GENS[j] mod half)/half in the
    bit domain — a Korobov rank-1 lattice across the pairs (matching
    ops.gamma._LATTICE_GENS so the XLA path equidistributes identically);
    all pairs replay the SAME base stream (the caller seeds per tile, not
    per (tile, sample))."""
    draw_idx = [0]

    def _u():
        ishift = None
        if strat is not None:
            pair, half = strat
            g = _LATTICE_GENS[draw_idx[0]]
            draw_idx[0] += 1
            ishift = _lattice_shift((pair * jnp.int32(g % half)) %
                                    jnp.int32(half), half)
        u = _uniform_from_bits(shape, ishift)
        return u if mirror is None else jnp.where(mirror, 1.0 - u, u)

    u0 = _u()
    eps = _SQRT2 * jax.lax.erf_inv(2.0 * u0 - 1.0)
    s1 = jnp.zeros(shape, jnp.float32)
    s2 = jnp.zeros(shape, jnp.float32)
    for k in range(BOOST):
        logu = jnp.log(_u())
        w = 1.0 / (a + float(k))
        s1 = s1 + logu * w
        s2 = s2 + logu * w * w
    return eps, s1, s2


# must match ops.gamma._LATTICE_GENS (the XLA stratified path)
_LATTICE_GENS = (1, 3299, 4919, 6029, 2543, 7723, 1031, 5501, 6577)


def _lattice_shift(p, half):
    """floor(p * 2^23 / half) for a traced int32 pair index p — the
    split-quotient form avoids the int32 overflow of p*2^23 for
    half > 255 (q, r are static Python ints)."""
    q, r = (1 << 23) // half, (1 << 23) % half
    return p * jnp.int32(q) + (p * jnp.int32(r)) // jnp.int32(half)


# ------------------------------------------------------------------ kernels
def _fwd_kernel(seed_ref, a_ref, b_ref, logb_ref, t0_ref, y_ref, lq_ref,
                *, total, S, antithetic):
    i = pl.program_id(0)   # tile (params DMA'd once per tile: s is inner)
    s = pl.program_id(1)   # ELBO sample
    # antithetic: samples s and s+S/2 share a seed stream; the second half
    # mirrors every uniform (U -> 1-U). 'stratified': ALL samples share one
    # per-tile stream; pair p lattice-shifts every uniform by p/half in the
    # bit domain (marginals unchanged, pairs stratified).
    half = S // 2 if antithetic else S
    mirror = (s >= half) if antithetic else None
    strat = None
    if antithetic == "stratified":
        pltpu.prng_seed(seed_ref[0], i)
        strat = (s % half, half)
    else:
        pltpu.prng_seed(seed_ref[0], i * S + s % half)

    a = a_ref[:]
    shape = a.shape
    eps, s1, _ = _draw_eps_s1_s2(a, shape, mirror, strat)
    y, lq = _tile_fwd(a, b_ref[:], logb_ref[:], t0_ref[:], eps, s1)
    y_ref[0] = y

    flat_ids = (
        jax.lax.broadcasted_iota(jnp.int32, shape, 0) * LANES
        + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        + i * (TR * LANES)
    )
    in_bounds = flat_ids < total

    @pl.when(i == 0)
    def _init():
        lq_ref[s] = jnp.float32(0.0)

    lq_ref[s] = lq_ref[s] + jnp.sum(jnp.where(in_bounds, lq, 0.0))


def _bwd_kernel(seed_ref, a_ref, b_ref, logb_ref, dg0_ref, glq_ref, gy_ref,
                ga_ref, gb_ref, *, total, S, antithetic):
    i = pl.program_id(0)
    s = pl.program_id(1)
    half = S // 2 if antithetic else S
    mirror = (s >= half) if antithetic else None
    strat = None
    if antithetic == "stratified":
        pltpu.prng_seed(seed_ref[0], i)     # replay forward stream
        strat = (s % half, half)
    else:
        pltpu.prng_seed(seed_ref[0], i * S + s % half)

    a = a_ref[:]
    shape = a.shape
    eps, s1, s2 = _draw_eps_s1_s2(a, shape, mirror, strat)
    dy_da, dy_db, dlq_da, dlq_db = _tile_bwd(
        a, b_ref[:], logb_ref[:], dg0_ref[:], eps, s1, s2
    )
    gy = gy_ref[0]
    glq = glq_ref[s]

    flat_ids = (
        jax.lax.broadcasted_iota(jnp.int32, shape, 0) * LANES
        + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        + i * (TR * LANES)
    )
    mask = (flat_ids < total).astype(jnp.float32)

    ga = (gy * dy_da + glq * dlq_da) * mask
    gb = (gy * dy_db + glq * dlq_db) * mask

    @pl.when(s == 0)
    def _init():
        ga_ref[:] = ga
        gb_ref[:] = gb

    @pl.when(s != 0)
    def _accum():
        ga_ref[:] = ga_ref[:] + ga
        gb_ref[:] = gb_ref[:] + gb


# ------------------------------------------------------------------- driver
def _pad_rows(total):
    rows = pl.cdiv(total, LANES)
    rows_padded = pl.cdiv(rows, TR) * TR
    return rows, rows_padded


def _to_tiles(flat, total, rows_padded, fill):
    out = jnp.full((rows_padded * LANES,), fill, jnp.float32)
    return out.at[:total].set(flat.astype(jnp.float32)).reshape(
        rows_padded, LANES
    )


def _precompute(a_flat, b_flat, total, rows_padded):
    # padded lanes get a=10, b=1: deep in the WH-accurate regime, no NaNs;
    # their contributions are masked out in-kernel anyway
    a = _to_tiles(a_flat, total, rows_padded, 10.0)
    b = _to_tiles(b_flat, total, rows_padded, 1.0)
    logb = jnp.log(b)
    return a, b, logb


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_ig_sample_logq(a_flat, b_flat, seed, S, antithetic=False):
    """Sample y = softplus(InverseGamma(a, b)) pathwise, S times.

    Args: a_flat, b_flat (total,) f32 — constrained concentration/scale;
    seed: int32 scalar (traced ok); S: static sample count; antithetic:
    static — samples s and s+S/2 (S even) use mirrored base draws
    (U -> 1-U, hence eps -> -eps), keeping every marginal law while
    negatively coupling the pairs (fit(antithetic=True)). The value
    'stratified' additionally lattice-couples the S/2 pairs: one base
    stream per tile, pair p shifts every uniform by p/(S/2) in the bit
    domain (fit(antithetic='stratified')).
    Returns: y (S, total) f32, logq (S,) f32 — logq is the summed
    IG-log-density minus the softplus forward-log-det-Jacobian, i.e. exactly
    the per-sample logq contribution of SurrogatePosterior._sample_igs.
    """
    out, _ = _fwd(a_flat, b_flat, seed, S, antithetic)
    return out


def _fwd(a_flat, b_flat, seed, S, antithetic=False):
    if antithetic and S % 2:
        raise ValueError(f"antithetic sampling needs an even S, got {S}")
    total = a_flat.shape[0]
    rows, rows_padded = _pad_rows(total)
    a, b, logb = _precompute(a_flat, b_flat, total, rows_padded)
    t0 = a_flat.astype(jnp.float32) * jnp.log(b_flat.astype(jnp.float32)) \
        - gammaln(a_flat.astype(jnp.float32))
    t0 = _to_tiles(t0, total, rows_padded, 0.0)
    n_tiles = rows_padded // TR
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)

    param_spec = pl.BlockSpec((TR, LANES), lambda i, s: (i, 0),
                              memory_space=pltpu.VMEM)
    y, lq = pl.pallas_call(
        functools.partial(_fwd_kernel, total=total, S=S,
                          antithetic=antithetic),
        grid=(n_tiles, S),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [param_spec] * 4,
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
            flops=60 * S * rows_padded * LANES,
            bytes_accessed=(4 + S) * rows_padded * LANES * 4,
            transcendentals=(BOOST + 6) * S * rows_padded * LANES,
        ),
    )(seed_arr, a, b, logb, t0)
    y_flat = y.reshape(S, rows_padded * LANES)[:, :total]
    return (y_flat, lq), (a_flat, b_flat, seed)


def _bwd(S, antithetic, res, cot):
    a_flat, b_flat, seed = res
    gy, glq = cot
    total = a_flat.shape[0]
    rows, rows_padded = _pad_rows(total)
    a, b, logb = _precompute(a_flat, b_flat, total, rows_padded)
    af32 = a_flat.astype(jnp.float32)
    dg0 = jnp.log(b_flat.astype(jnp.float32)) - jax.lax.digamma(af32)
    dg0 = _to_tiles(dg0, total, rows_padded, 0.0)
    n_tiles = rows_padded // TR
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)

    gy_padded = jnp.zeros((S, rows_padded * LANES), jnp.float32)
    gy_padded = gy_padded.at[:, :total].set(gy.astype(jnp.float32))
    gy_padded = gy_padded.reshape(S, rows_padded, LANES)
    glq = jnp.asarray(glq, jnp.float32)

    param_spec = pl.BlockSpec((TR, LANES), lambda i, s: (i, 0),
                              memory_space=pltpu.VMEM)
    ga, gb = pl.pallas_call(
        functools.partial(_bwd_kernel, total=total, S=S,
                          antithetic=antithetic),
        grid=(n_tiles, S),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [param_spec] * 4
        + [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, TR, LANES), lambda i, s: (s, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(param_spec, param_spec),
        out_shape=(
            jax.ShapeDtypeStruct((rows_padded, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows_padded, LANES), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=80 * S * rows_padded * LANES,
            bytes_accessed=(6 + S) * rows_padded * LANES * 4,
            transcendentals=(BOOST + 8) * S * rows_padded * LANES,
        ),
    )(seed_arr, a, b, logb, dg0, glq, gy_padded)
    ga_flat = ga.reshape(-1)[:total].astype(a_flat.dtype)
    gb_flat = gb.reshape(-1)[:total].astype(b_flat.dtype)
    return ga_flat, gb_flat, None


fused_ig_sample_logq.defvjp(_fwd, _bwd)


def ig_sample_logq_reference(a_flat, b_flat, key, S, antithetic=False):
    """Pure-JAX equivalent (threefry randomness; for statistical tests):
    the same math as SurrogatePosterior._sample_igs on a flat block."""
    from spmf_tpu.ops.gamma import wilson_hilferty_gamma

    a = jnp.broadcast_to(a_flat, (S,) + a_flat.shape)
    g = wilson_hilferty_gamma(key, a, antithetic=antithetic)
    x = b_flat / g
    y = _softplus(x)
    lq = (
        a_flat * jnp.log(b_flat)
        - gammaln(a_flat)
        - (a_flat + 1.0) * jnp.log(x)
        - b_flat / x
        + _softplus(-x)
    )
    return y, jnp.sum(lq, axis=-1)
