"""Fused decode + Poisson log-likelihood Pallas kernels.

The hot path of the ADVI energy (reference: mederrata_spmf/poisson.py:156-184
+ 606-619) is, per ELBO sample s:

    rate = f(theta_s @ v_s) + phi_s            (B,K)@(K,D) matmul + epilogue
    ll   = x*log(rate) - rate - lgamma(x+1)    elementwise over (S,B,D)
    m    = min(finite(ll)) - 10                GLOBAL data-dependent clip bound
    out  = sum(clip(ll, m, 0) with non-finite -> m)   per-sample scalar

Under plain XLA the two dependent reductions (global min, then clipped sum)
force the (S,B,D) ``ll`` tensor through HBM. Here the computation runs as two
Pallas kernels instead — a min kernel accumulating the global finite-min in
SMEM, and a sum kernel that recomputes each tile and accumulates the clipped
per-sample sums given the (now scalar) bound — so nothing of shape (S,B,D)
ever touches HBM: 2x the MXU FLOPs (cheap) for ~S x less HBM traffic (the
bottleneck).

Splitting the phases into separate kernels (rather than a leading phase grid
dim) is what lets the clip bound cross devices: ``fused_poisson_loglik_
sharded`` runs both kernels inside ``jax.shard_map`` over a dp x fp mesh with
a ``lax.pmin`` between them and a ``lax.psum`` after — the data-dependent
clip is the cross-device-sensitive part of the reference semantics
(SURVEY.md §7 hard-part (d)). Same per-tile DMA traffic as the old fused
two-phase grid (phases never shared tile DMAs anyway).

Kernel geometry: the ELBO-sample dim S is unrolled *inside* the kernel body
(theta/v/phi blocks carry full S), so each (row-tile, col-tile) of x/lgx is
DMA'd once per kernel, and each grid is (B/128) x (D/1024) steps.

Gradients: ``_loglik_given_min`` carries a custom VJP whose backward pass
recomputes the rate in XLA from the (small) inputs — no (S,B,D) residuals
are saved, which also beats XLA autodiff (measured 121 ms vs 161 ms at
S=8, B=1024, K=32, D=20k on v5e). Divergence from raw autodiff (documented
in docs/PARITY.md): the clip bound ``m`` is treated as a constant in the
backward (autodiff would route a gradient to the argmin element); the XLA
fallback path keeps exact autodiff.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "fused_poisson_loglik",
    "fused_poisson_loglik_sharded",
    "poisson_loglik_reference",
]

TB, TD = 128, 1024  # row / feature tile sizes (f32 min tile is (8,128))


def _decode_rate(theta_v, eta, phi, log_transform):
    if log_transform:
        return jnp.exp(theta_v * eta) - 1.0 + phi
    return theta_v * eta + phi


def _safe_log(rate):
    """log with a tiny positive floor: f32 rate underflow to 0 must not
    poison gradients through the finite-mask (see Poisson.log_prob note);
    negative rates still yield NaN (reference semantics)."""
    tiny = jnp.finfo(rate.dtype).tiny
    out = jnp.log(jnp.maximum(rate, tiny))
    return jnp.where(rate < 0, jnp.nan, out)


def _floor_min_val(min_val):
    """Clamp the data-dependent clip bound: in float32 a legitimate-but-
    astronomical finite log-likelihood (e.g. -1e38 from an overflowing exp
    decoder) would make sum(clip(ll, min_val, 0)) overflow to -inf across
    ~1e8 entries. -1e27 x 1e8 stays representable; any run operating down
    here is in rescue mode, not inference. float64 keeps the exact bound."""
    if min_val.dtype == jnp.float32:
        return jnp.maximum(min_val, jnp.float32(-1e27))
    return min_val


def poisson_loglik_reference(theta, v, phi, x, eta, log_transform=False):
    """Pure-XLA implementation of the exact same semantics (the default
    training path; keeps full autodiff including the clip-bound gradient)."""
    theta_v = jnp.matmul(theta, v)
    rate = _decode_rate(theta_v, eta, phi, log_transform)
    ll = x * _safe_log(rate) - rate - gammaln(x + 1.0)
    finite = jnp.where(jnp.isfinite(ll), ll, jnp.zeros_like(ll))
    min_val = _floor_min_val(jnp.min(finite) - 10.0)
    ll = jnp.clip(ll, min_val, 0.0)
    ll = jnp.where(jnp.isfinite(ll), ll, min_val)
    return jnp.sum(ll, axis=(-1, -2))


def _tile_ll(theta_ref, v_ref, phi_ref, x, eta, lgx, s, log_transform):
    tv = jnp.dot(theta_ref[s], v_ref[s], preferred_element_type=jnp.float32)
    if log_transform:
        rate = jnp.exp(tv * eta) - 1.0 + phi_ref[s]
    else:
        rate = tv * eta + phi_ref[s]
    return x * _safe_log(rate) - rate - lgx


def _min_kernel(theta_ref, v_ref, phi_ref, x_ref, eta_ref, lgx_ref,
                min_ref, *, B, D, S, log_transform):
    i = pl.program_id(0)
    j = pl.program_id(1)
    x = x_ref[:]
    eta = eta_ref[:]
    lgx = lgx_ref[:]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (TB, TD), 0) + i * TB
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (TB, TD), 1) + j * TD
    in_bounds = (row_ids < B) & (col_ids < D)

    @pl.when((i == 0) & (j == 0))
    def _init():
        min_ref[0] = jnp.float32(0.0)

    for s in range(S):  # static unroll: blocks carry the full sample dim
        ll = _tile_ll(theta_ref, v_ref, phi_ref, x, eta, lgx, s, log_transform)
        tile_min = jnp.min(
            jnp.where(jnp.isfinite(ll) & in_bounds, ll, 0.0)
        )
        min_ref[0] = jnp.minimum(min_ref[0], tile_min)


def _sum_kernel(min_ref, theta_ref, v_ref, phi_ref, x_ref, eta_ref, lgx_ref,
                out_ref, *, B, D, S, log_transform):
    i = pl.program_id(0)
    j = pl.program_id(1)
    x = x_ref[:]
    eta = eta_ref[:]
    lgx = lgx_ref[:]
    min_val = min_ref[0]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (TB, TD), 0) + i * TB
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (TB, TD), 1) + j * TD
    in_bounds = (row_ids < B) & (col_ids < D)

    @pl.when((i == 0) & (j == 0))
    def _init():
        for s in range(S):
            out_ref[s] = jnp.float32(0.0)

    for s in range(S):
        ll = _tile_ll(theta_ref, v_ref, phi_ref, x, eta, lgx, s, log_transform)
        llc = jnp.clip(ll, min_val, 0.0)
        llc = jnp.where(jnp.isfinite(ll), llc, min_val)
        llc = jnp.where(in_bounds, llc, 0.0)
        out_ref[s] = out_ref[s] + jnp.sum(llc)


def _data_specs(S, K):
    return [
        pl.BlockSpec((S, TB, K), lambda i, j: (0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((S, K, TD), lambda i, j: (0, 0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((S, 1, TD), lambda i, j: (0, 0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((TB, TD), lambda i, j: (i, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TD), lambda i, j: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((TB, TD), lambda i, j: (i, j),
                     memory_space=pltpu.VMEM),
    ]


def _cost(S, B, K, D):
    return pl.CostEstimate(
        flops=2 * S * B * K * D,
        bytes_accessed=(S * B * K + S * K * D + 2 * B * D) * 4,
        transcendentals=2 * S * B * D,
    )


def _fused_min(theta, v, phi, x, eta, lgx, log_transform, interpret):
    """Raw global finite-min of ll (0-initialized), shape (1,) f32."""
    S, B, K = theta.shape
    D = x.shape[-1]
    grid = (pl.cdiv(B, TB), pl.cdiv(D, TD))
    return pl.pallas_call(
        functools.partial(_min_kernel, B=B, D=D, S=S,
                          log_transform=log_transform),
        grid=grid,
        in_specs=_data_specs(S, K),
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1,), jnp.float32),
        interpret=interpret,
        cost_estimate=_cost(S, B, K, D),
    )(theta, v, phi, x, eta, lgx)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _loglik_given_min(theta, v, phi, x, eta, lgx, min_val, log_transform,
                      interpret):
    """Per-sample clipped log-likelihood sums given a precomputed clip
    bound ``min_val`` (shape (1,), already -10-shifted and floored) and the
    precomputed ``lgx = lgamma(x+1)`` (materialized ONCE per step and shared
    by all four kernel passes — it is a 328 MB tensor at B=4096, D=20k).
    The bound is a constant to autodiff — matching the single-device fused
    semantics and making the cross-device pmin trivially differentiable."""
    return _sum_forward(theta, v, phi, x, eta, lgx, min_val, log_transform,
                        interpret)


def _sum_forward(theta, v, phi, x, eta, lgx, min_val, log_transform,
                 interpret):
    S, B, K = theta.shape
    D = x.shape[-1]
    grid = (pl.cdiv(B, TB), pl.cdiv(D, TD))
    return pl.pallas_call(
        functools.partial(_sum_kernel, B=B, D=D, S=S,
                          log_transform=log_transform),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + _data_specs(S, K),
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((S,), jnp.float32),
        interpret=interpret,
        cost_estimate=_cost(S, B, K, D),
    )(min_val, theta, v, phi, x, eta, lgx)


def _sum_fwd(theta, v, phi, x, eta, lgx, min_val, log_transform, interpret):
    out = _sum_forward(theta, v, phi, x, eta, lgx, min_val, log_transform,
                       interpret)
    return out, (theta, v, phi, x, eta, lgx, min_val)


def _bwd_dtv(s, min_ref, g_ref, theta_s, v_s, phi_ref, x, eta, lgx,
             in_bounds, log_transform):
    """Recompute one (row-tile, col-tile, sample) dtv = d(sum ll)/d(theta@v),
    with drate as the second return (for dphi). Operands must already have
    their out-of-bounds padding zeroed (NaN leaks through 0*garbage)."""
    tv = jnp.dot(theta_s, v_s, preferred_element_type=jnp.float32)
    if log_transform:
        ev = jnp.exp(tv * eta)
        rate = ev - 1.0 + phi_ref[s]
    else:
        rate = tv * eta + phi_ref[s]
    ll = x * _safe_log(rate) - rate - lgx
    active = jnp.isfinite(ll) & (ll > min_ref[0]) & (ll < 0.0) & in_bounds
    rate_safe = jnp.maximum(rate, jnp.finfo(jnp.float32).tiny)
    drate = jnp.where(active, x / rate_safe - 1.0, 0.0) * g_ref[s]
    if log_transform:
        dtv = drate * ev * eta
    else:
        dtv = drate * eta
    # padded-tile lanes hold uninitialized VMEM: 0 * garbage can be NaN
    # and would poison the whole matmul row — mask after the product
    dtv = jnp.where(active, dtv, 0.0)
    return dtv, jnp.where(active, drate, 0.0)


def _masks(i, j, B, D, K):
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (TB, TD), 0) + i * TB
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (TB, TD), 1) + j * TD
    in_bounds = (row_ids < B) & (col_ids < D)
    row_ok = (jax.lax.broadcasted_iota(jnp.int32, (TB, K), 0) + i * TB) < B
    col_ok = (jax.lax.broadcasted_iota(jnp.int32, (K, TD), 1) + j * TD) < D
    return in_bounds, row_ok, col_ok


def _bwd_kernel(min_ref, g_ref, theta_ref, v_ref, phi_ref, x_ref,
                eta_ref, lgx_ref, dtheta_p_ref, dv_ref, dphi_ref,
                *, B, D, S, log_transform):
    """All three gradients in ONE tile pass (the tv recompute is the
    expensive part at K=32 — the MXU runs at ~25% utilization, so saving a
    pass is ~25% of the backward). Grid (cols, rows) with rows INNER:
    dv/dphi blocks (col-indexed) stay resident across the row sweep, while
    dtheta is written as per-col-tile PARTIALS (summed over the col axis in
    XLA afterwards — a (nd, S, B, K) f32 spill, trivial traffic next to the
    (B, D) operands)."""
    j = pl.program_id(0)
    i = pl.program_id(1)
    K = theta_ref.shape[-1]
    x, eta, lgx = x_ref[:], eta_ref[:], lgx_ref[:]
    in_bounds, row_ok, col_ok = _masks(i, j, B, D, K)
    for s in range(S):
        theta_s = jnp.where(row_ok, theta_ref[s], 0.0)
        v_s = jnp.where(col_ok, v_ref[s], 0.0)
        dtv, drate = _bwd_dtv(s, min_ref, g_ref, theta_s, v_s, phi_ref, x,
                              eta, lgx, in_bounds, log_transform)
        dtheta_p_ref[0, s] = jnp.dot(dtv, v_s.T,
                                     preferred_element_type=jnp.float32)
        dv_s = jnp.dot(theta_s.T, dtv, preferred_element_type=jnp.float32)
        dph_s = jnp.sum(drate, axis=0, keepdims=True)

        @pl.when(i == 0)
        def _init():
            dv_ref[s] = dv_s
            dphi_ref[s] = dph_s

        @pl.when(i != 0)
        def _accum():
            dv_ref[s] += dv_s
            dphi_ref[s] += dph_s


def _bwd_pallas(theta, v, phi, x, eta, lgx, min_val, g, log_transform,
                interpret):
    """Two blocked kernels (dtheta; dv+dphi) — every output is tiled on its
    own grid dimension, so nothing of shape (S,B,D) OR a full gradient array
    ever sits in VMEM; the tv recompute runs twice (cheap MXU) in exchange."""
    S, B, K = theta.shape
    D = x.shape[-1]
    nb, nd = pl.cdiv(B, TB), pl.cdiv(D, TD)
    dtheta_p, dv, dphi = pl.pallas_call(
        functools.partial(_bwd_kernel, B=B, D=D, S=S,
                          log_transform=log_transform),
        grid=(nd, nb),  # rows inner: dv/dphi blocks resident per col tile
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),      # min_val (1,)
            pl.BlockSpec(memory_space=pltpu.SMEM),      # g (S,)
            pl.BlockSpec((S, TB, K), lambda j, i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, K, TD), lambda j, i: (0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 1, TD), lambda j, i: (0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, TD), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TD), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, TD), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, S, TB, K), lambda j, i: (j, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, K, TD), lambda j, i: (0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 1, TD), lambda j, i: (0, 0, j),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nd, S, nb * TB, K), jnp.float32),
            jax.ShapeDtypeStruct((S, K, nd * TD), jnp.float32),
            jax.ShapeDtypeStruct((S, 1, nd * TD), jnp.float32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * S * B * K * D,
            bytes_accessed=(nd * S * B * K + S * B * K + 2 * S * K * D
                            + 2 * B * D) * 4,
            transcendentals=2 * S * B * D,
        ),
    )(min_val, g, theta, v, phi, x, eta, lgx)
    dtheta = jnp.sum(dtheta_p, axis=0)
    return dtheta[:, :B, :], dv[..., :D], dphi[..., :D]


def _sum_bwd(log_transform, interpret, res, g):
    theta, v, phi, x, eta, lgx, min_val = res
    g = jnp.asarray(g, jnp.float32)
    return _bwd_pallas(theta, v, phi, x, eta, lgx, min_val, g,
                       log_transform, interpret) + (None, None, None, None)


_loglik_given_min.defvjp(_sum_fwd, _sum_bwd)


def _prep(theta, v, phi, x, eta):
    f32 = jnp.float32
    theta = jnp.asarray(theta, f32)
    v = jnp.asarray(v, f32)
    phi = jnp.asarray(phi, f32)
    x = jnp.asarray(x, f32)
    D = x.shape[-1]
    eta = jnp.broadcast_to(jnp.asarray(eta, f32), (1, D))
    return theta, v, phi, x, eta


def fused_poisson_loglik(theta, v, phi, x, eta, log_transform=False,
                         interpret=False):
    """Per-sample clipped Poisson log-likelihood sums, shape (S,).

    Args: theta (S,B,K), v (S,K,D), phi (S,1,D), x (B,D), eta (1,D) or
    scalar broadcastable. Single-device path; for mesh execution use
    ``fused_poisson_loglik_sharded``.
    """
    theta, v, phi, x, eta = _prep(theta, v, phi, x, eta)
    lgx = gammaln(x + 1.0)  # once per step; shared by all kernel passes
    # the min kernel has no autodiff rule and the clip bound is a constant
    # to the backward anyway — detach its inputs, not just its output
    sg = jax.lax.stop_gradient
    raw_min = _fused_min(sg(theta), sg(v), sg(phi), x, eta, lgx,
                         log_transform, interpret)
    min_val = _floor_min_val(raw_min - 10.0)
    return _loglik_given_min(theta, v, phi, x, eta, lgx, min_val,
                             log_transform, interpret)


def fused_poisson_loglik_sharded(theta, v, phi, x, eta, mesh,
                                 log_transform=False, interpret=False,
                                 data_axis="dp", feature_axis="fp"):
    """Mesh-composed fused likelihood: per-shard Pallas min, ``lax.pmin``
    across the mesh, per-shard Pallas clipped sums, ``lax.psum`` — the exact
    global-clip semantics of the single-device kernel, scaled over dp x fp
    (VERDICT r1 #2; reference data-dependent clip: poisson.py:606-619).

    Rows of theta/x shard over ``data_axis``; feature columns of
    v/phi/x/eta over ``feature_axis`` (either axis may be absent). The
    (S,) output is fully replicated.
    """
    from jax.sharding import PartitionSpec as P

    theta, v, phi, x, eta = _prep(theta, v, phi, x, eta)
    dp = data_axis if data_axis in mesh.axis_names and mesh.shape[data_axis] > 1 else None
    fp = (feature_axis
          if feature_axis in mesh.axis_names and mesh.shape[feature_axis] > 1
          else None)
    axes = tuple(a for a in (dp, fp) if a is not None)
    if not axes:
        return fused_poisson_loglik(theta, v, phi, x, eta, log_transform,
                                    interpret)

    def body(theta, v, phi, x, eta):
        lgx = gammaln(x + 1.0)  # once per shard per step
        sg = jax.lax.stop_gradient
        local_min = _fused_min(sg(theta), sg(v), sg(phi), x, eta, lgx,
                               log_transform, interpret)
        gmin = jax.lax.pmin(local_min, axes)
        min_val = _floor_min_val(gmin - 10.0)
        out = _loglik_given_min(theta, v, phi, x, eta, lgx, min_val,
                                log_transform, interpret)
        return jax.lax.psum(out, axes)

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(None, dp, None),   # theta (S, B, K)
            P(None, None, fp),   # v     (S, K, D)
            P(None, None, fp),   # phi   (S, 1, D)
            P(dp, fp),           # x     (B, D)
            P(None, fp),         # eta   (1, D)
        ),
        out_specs=P(),
        check_vma=False,
    )(theta, v, phi, x, eta)


# --------------------------------------------------------------------------
# Exp-rate total for the SPARSE energy with the log-transform decode link:
#     R_s = sum_ij exp((theta_s @ v_s) * eta)
# The sparse COO energy needs sum_ij rate without materializing (B, D); for
# the identity link it collapses in closed form, for the exp link this
# kernel reduces it tile-by-tile (and the custom VJP recomputes per tile —
# the same two-kernel structure as the likelihood backward).


def _expsum_kernel(theta_ref, v_ref, eta_ref, out_ref, *, B, D, S):
    i = pl.program_id(0)
    j = pl.program_id(1)
    eta = eta_ref[:]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (TB, TD), 0) + i * TB
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (TB, TD), 1) + j * TD
    in_bounds = (row_ids < B) & (col_ids < D)

    @pl.when((i == 0) & (j == 0))
    def _init():
        for s in range(S):
            out_ref[s] = jnp.float32(0.0)

    for s in range(S):
        tv = jnp.dot(theta_ref[s], v_ref[s],
                     preferred_element_type=jnp.float32)
        ev = jnp.exp(tv * eta)
        out_ref[s] = out_ref[s] + jnp.sum(jnp.where(in_bounds, ev, 0.0))


def _expsum_bwd_dtheta_kernel(g_ref, theta_ref, v_ref, eta_ref, dtheta_ref,
                              *, B, D, S):
    i = pl.program_id(0)
    j = pl.program_id(1)
    K = theta_ref.shape[-1]
    eta = eta_ref[:]
    in_bounds, row_ok, col_ok = _masks(i, j, B, D, K)
    for s in range(S):
        theta_s = jnp.where(row_ok, theta_ref[s], 0.0)
        v_s = jnp.where(col_ok, v_ref[s], 0.0)
        tv = jnp.dot(theta_s, v_s, preferred_element_type=jnp.float32)
        dtv = jnp.where(in_bounds, jnp.exp(tv * eta) * eta, 0.0) * g_ref[s]
        dth = jnp.dot(dtv, v_s.T, preferred_element_type=jnp.float32)

        @pl.when(j == 0)
        def _init():
            dtheta_ref[s] = dth

        @pl.when(j != 0)
        def _accum():
            dtheta_ref[s] += dth


def _expsum_bwd_dv_kernel(g_ref, theta_ref, v_ref, eta_ref, dv_ref,
                          *, B, D, S):
    j = pl.program_id(0)
    i = pl.program_id(1)
    K = theta_ref.shape[-1]
    eta = eta_ref[:]
    in_bounds, row_ok, col_ok = _masks(i, j, B, D, K)
    for s in range(S):
        theta_s = jnp.where(row_ok, theta_ref[s], 0.0)
        v_s = jnp.where(col_ok, v_ref[s], 0.0)
        tv = jnp.dot(theta_s, v_s, preferred_element_type=jnp.float32)
        dtv = jnp.where(in_bounds, jnp.exp(tv * eta) * eta, 0.0) * g_ref[s]
        dv_s = jnp.dot(theta_s.T, dtv, preferred_element_type=jnp.float32)

        @pl.when(i == 0)
        def _init():
            dv_ref[s] = dv_s

        @pl.when(i != 0)
        def _accum():
            dv_ref[s] += dv_s


def _expsum_specs(S, K, order):
    if order == "ij":
        im = lambda a, b: (a, b)
    else:
        im = lambda a, b: (b, a)
    return [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # g (S,)
        pl.BlockSpec((S, TB, K), lambda a, b: (0, im(a, b)[0], 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((S, K, TD), lambda a, b: (0, 0, im(a, b)[1]),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TD), lambda a, b: (0, im(a, b)[1]),
                     memory_space=pltpu.VMEM),
    ]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_exp_rate_sum(theta, v, eta, interpret=False):
    """R_s = sum_ij exp((theta_s @ v_s) * eta), shape (S,), float32.

    theta (S,B,K), v (S,K,D), eta (1,D) or scalar."""
    out, _ = _expsum_fwd(theta, v, eta, interpret)
    return out


def _expsum_prep(theta, v, eta):
    theta = jnp.asarray(theta, jnp.float32)
    v = jnp.asarray(v, jnp.float32)
    D = v.shape[-1]
    eta = jnp.broadcast_to(jnp.asarray(eta, jnp.float32), (1, D))
    return theta, v, eta


def _expsum_fwd(theta, v, eta, interpret):
    theta, v, eta = _expsum_prep(theta, v, eta)
    S, B, K = theta.shape
    D = v.shape[-1]
    grid = (pl.cdiv(B, TB), pl.cdiv(D, TD))
    out = pl.pallas_call(
        functools.partial(_expsum_kernel, B=B, D=D, S=S),
        grid=grid,
        in_specs=[
            pl.BlockSpec((S, TB, K), lambda i, j: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, K, TD), lambda i, j: (0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TD), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((S,), jnp.float32),
        interpret=interpret,
        cost_estimate=_cost(S, B, K, D),
    )(theta, v, eta)
    return out, (theta, v, eta)


def _expsum_bwd(interpret, res, g):
    theta, v, eta = res
    S, B, K = theta.shape
    D = v.shape[-1]
    g = jnp.asarray(g, jnp.float32)
    nb, nd = pl.cdiv(B, TB), pl.cdiv(D, TD)
    dtheta = pl.pallas_call(
        functools.partial(_expsum_bwd_dtheta_kernel, B=B, D=D, S=S),
        grid=(nb, nd),
        in_specs=_expsum_specs(S, K, "ij"),
        out_specs=pl.BlockSpec((S, TB, K), lambda i, j: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, nb * TB, K), jnp.float32),
        interpret=interpret,
        cost_estimate=_cost(S, B, K, D),
    )(g, theta, v, eta)
    dv = pl.pallas_call(
        functools.partial(_expsum_bwd_dv_kernel, B=B, D=D, S=S),
        grid=(nd, nb),
        in_specs=_expsum_specs(S, K, "ji"),
        out_specs=pl.BlockSpec((S, K, TD), lambda j, i: (0, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, K, nd * TD), jnp.float32),
        interpret=interpret,
        cost_estimate=_cost(S, B, K, D),
    )(g, theta, v, eta)
    return dtheta[:, :B, :], dv[..., :D], None


fused_exp_rate_sum.defvjp(_expsum_fwd, _expsum_bwd)
