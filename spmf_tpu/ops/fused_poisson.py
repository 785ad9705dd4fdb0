"""Fused decode + Poisson log-likelihood Pallas kernels.

The hot path of the ADVI energy (reference: mederrata_spmf/poisson.py:156-184
+ 606-619) is, per ELBO sample s:

    rate = f(theta_s @ v_s) + phi_s            (B,K)@(K,D) matmul + epilogue
    ll   = x*log(rate) - rate - lgamma(x+1)    elementwise over (S,B,D)
    m    = min(finite(ll)) - 10                GLOBAL data-dependent clip bound
    out  = sum(clip(ll, m, 0) with non-finite -> m)   per-sample scalar

Under plain XLA the two dependent reductions (global min, then clipped sum)
force the (S,B,D) ``ll`` tensor through HBM. Here the whole computation runs
as ONE Pallas pass. The key invariant: with ``m = max(min(finite ll) - 10,
FLOOR)`` every finite ``ll`` is either ``> FLOOR`` (in which case ``ll >= m``
always holds, since either ``m = min - 10 < ll`` or ``m = FLOOR < ll``) or
``<= FLOOR <= m`` (contributing exactly ``m``, since ``m = FLOOR`` whenever
such entries exist). So

    sum(clip(ll, m, 0), nonfinite -> m)
  = sum(min(ll, 0) over finite ll > FLOOR)  +  m * #(nonfinite or <= FLOOR)

and the kernel only needs to emit three *scalars-per-sample* — the partial
sums, the clip counts, and the global finite-min — with the ``m``-dependent
correction applied to scalars in XLA afterwards. One pass instead of the
previous min-kernel + sum-kernel two (halving both the (B,D) DMA traffic and
the MXU recompute), and nothing of shape (S,B,D) ever touches HBM.

The scalar decomposition is also what makes the mesh composition cheap:
``fused_poisson_loglik_sharded`` runs the single stats kernel per shard
inside ``jax.shard_map`` over a dp x fp mesh, then ``lax.pmin``/``lax.psum``
the three scalar outputs — the data-dependent clip is the cross-device-
sensitive part of the reference semantics (SURVEY.md §7 hard-part (d)).

``lgamma(x+1)`` is computed IN-KERNEL per tile (8-step shift + Stirling at
``z = x+9``, exact to f32 roundoff for x in [0, ~4e9] — Mosaic has no
lgamma primitive) instead of materializing a (B,D) ``lgx`` tensor in XLA:
at B=4096, D=20k that removes a 328 MB materialization plus one read per
kernel pass.

Kernel geometry: the ELBO-sample dim S is unrolled *inside* the kernel body
(theta/v/phi blocks carry full S), so each (row-tile, col-tile) of x is
DMA'd once per kernel, and each grid is (B/128) x (D/1024) steps.

Gradients: the 'x' energy part's gradient is LINEAR in its per-sample
scalar cotangent, so ``_fused_stats``'s forward SPECULATIVELY emits the
three pathwise gradients at unit cotangent from the same tiles
(``_stats_grad_kernel``) and the custom-VJP backward is a per-sample scalar
rescale of small residuals ((S,B,K)+(S,K,D)+(S,1,D)) — the whole fwd+bwd is
ONE sweep over x (interleaved A/B at B=4096/D=20k: 18.6 ms for the original
two-pass-fwd + recompute-bwd chain, 11.8 ms for this). Divergence from raw
autodiff (documented in docs/PARITY.md): the clip bound ``m`` is treated as
a constant in the backward (autodiff would route a gradient to the argmin
element); the XLA fallback path keeps exact autodiff. The active-gradient
set {finite, ll < 0, ll > m} is expressible with the static FLOOR
(``ll > FLOOR``, by the invariant above), so the gradients can be computed
before ``m`` is known.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "bernoulli_loglik_reference",
    "normal_loglik_reference",
    "fused_exp_rate_sum",
    "fused_poisson_loglik",
    "fused_poisson_loglik_sharded",
    "fused_poisson_row_loglik",
    "poisson_loglik_reference",
]

TB, TD = 128, 1024  # row / feature tile sizes (f32 min tile is (8,128))
FLOOR = -1e27       # static clip-bound floor (see _floor_min_val)

#: per-column type codes for the ('mixed', obs_scale) likelihood — the
#: MixedFactorization decoder (models/mixed.py) as ONE kernel pass: a
#: (1, D) float lane selects the per-column log-density, so the mixed
#: model shards over dp x fp exactly like the single-family kernels
#: (codes partition with the feature axis, like eta).
CODE_POISSON, CODE_BERNOULLI, CODE_NORMAL = 0.0, 1.0, 2.0


def _check_likelihood(likelihood, codes):
    """Validate the static likelihood selector. An unrecognized value used
    to fall through to the Poisson branch silently (r2 advisor finding:
    MixedFactorization WAIC returned Poisson log-lik — NaN on negative
    rates — for every column); now it is a hard error. Likewise
    ``('mixed', s)`` without a per-column ``codes`` lane would zero-fill to
    all-Poisson (_prep), so ``codes`` is REQUIRED here — every entry point
    threads the value it will hand to _prep."""
    if likelihood in ("poisson", "bernoulli", "poisson_softplus"):
        return
    if (
        isinstance(likelihood, tuple)
        and len(likelihood) == 2
        and likelihood[0] in ("normal", "mixed")
        and isinstance(likelihood[1], (int, float))
    ):
        if likelihood[0] == "mixed" and codes is None:
            raise ValueError(
                "likelihood=('mixed', obs_scale) requires the per-column "
                "codes lane (codes=None would default every column to "
                "Poisson)"
            )
        return
    raise ValueError(
        f"unknown likelihood {likelihood!r}: expected 'poisson', "
        "'bernoulli', 'poisson_softplus', ('normal', obs_scale) or "
        "('mixed', obs_scale)"
    )


def _needs_lgamma(likelihood):
    return likelihood in ("poisson", "poisson_softplus") or (
        isinstance(likelihood, tuple) and likelihood[0] == "mixed"
    )


def _lgamma_xp1(x):
    """lgamma(x+1) for x >= 0, Mosaic-safe (no lgamma primitive): shift the
    argument up 8 (two 4-term products, each < 3.4e38 for x < ~4e9) and
    apply a 3-term Stirling series at z = x+9 >= 9. Max error vs float64
    gammaln: ~1.5e-6 relative — f32 roundoff."""
    z = x + 9.0
    zi = 1.0 / z
    zi2 = zi * zi
    series = (
        (z - 0.5) * jnp.log(z) - z + 0.9189385332046727  # 0.5*log(2*pi)
        + zi * (1.0 / 12.0 + zi2 * (-1.0 / 360.0 + zi2 * (1.0 / 1260.0)))
    )
    p1 = (x + 1.0) * (x + 2.0) * (x + 3.0) * (x + 4.0)
    p2 = (x + 5.0) * (x + 6.0) * (x + 7.0) * (x + 8.0)
    return series - jnp.log(p1) - jnp.log(p2)


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


def _softplus_f32(x):
    return jnp.maximum(x, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(x)))


def normal_loglik_reference(theta, v, phi, x, eta, obs_scale=1.0,
                            log_transform=False):
    """Pure-XLA Normal(loc=rate, scale=obs_scale) counterpart (the net-new
    true-Gaussian observation decoder, SURVEY.md §2.4 rebuild decision) in
    the poisson.py:606-619 clip/sum frame."""
    rate = _decode_rate(jnp.matmul(theta, v), eta, phi, log_transform)
    r = (x - rate) / obs_scale
    ll = -0.5 * r * r - (np.log(obs_scale) + 0.9189385332046727)
    finite = jnp.where(jnp.isfinite(ll), ll, jnp.zeros_like(ll))
    min_val = _floor_min_val(jnp.min(finite) - 10.0)
    ll = jnp.clip(ll, min_val, 0.0)
    ll = jnp.where(jnp.isfinite(ll), ll, min_val)
    return jnp.sum(ll, axis=(-1, -2))


def bernoulli_loglik_reference(theta, v, phi, x, eta, log_transform=False):
    """Pure-XLA Bernoulli(logits=rate) counterpart of
    ``poisson_loglik_reference`` (reference bernoulli.py:148 likelihood in
    the poisson.py:606-619 clip/sum frame)."""
    logits = _decode_rate(jnp.matmul(theta, v), eta, phi, log_transform)
    ll = x * logits - _softplus_f32(logits)
    finite = jnp.where(jnp.isfinite(ll), ll, jnp.zeros_like(ll))
    min_val = _floor_min_val(jnp.min(finite) - 10.0)
    ll = jnp.clip(ll, min_val, 0.0)
    ll = jnp.where(jnp.isfinite(ll), ll, min_val)
    return jnp.sum(ll, axis=(-1, -2))


def _tile_ll(theta_ref, v_ref, phi_ref, x, eta, lgx, s, log_transform,
             likelihood="poisson", codes=None):
    tv = jnp.dot(theta_ref[s], v_ref[s], preferred_element_type=jnp.float32)
    if log_transform:
        rate = jnp.exp(tv * eta) - 1.0 + phi_ref[s]
    else:
        rate = tv * eta + phi_ref[s]
    if likelihood == "bernoulli":
        # rate plays the role of logits (reference bernoulli.py:148):
        # ll = x*logits - softplus(logits), logit-space stable
        return x * rate - _softplus_f32(rate)
    if isinstance(likelihood, tuple) and likelihood[0] == "normal":
        inv = 1.0 / likelihood[1]
        r = (x - rate) * inv
        # log(obs_scale) + 0.5*log(2*pi)
        c = float(np.log(likelihood[1]) + 0.9189385332046727)
        return -0.5 * r * r - c
    if likelihood == "poisson_softplus":
        # MixedFactorization's positive link for Poisson columns:
        # lam = softplus(rate) (models/mixed.py)
        lam = _softplus_f32(rate)
        return x * jnp.log(lam) - lam - lgx
    if isinstance(likelihood, tuple) and likelihood[0] == "mixed":
        # per-column select over the three families (models/mixed.py):
        # evaluate each density on the full tile and pick by the (1, TD)
        # codes lane — the matmul (the FLOP cost) happens once, and the
        # static column types become a vectorized select, not a gather
        lam = _softplus_f32(rate)
        ll_p = x * jnp.log(lam) - lam - lgx
        ll_b = x * rate - _softplus_f32(rate)
        inv = 1.0 / likelihood[1]
        r = (x - rate) * inv
        c = float(np.log(likelihood[1]) + 0.9189385332046727)
        ll_n = -0.5 * r * r - c
        return jnp.where(
            codes == CODE_BERNOULLI, ll_b,
            jnp.where(codes == CODE_NORMAL, ll_n, ll_p),
        )
    return x * _safe_log(rate) - rate - lgx


def _tile_ll_grads(theta_s, v_s, phi_ref, x, eta, lgx, s, in_bounds,
                   log_transform, likelihood, codes=None):
    """ll plus the UNIT-cotangent pathwise derivatives d(sum ll)/d(tv) and
    d(sum ll)/d(rate) for one (row-tile, col-tile, sample). Operands must
    already have their out-of-bounds padding zeroed (NaN leaks through
    0*garbage). The active set uses the static FLOOR: by the clip-
    decomposition invariant it equals the dynamic {ll > m} set."""
    tv = jnp.dot(theta_s, v_s, preferred_element_type=jnp.float32)
    if log_transform:
        ev = jnp.exp(tv * eta)
        rate = ev - 1.0 + phi_ref[s]
    else:
        rate = tv * eta + phi_ref[s]
    if likelihood == "bernoulli":
        ll = x * rate - _softplus_f32(rate)
        dll = x - jax.nn.sigmoid(rate)
    elif isinstance(likelihood, tuple) and likelihood[0] == "normal":
        inv = 1.0 / likelihood[1]
        r = (x - rate) * inv
        c = float(np.log(likelihood[1]) + 0.9189385332046727)
        ll = -0.5 * r * r - c
        dll = r * inv
    elif likelihood == "poisson_softplus":
        lam = _softplus_f32(rate)
        tiny = jnp.finfo(jnp.float32).tiny
        ll = x * jnp.log(lam) - lam - lgx
        # gate the x/lam term exactly like autodiff through max(lam, tiny):
        # an underflowed lam contributes no gradient (x/tiny would overflow
        # to inf and poison the matmul row)
        dll = (jnp.where(lam > tiny, x / jnp.maximum(lam, tiny), 0.0)
               - 1.0) * jax.nn.sigmoid(rate)
    elif isinstance(likelihood, tuple) and likelihood[0] == "mixed":
        tiny = jnp.finfo(jnp.float32).tiny
        lam = _softplus_f32(rate)
        ll_p = x * jnp.log(lam) - lam - lgx
        dll_p = (jnp.where(lam > tiny, x / jnp.maximum(lam, tiny), 0.0)
                 - 1.0) * jax.nn.sigmoid(rate)
        ll_b = x * rate - _softplus_f32(rate)
        dll_b = x - jax.nn.sigmoid(rate)
        inv = 1.0 / likelihood[1]
        r = (x - rate) * inv
        c = float(np.log(likelihood[1]) + 0.9189385332046727)
        ll_n = -0.5 * r * r - c
        dll_n = r * inv
        is_b = codes == CODE_BERNOULLI
        is_n = codes == CODE_NORMAL
        ll = jnp.where(is_b, ll_b, jnp.where(is_n, ll_n, ll_p))
        dll = jnp.where(is_b, dll_b, jnp.where(is_n, dll_n, dll_p))
    else:
        ll = x * _safe_log(rate) - rate - lgx
        tiny = jnp.finfo(jnp.float32).tiny
        # match autodiff through _safe_log's max(rate, tiny): a zero/floored
        # rate contributes -1 (the rate term), not x/tiny = inf
        dll = jnp.where(rate > tiny, x / jnp.maximum(rate, tiny), 0.0) - 1.0
    active = (jnp.isfinite(ll) & (ll > jnp.float32(FLOOR)) & (ll < 0.0)
              & in_bounds)
    drate = jnp.where(active, dll, 0.0)
    if log_transform:
        dtv = drate * ev * eta
    else:
        dtv = drate * eta
    # padded-tile lanes hold uninitialized VMEM: 0 * garbage can be NaN
    # and would poison the whole matmul row — mask after the product
    dtv = jnp.where(active, dtv, 0.0)
    return ll, dtv, drate


def _stats_grad_kernel(theta_ref, v_ref, phi_ref, x_ref, eta_ref, codes_ref,
                       sum_ref, cnt_ref, min_ref,
                       dtheta_p_ref, dv_ref, dphi_ref,
                       *, B, D, S, log_transform, likelihood):
    """ONE tile pass computing BOTH the clip-decomposition stats (per-
    sample sums of min(ll,0) over finite ll > FLOOR, clip counts, global
    finite-min) AND the three pathwise gradients at UNIT cotangent. The
    'x' energy part's gradient is linear in its per-sample scalar
    cotangent, so the backward is a scalar rescale of these residuals —
    the whole fwd+bwd is a single sweep over x (3 tile matmuls) instead
    of a stats pass plus a recompute backward pass (1 + 3 matmuls over
    two sweeps).

    Grid (cols, rows) with rows INNER: dv/dphi blocks (col-indexed) stay
    resident across the row sweep; dtheta is written as per-col-tile
    PARTIALS (summed over the col axis in XLA afterwards)."""
    j = pl.program_id(0)
    i = pl.program_id(1)
    K = theta_ref.shape[-1]
    x, eta, codes = x_ref[:], eta_ref[:], codes_ref[:]
    lgx = _lgamma_xp1(x) if _needs_lgamma(likelihood) else 0.0
    in_bounds, row_ok, col_ok = _masks(i, j, B, D, K)

    @pl.when((i == 0) & (j == 0))
    def _init_stats():
        min_ref[0] = jnp.float32(0.0)
        for s in range(S):
            sum_ref[s] = jnp.float32(0.0)
            cnt_ref[s] = jnp.int32(0)

    for s in range(S):  # static unroll: blocks carry the full sample dim
        theta_s = jnp.where(row_ok, theta_ref[s], 0.0)
        v_s = jnp.where(col_ok, v_ref[s], 0.0)
        ll, dtv, drate = _tile_ll_grads(theta_s, v_s, phi_ref, x, eta, lgx,
                                        s, in_bounds, log_transform,
                                        likelihood, codes)
        finite = jnp.isfinite(ll)
        min_ref[0] = jnp.minimum(
            min_ref[0], jnp.min(jnp.where(finite & in_bounds, ll, 0.0))
        )
        keep = finite & (ll > jnp.float32(FLOOR))
        sum_ref[s] = sum_ref[s] + jnp.sum(
            jnp.where(keep & in_bounds, jnp.minimum(ll, 0.0), 0.0)
        )
        cnt_ref[s] = cnt_ref[s] + jnp.sum(
            jnp.where((~keep) & in_bounds, 1, 0).astype(jnp.int32)
        )

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


def _sum_static_grad_kernel(theta_ref, v_ref, phi_ref, x_ref, eta_ref,
                            codes_ref, sum_ref,
                            dtheta_p_ref, dv_ref, dphi_ref,
                            *, B, D, S, log_transform, likelihood):
    """The static-clip variant of ``_stats_grad_kernel``: the clip bound
    is the STATIC ``FLOOR`` instead of the data-dependent
    ``min(finite ll) - 10``, so the per-(tile, sample) global-min and
    clip-count reductions (and their mask arithmetic) disappear — the
    clipped-cell contribution ``FLOOR`` folds directly into the sum.
    Identical to the reference mode on every batch whose finite lls stay
    above FLOOR = -1e27 (all healthy data: the dynamic bound only ever
    binds in rescue scenarios, docs/PARITY.md), and the GRADIENTS are
    bit-identical by construction (both modes' active set is the static
    ``{finite, ll > FLOOR, ll < 0}``). Kernel cost: 2 of the 4 tile
    reductions and ~4 VPU ops/cell-sample removed (docs/ROOFLINE.md
    arithmetic)."""
    j = pl.program_id(0)
    i = pl.program_id(1)
    K = theta_ref.shape[-1]
    x, eta, codes = x_ref[:], eta_ref[:], codes_ref[:]
    lgx = _lgamma_xp1(x) if _needs_lgamma(likelihood) else 0.0
    in_bounds, row_ok, col_ok = _masks(i, j, B, D, K)

    @pl.when((i == 0) & (j == 0))
    def _init_sums():
        for s in range(S):
            sum_ref[s] = jnp.float32(0.0)

    for s in range(S):
        theta_s = jnp.where(row_ok, theta_ref[s], 0.0)
        v_s = jnp.where(col_ok, v_ref[s], 0.0)
        ll, dtv, drate = _tile_ll_grads(theta_s, v_s, phi_ref, x, eta, lgx,
                                        s, in_bounds, log_transform,
                                        likelihood, codes)
        keep = jnp.isfinite(ll) & (ll > jnp.float32(FLOOR))
        sum_ref[s] = sum_ref[s] + jnp.sum(
            jnp.where(
                in_bounds,
                jnp.where(keep, jnp.minimum(ll, 0.0), jnp.float32(FLOOR)),
                0.0,
            )
        )

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


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _fused_sum_static(theta, v, phi, x, eta, codes, log_transform,
                      interpret, likelihood="poisson"):
    """Per-sample sums of ``clip(ll, FLOOR, 0)`` (non-finite -> FLOOR):
    the static-clip 'x' energy part, shape (S,) f32. Same speculative
    unit-cotangent gradients and scalar-rescale backward as
    ``_fused_stats`` (the two modes' gradients are identical — see
    ``_sum_static_grad_kernel``)."""
    out, _ = _sum_static_fwd(theta, v, phi, x, eta, codes, log_transform,
                             interpret, likelihood)
    return out


def _sum_static_fwd(theta, v, phi, x, eta, codes, log_transform, interpret,
                    likelihood="poisson"):
    S, B, K = theta.shape
    D = x.shape[-1]
    nb, nd = pl.cdiv(B, TB), pl.cdiv(D, TD)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    ssum, dtheta_p, dv, dphi = pl.pallas_call(
        functools.partial(_sum_static_grad_kernel, B=B, D=D, S=S,
                          log_transform=log_transform,
                          likelihood=likelihood),
        grid=(nd, nb),  # rows inner: dv/dphi blocks resident per col tile
        in_specs=[
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
            pl.BlockSpec((1, TD), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            smem,
            pl.BlockSpec((1, S, TB, K), lambda j, i: (j, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, K, TD), lambda j, i: (0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 1, TD), lambda j, i: (0, 0, j),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((S,), jnp.float32),
            jax.ShapeDtypeStruct((nd, S, nb * TB, K), jnp.float32),
            jax.ShapeDtypeStruct((S, K, nd * TD), jnp.float32),
            jax.ShapeDtypeStruct((S, 1, nd * TD), jnp.float32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * S * B * K * D,
            bytes_accessed=(nd * S * B * K + S * B * K + 2 * S * K * D
                            + B * D) * 4,
            transcendentals=2 * S * B * D,
        ),
    )(theta, v, phi, x, eta, codes)
    dtheta = jnp.sum(dtheta_p, axis=0)[:, :B, :]
    return ssum, (dtheta, dv[..., :D], dphi[..., :D])


def _sum_static_bwd(log_transform, interpret, likelihood, res, g):
    dtheta_u, dv_u, dphi_u = res
    g = jnp.asarray(g, jnp.float32)[:, None, None]  # (S,1,1)
    return dtheta_u * g, dv_u * g, dphi_u * g, None, None, None


_fused_sum_static.defvjp(_sum_static_fwd, _sum_static_bwd)


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
        pl.BlockSpec((1, TD), lambda i, j: (0, j),
                     memory_space=pltpu.VMEM),
    ]


def _cost(S, B, K, D):
    return pl.CostEstimate(
        flops=2 * S * B * K * D,
        bytes_accessed=(S * B * K + S * K * D + B * D) * 4,
        transcendentals=2 * S * B * D,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _fused_stats(theta, v, phi, x, eta, codes, log_transform, interpret,
                 likelihood="poisson"):
    """(sums (S,) f32, counts (S,) i32, global finite-min (1,) f32) of the
    clip decomposition (module docstring). Inputs must be f32-prepped
    (``codes`` is the per-column type lane for the mixed likelihood,
    zeros otherwise). The forward SPECULATIVELY computes the three
    pathwise gradients at unit cotangent in the same tile pass
    (_stats_grad_kernel) and saves them as residuals (~(S,B,K)+(S,K,D),
    tiny next to x); the backward is a per-sample scalar rescale —
    gradient of the sums only (the counts are piecewise constant and the
    clip bound is a constant to autodiff by design)."""
    out, _ = _stats_fwd(theta, v, phi, x, eta, codes, log_transform,
                        interpret, likelihood)
    return out


def _stats_fwd(theta, v, phi, x, eta, codes, log_transform, interpret,
               likelihood="poisson"):
    S, B, K = theta.shape
    D = x.shape[-1]
    nb, nd = pl.cdiv(B, TB), pl.cdiv(D, TD)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    ssum, cnt, gmin, dtheta_p, dv, dphi = pl.pallas_call(
        functools.partial(_stats_grad_kernel, B=B, D=D, S=S,
                          log_transform=log_transform,
                          likelihood=likelihood),
        grid=(nd, nb),  # rows inner: dv/dphi blocks resident per col tile
        in_specs=[
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
            pl.BlockSpec((1, TD), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            smem, smem, smem,
            pl.BlockSpec((1, S, TB, K), lambda j, i: (j, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, K, TD), lambda j, i: (0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 1, TD), lambda j, i: (0, 0, j),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((S,), jnp.float32),
            jax.ShapeDtypeStruct((S,), jnp.int32),
            jax.ShapeDtypeStruct((1,), jnp.float32),
            jax.ShapeDtypeStruct((nd, S, nb * TB, K), jnp.float32),
            jax.ShapeDtypeStruct((S, K, nd * TD), jnp.float32),
            jax.ShapeDtypeStruct((S, 1, nd * TD), jnp.float32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * S * B * K * D,
            bytes_accessed=(nd * S * B * K + S * B * K + 2 * S * K * D
                            + B * D) * 4,
            transcendentals=2 * S * B * D,
        ),
    )(theta, v, phi, x, eta, codes)
    dtheta = jnp.sum(dtheta_p, axis=0)[:, :B, :]
    return (ssum, cnt, gmin), (dtheta, dv[..., :D], dphi[..., :D])


def _stats_bwd(log_transform, interpret, likelihood, res, cot):
    dtheta_u, dv_u, dphi_u = res
    g = jnp.asarray(cot[0], jnp.float32)[:, None, None]  # (S,1,1)
    return dtheta_u * g, dv_u * g, dphi_u * g, None, None, None


_fused_stats.defvjp(_stats_fwd, _stats_bwd)


def _masks(i, j, B, D, K):
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (TB, TD), 0) + i * TB
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (TB, TD), 1) + j * TD
    in_bounds = (row_ids < B) & (col_ids < D)
    row_ok = (jax.lax.broadcasted_iota(jnp.int32, (TB, K), 0) + i * TB) < B
    col_ok = (jax.lax.broadcasted_iota(jnp.int32, (K, TD), 1) + j * TD) < D
    return in_bounds, row_ok, col_ok


def _row_axes(mesh, data_axis):
    """Live row-sharding mesh axes as a tuple (or None): ``data_axis`` may
    be one name ('dp') or a joint tuple (('dcn', 'dp') for multi-slice
    meshes — rows shard over both; parallel.mesh.make_multislice_mesh)."""
    names = (data_axis if isinstance(data_axis, (tuple, list))
             else (data_axis,))
    live = tuple(a for a in names
                 if a in mesh.axis_names and mesh.shape[a] > 1)
    return live or None


def _prep(theta, v, phi, x, eta, codes=None):
    f32 = jnp.float32
    theta = jnp.asarray(theta, f32)
    v = jnp.asarray(v, f32)
    phi = jnp.asarray(phi, f32)
    x = jnp.asarray(x, f32)
    D = x.shape[-1]
    eta = jnp.broadcast_to(jnp.asarray(eta, f32), (1, D))
    if codes is None:
        codes = jnp.zeros((1, D), f32)
    else:
        codes = jnp.broadcast_to(jnp.asarray(codes, f32), (1, D))
    return theta, v, phi, x, eta, codes


def fused_poisson_loglik(theta, v, phi, x, eta, log_transform=False,
                         interpret=False, likelihood="poisson", codes=None,
                         clip="reference"):
    """Per-sample clipped log-likelihood sums, shape (S,).

    Args: theta (S,B,K), v (S,K,D), phi (S,1,D), x (B,D), eta (1,D) or
    scalar broadcastable. ``likelihood='poisson'`` (reference
    poisson.py:177-183), ``'bernoulli'`` (logits decode, reference
    bernoulli.py:148), ``('normal', s)``, ``'poisson_softplus'``, or
    ``('mixed', s)`` with a (1, D) per-column ``codes`` lane
    (CODE_POISSON/CODE_BERNOULLI/CODE_NORMAL). Single-device path; for
    mesh execution use ``fused_poisson_loglik_sharded``.

    ``clip='reference'`` (default) reproduces the reference's
    data-dependent bound ``m = min(finite ll) - 10``; ``clip='static'``
    clips at the constant ``FLOOR`` instead — identical values on every
    batch whose finite lls stay above FLOOR = -1e27 (all healthy data;
    the dynamic bound only binds in rescue scenarios) and bit-identical
    gradients ALWAYS (both modes share the static active set), but the
    kernel drops the global-min/clip-count reductions
    (_sum_static_grad_kernel; measured step win in docs/ROOFLINE.md's
    follow-up A/B)."""
    _check_likelihood(likelihood, codes)
    theta, v, phi, x, eta, codes = _prep(theta, v, phi, x, eta, codes)
    if clip == "static":
        return _fused_sum_static(theta, v, phi, x, eta, codes,
                                 log_transform, interpret, likelihood)
    if clip != "reference":
        raise ValueError(f"unknown clip mode {clip!r}")
    ssum, cnt, gmin = _fused_stats(theta, v, phi, x, eta, codes,
                                   log_transform, interpret, likelihood)
    # the clip bound is a constant to the backward (module docstring); the
    # counts are piecewise constant — the scalar combine carries no gradient
    sg = jax.lax.stop_gradient
    m = _floor_min_val(sg(gmin) - 10.0)
    return ssum + sg(cnt).astype(jnp.float32) * m[0]


def fused_poisson_loglik_sharded(theta, v, phi, x, eta, mesh,
                                 log_transform=False, interpret=False,
                                 data_axis="dp", feature_axis="fp",
                                 likelihood="poisson", codes=None,
                                 clip="reference"):
    """Mesh-composed fused likelihood: ONE per-shard Pallas stats pass,
    then ``lax.pmin``/``lax.psum`` on the three scalar outputs and a scalar
    combine — the exact global-clip semantics of the single-device kernel,
    scaled over dp x fp (VERDICT r1 #2; reference data-dependent clip:
    poisson.py:606-619). With ``clip='static'`` (see
    ``fused_poisson_loglik``) the per-shard kernel emits only the sums and
    the combine is a single ``psum`` — one collective instead of three.

    Rows of theta/x shard over ``data_axis``; feature columns of
    v/phi/x/eta (and the mixed ``codes`` lane) over ``feature_axis``
    (either axis may be absent). The (S,) output is fully replicated.
    """
    from jax.sharding import PartitionSpec as P

    _check_likelihood(likelihood, codes)
    if clip not in ("reference", "static"):
        raise ValueError(f"unknown clip mode {clip!r}")
    theta, v, phi, x, eta, codes = _prep(theta, v, phi, x, eta, codes)
    dp = _row_axes(mesh, data_axis)
    fp = (feature_axis
          if feature_axis in mesh.axis_names and mesh.shape[feature_axis] > 1
          else None)
    axes = (dp or ()) + ((fp,) if fp is not None else ())
    if not axes:
        return fused_poisson_loglik(theta, v, phi, x, eta, log_transform,
                                    interpret, likelihood, codes, clip)

    def body(theta, v, phi, x, eta, codes):
        if clip == "static":
            ssum = _fused_sum_static(theta, v, phi, x, eta, codes,
                                     log_transform, interpret, likelihood)
            return jax.lax.psum(ssum, axes)
        ssum, cnt, gmin = _fused_stats(theta, v, phi, x, eta, codes,
                                       log_transform, interpret, likelihood)
        sg = jax.lax.stop_gradient
        gmin = jax.lax.pmin(sg(gmin), axes)
        cnt = jax.lax.psum(sg(cnt), axes)
        m = _floor_min_val(gmin - 10.0)
        # psum of the differentiable sums: the backward broadcasts the
        # replicated cotangent back to every shard's stats kernel
        return jax.lax.psum(ssum, axes) + cnt.astype(jnp.float32) * m[0]

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(None, dp, None),   # theta (S, B, K)
            P(None, None, fp),   # v     (S, K, D)
            P(None, None, fp),   # phi   (S, 1, D)
            P(dp, fp),           # x     (B, D)
            P(None, fp),         # eta   (1, D)
            P(None, fp),         # codes (1, D)
        ),
        out_specs=P(),
        check_vma=False,
    )(theta, v, phi, x, eta, codes)


# --------------------------------------------------------------------------
# Per-ROW log-likelihood sums (for WAIC): same decode+ll tile math, reduced
# over features only, no clipping (matching log_likelihood_components ->
# sum(axis=-1), reference poisson.py:156-184). Evaluation-only (no VJP):
# WAIC streams over posterior samples, it never differentiates.


def _row_ll_kernel(theta_ref, v_ref, phi_ref, x_ref, eta_ref, codes_ref,
                   out_ref, *, B, D, S, log_transform, likelihood):
    i = pl.program_id(0)
    j = pl.program_id(1)
    x = x_ref[:]
    eta = eta_ref[:]
    codes = codes_ref[:]
    lgx = _lgamma_xp1(x) if _needs_lgamma(likelihood) else 0.0
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (TB, TD), 1) + j * TD
    col_ok = col_ids < D  # out-of-bounds rows are sliced off outside

    @pl.when(j == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    for s in range(S):
        ll = _tile_ll(theta_ref, v_ref, phi_ref, x, eta, lgx, s,
                      log_transform, likelihood, codes)
        out_ref[s] = out_ref[s] + jnp.sum(
            jnp.where(col_ok, ll, 0.0), axis=-1
        )


def fused_poisson_row_loglik(theta, v, phi, x, eta, log_transform=False,
                             interpret=False, likelihood="poisson",
                             codes=None):
    """Per-row raw log-likelihood sums, shape (S, B) f32 — the WAIC
    pointwise unit — computed tile-by-tile without materializing (S,B,D).
    Keep S small (<= ~16): theta/v blocks carry the full sample dim in
    VMEM; stream larger posterior-sample counts in chunks (vi/waic.py)."""
    _check_likelihood(likelihood, codes)
    theta, v, phi, x, eta, codes = _prep(theta, v, phi, x, eta, codes)
    S, B, K = theta.shape
    D = x.shape[-1]
    grid = (pl.cdiv(B, TB), pl.cdiv(D, TD))  # cols inner: out stays resident
    out = pl.pallas_call(
        functools.partial(_row_ll_kernel, B=B, D=D, S=S,
                          log_transform=log_transform,
                          likelihood=likelihood),
        grid=grid,
        in_specs=_data_specs(S, K),
        out_specs=pl.BlockSpec((S, TB), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, grid[0] * TB), jnp.float32),
        interpret=interpret,
        cost_estimate=_cost(S, B, K, D),
    )(theta, v, phi, x, eta, codes)
    return out[:, :B]


def fused_poisson_row_loglik_sharded(theta, v, phi, x, eta, mesh,
                                     log_transform=False, interpret=False,
                                     data_axis="dp", feature_axis="fp",
                                     likelihood="poisson", codes=None):
    """Mesh-composed per-row log-likelihood sums, shape (S, B) f32
    (VERDICT r3 #2): each shard runs the streaming row kernel on its
    (B/dp, D/fp) tile, the per-row feature sums ``lax.psum`` over fp, and
    rows stay dp-local — meshed WAIC / held-out scoring never
    materializes (S, B, D), exactly like the single-device path. The
    output is dp-sharded over rows (replicated over fp). Evaluation-only
    (no VJP), matching ``fused_poisson_row_loglik``."""
    from jax.sharding import PartitionSpec as P

    _check_likelihood(likelihood, codes)
    theta, v, phi, x, eta, codes = _prep(theta, v, phi, x, eta, codes)
    dp = _row_axes(mesh, data_axis)
    fp = (feature_axis if feature_axis in mesh.axis_names
          and mesh.shape[feature_axis] > 1 else None)
    if dp is None and fp is None:
        return fused_poisson_row_loglik(theta, v, phi, x, eta, log_transform,
                                        interpret, likelihood, codes)

    def body(theta, v, phi, x, eta, codes):
        out = fused_poisson_row_loglik(theta, v, phi, x, eta, log_transform,
                                       interpret, likelihood, codes)
        if fp is not None:
            out = jax.lax.psum(out, fp)
        return out

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(None, dp, None),   # theta (S, B, K)
            P(None, None, fp),   # v     (S, K, D)
            P(None, None, fp),   # phi   (S, 1, D)
            P(dp, fp),           # x     (B, D)
            P(None, fp),         # eta   (1, D)
            P(None, fp),         # codes (1, D)
        ),
        out_specs=P(None, dp),
        check_vma=False,
    )(theta, v, phi, x, eta, codes)


# --------------------------------------------------------------------------
# Exp-rate total for the SPARSE energy with the log-transform decode link:
#     R_s = sum_ij exp((theta_s @ v_s) * eta)
# The sparse COO energy needs sum_ij rate without materializing (B, D); for
# the identity link it collapses in closed form, for the exp link this
# kernel reduces it tile-by-tile (and the custom VJP recomputes per tile —
# the same two-kernel structure as the likelihood backward).


def _expsum_grad_kernel(theta_ref, v_ref, eta_ref, out_ref,
                        dtheta_p_ref, dv_ref, *, B, D, S):
    """R_s partial sums PLUS the unit-cotangent gradients dR/dtheta and
    dR/dv in the same tile pass (the cotangent of R_s is a per-sample
    scalar, so the VJP backward is a rescale — same speculative-gradient
    structure as _stats_grad_kernel). Grid (cols, rows), rows inner:
    dv blocks resident; dtheta spilled as per-col-tile partials."""
    j = pl.program_id(0)
    i = pl.program_id(1)
    K = theta_ref.shape[-1]
    eta = eta_ref[:]
    in_bounds, row_ok, col_ok = _masks(i, j, B, D, K)

    @pl.when((i == 0) & (j == 0))
    def _init_sums():
        for s in range(S):
            out_ref[s] = jnp.float32(0.0)

    for s in range(S):
        theta_s = jnp.where(row_ok, theta_ref[s], 0.0)
        v_s = jnp.where(col_ok, v_ref[s], 0.0)
        tv = jnp.dot(theta_s, v_s, preferred_element_type=jnp.float32)
        ev = jnp.exp(tv * eta)
        out_ref[s] = out_ref[s] + jnp.sum(jnp.where(in_bounds, ev, 0.0))
        dtv = jnp.where(in_bounds, ev * eta, 0.0)
        dtheta_p_ref[0, s] = jnp.dot(dtv, v_s.T,
                                     preferred_element_type=jnp.float32)
        dv_s = jnp.dot(theta_s.T, dtv, preferred_element_type=jnp.float32)

        @pl.when(i == 0)
        def _init():
            dv_ref[s] = dv_s

        @pl.when(i != 0)
        def _accum():
            dv_ref[s] += dv_s


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_exp_rate_sum(theta, v, eta, interpret=False):
    """R_s = sum_ij exp((theta_s @ v_s) * eta), shape (S,), float32.

    theta (S,B,K), v (S,K,D), eta (1,D) or scalar. The forward emits the
    unit-cotangent gradients from the same tiles; the backward rescales."""
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
    nb, nd = pl.cdiv(B, TB), pl.cdiv(D, TD)
    out, dtheta_p, dv = pl.pallas_call(
        functools.partial(_expsum_grad_kernel, B=B, D=D, S=S),
        grid=(nd, nb),
        in_specs=[
            pl.BlockSpec((S, TB, K), lambda j, i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, K, TD), lambda j, i: (0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TD), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, S, TB, K), lambda j, i: (j, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, K, TD), lambda j, i: (0, 0, j),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((S,), jnp.float32),
            jax.ShapeDtypeStruct((nd, S, nb * TB, K), jnp.float32),
            jax.ShapeDtypeStruct((S, K, nd * TD), jnp.float32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * S * B * K * D,
            bytes_accessed=(nd * S * B * K + S * B * K + 2 * S * K * D) * 4,
            transcendentals=S * B * D,
        ),
    )(theta, v, eta)
    dtheta = jnp.sum(dtheta_p, axis=0)[:, :B, :]
    return out, (dtheta, dv[..., :D])


def _expsum_bwd(interpret, res, g):
    dtheta_u, dv_u = res
    g = jnp.asarray(g, jnp.float32)[:, None, None]
    return dtheta_u * g, dv_u * g, None


fused_exp_rate_sum.defvjp(_expsum_fwd, _expsum_bwd)
