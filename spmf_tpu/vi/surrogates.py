"""Trainable mean-field surrogate posteriors.

Rebuild of ``bayesianquilts.vi.advi`` (reference imports:
mederrata_spmf/poisson.py:19-20):

- ``build_trainable_normal_dist(loc, scale, ndims)``  -> TrainableNormal
- ``build_trainable_InverseGamma_dist(conc, scale, ndims)`` -> TrainableInverseGamma
- bijector wrapping ``self.bijectors['u'](dist)``      -> TransformedSurrogate
- the assembled ``tfd.JointDistributionNamed(surrogate_dict)`` -> SurrogatePosterior

Everything is a pure function of a parameter pytree: ``init()`` builds the
initial (unconstrained) parameters, ``sample_and_log_prob(params, key, shape)``
draws reparameterized samples together with their log-density (computed in
pre-bijector space for stability, then corrected by the forward
log-det-Jacobian).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from spmf_tpu import bijectors as tfb
from spmf_tpu import distributions as tfd

__all__ = [
    "TrainableNormal",
    "TrainableInverseGamma",
    "TransformedSurrogate",
    "SurrogatePosterior",
    "build_trainable_normal_dist",
    "build_trainable_InverseGamma_dist",
    "build_surrogate_posterior",
]

_softplus = tfb.Softplus()


def _np_softplus_inverse(y):
    """Init-time softplus^{-1} in numpy: keeps model construction off the
    XLA compiler (tiny eager ops are surprisingly expensive to compile)."""
    y = np.asarray(y, np.float64)
    return y + np.log(-np.expm1(-y))


def _sum_event(x, event_ndims):
    if event_ndims == 0:
        return x
    return jnp.sum(x, axis=tuple(range(-event_ndims, 0)))


class TrainableNormal:
    """Mean-field Normal with trainable loc and softplus-parameterized scale.

    Mirrors bayesianquilts ``build_trainable_normal_dist`` (call sites e.g.
    reference poisson.py:404-414: loc init -6, scale init 5e-4)."""

    def __init__(self, loc, scale, event_ndims=None, dtype=None):
        loc = np.asarray(loc)
        scale = np.asarray(scale)
        self.dtype = (
            jax.dtypes.canonicalize_dtype(loc.dtype) if dtype is None else jnp.dtype(dtype)
        )
        self.shape = np.broadcast_shapes(loc.shape, scale.shape)
        self.event_ndims = len(self.shape) if event_ndims is None else int(event_ndims)
        self._loc0 = np.broadcast_to(loc, self.shape)
        self._raw_scale0 = _np_softplus_inverse(np.broadcast_to(scale, self.shape))

    def init(self) -> Dict[str, jnp.ndarray]:
        return {
            "loc": jnp.asarray(self._loc0, self.dtype),
            "raw_scale": jnp.asarray(self._raw_scale0, self.dtype),
        }

    def dist(self, params):
        return tfd.Normal(params["loc"], _softplus.forward(params["raw_scale"]))

    def sample_and_log_prob(self, params, key, sample_shape=()):
        d = self.dist(params)
        x = d.sample(key, sample_shape)
        return x, _sum_event(d.log_prob(x), self.event_ndims)

    def log_prob(self, params, x):
        return _sum_event(self.dist(params).log_prob(x), self.event_ndims)

    def mean(self, params):
        return params["loc"]


class TrainableInverseGamma:
    """Trainable InverseGamma surrogate (softplus-parameterized concentration
    and scale). Used for horseshoe(+) auxiliary variables; gradients flow via
    JAX's implicit-reparameterized ``random.gamma``.

    Mirrors bayesianquilts ``build_trainable_InverseGamma_dist`` (call sites
    e.g. reference poisson.py:438-459)."""

    def __init__(self, concentration, scale, event_ndims=None, dtype=None):
        conc = np.asarray(concentration)
        scale = np.asarray(scale)
        self.dtype = (
            jax.dtypes.canonicalize_dtype(conc.dtype) if dtype is None else jnp.dtype(dtype)
        )
        self.shape = np.broadcast_shapes(conc.shape, scale.shape)
        self.event_ndims = len(self.shape) if event_ndims is None else int(event_ndims)
        self._raw_conc0 = _np_softplus_inverse(np.broadcast_to(conc, self.shape))
        self._raw_scale0 = _np_softplus_inverse(np.broadcast_to(scale, self.shape))

    def init(self) -> Dict[str, jnp.ndarray]:
        return {
            "raw_concentration": jnp.asarray(self._raw_conc0, self.dtype),
            "raw_scale": jnp.asarray(self._raw_scale0, self.dtype),
        }

    def dist(self, params):
        return tfd.InverseGamma(
            _softplus.forward(params["raw_concentration"]),
            _softplus.forward(params["raw_scale"]),
        )

    def sample_and_log_prob(self, params, key, sample_shape=()):
        d = self.dist(params)
        x = d.sample(key, sample_shape)
        return x, _sum_event(d.log_prob(x), self.event_ndims)

    def log_prob(self, params, x):
        return _sum_event(self.dist(params).log_prob(x), self.event_ndims)

    def mean(self, params):
        return self.dist(params).mean()


class TransformedSurrogate:
    """base surrogate pushed through a bijector: y = b(x).

    log q(y) = log q_base(x) - fldj(x), accumulated in base space
    (reference pattern: ``self.bijectors['u'](build_trainable_normal_dist(...))``,
    poisson.py:427-437).
    """

    def __init__(self, base, bijector):
        self.base = base
        self.bijector = bijector or tfb.Identity()

    @property
    def event_ndims(self):
        return self.base.event_ndims

    @property
    def shape(self):
        return self.base.shape

    def init(self):
        return self.base.init()

    def sample_and_log_prob(self, params, key, sample_shape=()):
        x, lp = self.base.sample_and_log_prob(params, key, sample_shape)
        fldj = _sum_event(self.bijector.forward_log_det_jacobian(x), self.base.event_ndims)
        return self.bijector.forward(x), lp - fldj

    def log_prob(self, params, y):
        x = self.bijector.inverse(y)
        fldj = _sum_event(self.bijector.forward_log_det_jacobian(x), self.base.event_ndims)
        return self.base.log_prob(params, x) - fldj

    def mean(self, params, key=None, num_samples=250):
        """Posterior-mean estimate of the *constrained* variable (sampled;
        softplus of a Normal has no closed-form mean)."""
        if key is None:
            key = jax.random.PRNGKey(42)
        y, _ = self.sample_and_log_prob(params, key, (num_samples,))
        return jnp.mean(y, axis=0)


class SurrogatePosterior:
    """Named mean-field surrogate: dict of independent TransformedSurrogates.

    Plays the role of the reference's surrogate
    ``tfd.JointDistributionNamed(surrogate_dict)`` (poisson.py:567-569).

    TPU/perf note: base samples are drawn with ONE flattened
    ``random.normal`` call for all Normal surrogates and ONE flattened
    ``random.gamma`` call for all InverseGamma surrogates, instead of
    per-variable calls. ``random.gamma`` lowers to a rejection-sampling
    while-loop that is very expensive for XLA to compile per shape
    (~15-25 s/shape on CPU), and batching also keeps the VPU busy with one
    large kernel rather than many slivers.
    """

    def __init__(self, surrogates: Dict[str, TransformedSurrogate],
                 gamma_sampler: str = "exact", broadcast_names=(),
                 mesh=None, feature_axes=None, feature_axis="fp"):
        #: 'exact' = jax.random.gamma (implicit reparam; slow backward on
        #: TPU) | 'fast' = boosted Wilson–Hilferty pathwise sampler
        #: (spmf_tpu.ops.gamma)
        self.gamma_sampler = gamma_sampler
        #: device mesh + per-variable feature-axis map: lets the fused IG
        #: sampler run per-shard under ``shard_map`` when the feature dim is
        #: sharded (see _sample_igs_fused_sharded). ``feature_axes[name]``
        #: is the axis of ``surrogates[name].shape`` carrying the feature
        #: dim (None = replicated).
        self.mesh = mesh
        self.feature_axes = dict(feature_axes or {})
        self.feature_axis = feature_axis
        #: test hook: alternative (a_flat, b_flat, seed, S[, antithetic])
        #: -> (y, logq) implementation (the pure-JAX
        #: ig_sample_logq_reference lets the sharded assembly run on the
        #: virtual CPU mesh; antithetic is passed as a kwarg only when True)
        self._ig_impl = None
        #: variables sampled ONCE per step and shared across the S ELBO
        #: samples (values broadcast; log q counted identically in every
        #: sample). Marginally each (main_i, aux_1) pair is a draw from the
        #: full mean-field q, so the ELBO estimate stays unbiased — the S
        #: terms are just correlated through the shared aux draw. Used for
        #: the horseshoe auxiliaries, whose per-sample pipeline otherwise
        #: dominates the training step (~60% at D=20k).
        self.broadcast_names = frozenset(broadcast_names)
        self.surrogates = dict(surrogates)
        self._normal_names = [
            n for n, s in self.surrogates.items() if isinstance(s.base, TrainableNormal)
        ]
        self._ig_names = [
            n
            for n, s in self.surrogates.items()
            if isinstance(s.base, TrainableInverseGamma)
        ]
        self._other_names = [
            n
            for n in self.surrogates
            if n not in self._normal_names and n not in self._ig_names
        ]
        self._sizes = {
            n: int(np.prod(self.surrogates[n].shape)) for n in self.surrogates
        }
        dtypes = {s.base.dtype for s in self.surrogates.values()}
        self.dtype = dtypes.pop() if len(dtypes) == 1 else None

    @property
    def names(self):
        return list(self.surrogates.keys())

    def init(self):
        return {k: s.init() for k, s in self.surrogates.items()}

    def _fused_normals_ok(self, names, sample_shape):
        """OFF by default: interleaved A/B at B=4096/D=20k measured the
        fused Normal kernel 4% SLOWER than XLA's sampling (37.3 vs 35.7
        ms/step) — XLA fuses the threefry+erfinv chain directly into the
        consumers, while the kernel adds an (S, total) HBM materialization.
        Kept as an opt-in (`surrogate.fused_normals = True`); correctness
        validated (KS 0.002, exact-eps grad check 0.8%)."""
        if self.gamma_sampler != "fused":
            return False
        if not getattr(self, "fused_normals", False):
            return False
        if len(sample_shape) > 1 or self.dtype != jnp.float32:
            return False
        if any(not isinstance(self.surrogates[n].bijector,
                              (tfb.Softplus, tfb.Identity))
               for n in names):
            return False
        return jax.default_backend() == "tpu"

    def _sample_normals_fused(self, names, params, key, sample_shape):
        """One Pallas kernel for all Normal surrogates: in-kernel RNG ->
        loc + softplus(raw_scale)*eps -> bijector -> logq partial sums
        (spmf_tpu.ops.fused_normal)."""
        from spmf_tpu.ops.fused_normal import fused_normal_sample_logq

        loc_flat = jnp.concatenate(
            [params[n]["loc"].reshape(-1) for n in names]
        )
        rs_flat = jnp.concatenate(
            [params[n]["raw_scale"].reshape(-1) for n in names]
        )
        mask_flat = jnp.concatenate([
            jnp.full(
                (self._sizes[n],),
                1.0 if isinstance(self.surrogates[n].bijector, tfb.Softplus)
                else 0.0,
                jnp.float32,
            )
            for n in names
        ])
        S = sample_shape[0] if sample_shape else 1
        seed = jax.random.randint(key, (), 0, 2**31 - 1, jnp.int32)
        y, logq = fused_normal_sample_logq(loc_flat, rs_flat, mask_flat,
                                           seed, S)
        values = {}
        off = 0
        for n in names:
            s = self.surrogates[n]
            sz = self._sizes[n]
            block = y[:, off:off + sz]
            off += sz
            values[n] = (
                block.reshape(sample_shape + s.shape)
                if sample_shape
                else block[0].reshape(s.shape)
            )
        return values, (logq if sample_shape else logq[0])

    def _sample_normals(self, names, params, key, sample_shape,
                        logq_params=None, antithetic=False):
        if (logq_params is None and not antithetic
                and self._fused_normals_ok(names, sample_shape)):
            return self._sample_normals_fused(names, params, key,
                                              sample_shape)
        values, logq = {}, 0.0
        total = sum(self._sizes[n] for n in names)
        if antithetic:
            # mirrored pairs: eps_{s+S/2} = -eps_s. Marginally still N(0,1)
            # per sample; the pair mean of loc-gradients cancels the odd
            # component of the integrand (variance reduction at no extra
            # draws). logq below is evaluated at the VALUES, so it is exact
            # for the mirrored half too. 'stratified' additionally couples
            # the pairs with a randomly-shifted lattice of base uniforms
            # (ops.gamma.lattice_uniform): each eps_p = ndtri(frac(u0+p/H))
            # keeps the exact N(0,1) marginal while the H pairs stratify
            # the 1-d integral each coordinate's gradient depends on.
            S = sample_shape[0]
            if len(sample_shape) != 1 or S % 2:
                raise ValueError("antithetic sampling needs a 1-d even "
                                 f"sample shape, got {sample_shape}")
            if antithetic == "stratified":
                from jax.scipy.special import ndtri

                from spmf_tpu.ops.gamma import lattice_uniform

                eps_h = ndtri(
                    lattice_uniform(key, S // 2, (total,), self.dtype))
            else:
                eps_h = jax.random.normal(key, (S // 2, total), self.dtype)
            eps = jnp.concatenate([eps_h, -eps_h], axis=0)
        else:
            eps = jax.random.normal(key, sample_shape + (total,), self.dtype)
        # eps-form logq (r5): at the reparameterized sample x = loc+scale*eps
        # the mean-field normal density is EXACTLY
        #   log q(x) = -0.5*eps^2 - log(scale) - 0.5*log(2*pi)
        # per coordinate — including its gradients wrt (loc, raw_scale): the
        # direct dependence and the dependence through x cancel analytically
        # for the quadratic term. One fused reduction over the flat eps
        # replaces a per-variable log_prob pass over every (S, size) block,
        # and the backward shrinks from O(S*total) to O(total) (the eps^2
        # term is constant wrt params). Interleaved TPU A/B on the
        # autoencoder step (D=2000, B=1024, S=8): 28.75 vs 32.79 ms/step
        # for the per-variable route — 1.14x end-to-end, identical math
        # (docs/autoencoder_sampler_ab.json; equivalence pinned at 1e-10
        # in tests/test_antithetic.py::test_eps_form_logq_matches_*).
        # Requires the density params to be the live sample params (not
        # STL) and fully summed events; bijector corrections stay
        # per-variable.
        eps_logq = logq_params is None and all(
            self.surrogates[n].event_ndims == len(self.surrogates[n].shape)
            for n in names
        )
        scale_logsum = 0.0
        off = 0
        for n in names:
            s = self.surrogates[n]
            p = params[n]
            sz = self._sizes[n]
            e = eps[..., off : off + sz].reshape(sample_shape + s.shape)
            off += sz
            loc = p["loc"]
            scale = _softplus.forward(p["raw_scale"])
            x = loc + scale * e
            if eps_logq:
                scale_logsum = scale_logsum + jnp.sum(jnp.log(scale))
                if not isinstance(s.bijector, tfb.Identity):
                    logq = logq - _sum_event(
                        s.bijector.forward_log_det_jacobian(x), s.event_ndims
                    )
                values[n] = s.bijector.forward(x)
                continue
            # STL (logq_params): density parameters come from the stopped
            # pytree while the sample path stays live — evaluated HERE in
            # pre-bijector space (a constrained-space inverse would clamp
            # softplus-floored samples and blow up their y-gradients)
            pq = p if logq_params is None else logq_params[n]
            loc_q = pq["loc"]
            scale_q = _softplus.forward(pq["raw_scale"])
            lp = _sum_event(
                tfd.Normal(loc_q, scale_q).log_prob(x), s.event_ndims
            ) - _sum_event(
                s.bijector.forward_log_det_jacobian(x), s.event_ndims
            )
            values[n] = s.bijector.forward(x)
            logq = logq + lp
        if eps_logq:
            logq = logq + (
                -0.5 * jnp.sum(eps * eps, axis=-1)
                - scale_logsum
                - 0.5 * total * np.log(2.0 * np.pi)
            )
        return values, logq

    def _fp_size(self):
        if self.mesh is None or self.feature_axis not in self.mesh.axis_names:
            return 1
        return int(self.mesh.shape[self.feature_axis])

    def _fused_igs_common_ok(self, names, sample_shape):
        if self.gamma_sampler != "fused":
            return False
        if len(sample_shape) > 1 or self.dtype != jnp.float32:
            return False
        if any(not isinstance(self.surrogates[n].bijector, tfb.Softplus)
               for n in names):
            return False
        return self._ig_impl is not None or jax.default_backend() == "tpu"

    def _fused_igs_ok(self, names, sample_shape):
        """The fused Pallas IG sampler handles the standard case: softplus
        bijectors, f32, a 0/1-dim sample shape, and a TPU backend (the
        kernel's hardware RNG has no CPU/interpret lowering). With a
        feature-sharded mesh the flat concat would all-gather fp shards —
        that case goes through _sample_igs_fused_sharded instead."""
        return (self._fp_size() == 1
                and self._fused_igs_common_ok(names, sample_shape))

    def _fused_igs_sharded_ok(self, names, sample_shape):
        """Mesh-composed variant: every feature-sharded variable's feature
        dim must split evenly over the fp axis (replicated variables are
        fine — they take the plain kernel, which runs replicated)."""
        if self._fp_size() <= 1:
            return False
        if not self._fused_igs_common_ok(names, sample_shape):
            return False
        nsh = self._fp_size()
        for n in names:
            ax = self.feature_axes.get(n)
            if ax is None:
                continue
            dim = self.surrogates[n].shape[ax]
            if dim > 1 and dim % nsh:
                return False
        return True

    def _ig_kernel(self, a_flat, b_flat, seed, S, antithetic=False):
        if self._ig_impl is not None:
            if antithetic:
                return self._ig_impl(a_flat, b_flat, seed, S,
                                     antithetic=antithetic)
            return self._ig_impl(a_flat, b_flat, seed, S)
        from spmf_tpu.ops.fused_ig import fused_ig_sample_logq

        return fused_ig_sample_logq(a_flat, b_flat, seed, S, antithetic)

    def _sample_igs_fused_sharded(self, names, params, key, sample_shape,
                                  antithetic=False):
        """Fused IG sampling composed with a feature-sharded mesh: the
        kernel runs per-shard inside ``jax.shard_map`` on the locally-owned
        slices of the fp-sharded variables (per-shard seeds via
        ``axis_index``), with a ``psum`` of the per-sample logq partials;
        replicated variables go through the plain kernel outside
        (VERDICT r1 weak #1 follow-through / docs/ROADMAP.md item 5)."""
        from jax.sharding import PartitionSpec as P

        fp = self.feature_axis
        nsh = self._fp_size()
        S = sample_shape[0] if sample_shape else 1

        sharded = [
            n for n in names
            if self.feature_axes.get(n) is not None
            and self.surrogates[n].shape[self.feature_axes[n]] > 1
        ]
        repl = [n for n in names if n not in sharded]

        values, logq = {}, 0.0
        if repl:
            v, lq = self._sample_igs_fused(repl, params, key, sample_shape,
                                           antithetic=antithetic)
            values.update(v)
            logq = logq + lq
        if not sharded:
            return values, logq

        seed = jax.random.randint(jax.random.fold_in(key, 1), (), 0,
                                  2**31 - 1, jnp.int32)
        local_shapes, in_specs, out_specs, args = [], [P()], [], [seed]
        for n in sharded:
            ax = self.feature_axes[n]
            shape = self.surrogates[n].shape
            local_shapes.append(tuple(
                d // nsh if i == ax else d for i, d in enumerate(shape)
            ))
            spec = P(*[fp if i == ax else None for i in range(len(shape))])
            in_specs += [spec, spec]
            out_specs.append(P(*((None,) + tuple(spec))))
            args += [
                _softplus.forward(params[n]["raw_concentration"]),
                _softplus.forward(params[n]["raw_scale"]),
            ]
        out_specs.append(P())

        kernel = self._ig_kernel

        def body(seed, *ab):
            sd = seed + jax.lax.axis_index(fp).astype(jnp.int32)
            a_flat = jnp.concatenate([a.reshape(-1) for a in ab[0::2]])
            b_flat = jnp.concatenate([b.reshape(-1) for b in ab[1::2]])
            y, lq = kernel(a_flat, b_flat, sd, S, antithetic=antithetic)
            outs, off = [], 0
            for ls in local_shapes:
                sz = int(np.prod(ls))
                outs.append(y[:, off:off + sz].reshape((S,) + ls))
                off += sz
            return tuple(outs) + (jax.lax.psum(lq, fp),)

        out = jax.shard_map(body, mesh=self.mesh, in_specs=tuple(in_specs),
                            out_specs=tuple(out_specs),
                            check_vma=False)(*args)
        lq = out[-1]
        for n, block in zip(sharded, out[:-1]):
            values[n] = block if sample_shape else block[0]
        return values, logq + (lq if sample_shape else lq[0])

    def _sample_igs_fused(self, names, params, key, sample_shape,
                          antithetic=False):
        """One Pallas kernel for the whole IG block: in-kernel RNG ->
        boosted-WH gamma -> IG transform -> softplus bijector -> logq
        partial sums (spmf_tpu.ops.fused_ig; VERDICT r1 #1)."""
        a_flat = jnp.concatenate([
            _softplus.forward(params[n]["raw_concentration"]).reshape(-1)
            for n in names
        ])
        b_flat = jnp.concatenate([
            _softplus.forward(params[n]["raw_scale"]).reshape(-1)
            for n in names
        ])
        S = sample_shape[0] if sample_shape else 1
        seed = jax.random.randint(key, (), 0, 2**31 - 1, jnp.int32)
        y, logq = self._ig_kernel(a_flat, b_flat, seed, S,
                                  antithetic=antithetic)
        values = {}
        off = 0
        for n in names:
            s = self.surrogates[n]
            sz = self._sizes[n]
            block = y[:, off:off + sz]
            off += sz
            values[n] = (
                block.reshape(sample_shape + s.shape)
                if sample_shape
                else block[0].reshape(s.shape)
            )
        return values, (logq if sample_shape else logq[0])

    def _sample_igs(self, names, params, key, sample_shape,
                    logq_params=None, antithetic=False):
        from spmf_tpu.ops.gamma import sample_gamma

        if logq_params is None:
            # the fused kernels support antithetic natively (mirrored
            # in-kernel uniforms, replayed identically by the VJP)
            if self._fused_igs_sharded_ok(names, sample_shape):
                return self._sample_igs_fused_sharded(
                    names, params, key, sample_shape, antithetic=antithetic)
            if self._fused_igs_ok(names, sample_shape):
                return self._sample_igs_fused(
                    names, params, key, sample_shape, antithetic=antithetic)

        values, logq = {}, 0.0
        concs = [
            _softplus.forward(params[n]["raw_concentration"]).reshape(-1)
            for n in names
        ]
        conc_flat = jnp.concatenate(concs)
        conc_b = jnp.broadcast_to(conc_flat, sample_shape + conc_flat.shape)
        # 'fused' degrades to the same WH sampler when the kernel can't run
        # (CPU, f64, non-softplus bijectors, multi-dim sample shapes)
        method = "fast" if self.gamma_sampler == "fused" else self.gamma_sampler
        g = sample_gamma(key, conc_b.astype(self.dtype), method,
                         antithetic=antithetic)
        off = 0
        for n in names:
            s = self.surrogates[n]
            sz = self._sizes[n]
            a = _softplus.forward(params[n]["raw_concentration"])
            b = _softplus.forward(params[n]["raw_scale"])
            gs = g[..., off : off + sz].reshape(sample_shape + s.shape)
            off += sz
            x = b / gs
            if logq_params is None:
                a_q, b_q = a, b
            else:  # STL: density at the stopped parameters (pre-bijector)
                a_q = _softplus.forward(
                    logq_params[n]["raw_concentration"])
                b_q = _softplus.forward(logq_params[n]["raw_scale"])
            lp = _sum_event(
                tfd.InverseGamma(a_q, b_q).log_prob(x), s.event_ndims
            ) - _sum_event(
                s.bijector.forward_log_det_jacobian(x), s.event_ndims
            )
            values[n] = s.bijector.forward(x)
            logq = logq + lp
        return values, logq

    def sample_and_log_prob(self, params, key, sample_shape=(),
                            apply_broadcast=True, logq_params=None,
                            antithetic=False):
        """Joint sample + log q. ``logq_params``: optional second pytree
        the DENSITY is evaluated with (same structure), while the sample
        path uses ``params`` — the STL estimator passes stop_gradient'd
        params here (vi/minibatch elbo_estimator='stl'); densities stay in
        pre-bijector space (no constrained-space inverse). Forces the XLA
        samplers (the fused kernels compute logq in-kernel at the live
        params). ``antithetic``: mirror base draws across the (1-d, even)
        sample axis — each sample keeps its marginal law, pairs are
        negatively coupled (variance reduction; fit(antithetic=True)).
        Requires a pathwise gamma sampler; the fused IG kernel mirrors its
        in-kernel uniforms natively (the fused-Normal opt-in kernel does
        not and is bypassed)."""
        sample_shape = tuple(sample_shape)
        if antithetic and (len(sample_shape) != 1 or sample_shape[0] % 2):
            raise ValueError("antithetic sampling needs a 1-d even sample "
                             f"shape, got {sample_shape}")
        kn, kg, ko, kbn, kbg = jax.random.split(key, 5)
        values, logq = {}, 0.0
        bset = self.broadcast_names if (apply_broadcast and sample_shape) else frozenset()

        reg_normals = [n for n in self._normal_names if n not in bset]
        bc_normals = [n for n in self._normal_names if n in bset]
        reg_igs = [n for n in self._ig_names if n not in bset]
        bc_igs = [n for n in self._ig_names if n in bset]

        for names, key_i, shape, fn, anti in (
            (reg_normals, kn, sample_shape, self._sample_normals, antithetic),
            (bc_normals, kbn, (), self._sample_normals, False),
            (reg_igs, kg, sample_shape, self._sample_igs, antithetic),
            (bc_igs, kbg, (), self._sample_igs, False),
        ):
            if names:
                v, lp = fn(names, params, key_i, shape,
                           logq_params=logq_params, antithetic=anti)
                values.update(v)
                logq = logq + lp

        if self._other_names:
            keys = jax.random.split(ko, len(self._other_names))
            for k, n in zip(keys, self._other_names):
                values[n], lp = self.surrogates[n].sample_and_log_prob(
                    params[n], k, sample_shape
                )
                if logq_params is not None:
                    # constrained-space fallback for unclassified
                    # surrogates (none in the shipped models)
                    lp = self.surrogates[n].log_prob(
                        logq_params[n], values[n]
                    )
                logq = logq + lp

        return values, jnp.broadcast_to(logq, sample_shape)

    def sample(self, params, key, sample_shape=()):
        return self.sample_and_log_prob(params, key, sample_shape)[0]

    def log_prob(self, params, values):
        logq = 0.0
        for name, s in self.surrogates.items():
            logq = logq + s.log_prob(params[name], values[name])
        return logq

    def mean(self, params, key=None, num_samples=250, chunk=10):
        """Calibrated expectations (reference
        ``set_calibration_expectations()``, poisson.py:573).

        Sampled in chunks under ``lax.scan``: ``random.gamma``'s rejection
        sampler allocates ~10 internal buffers per element, so one-shot
        sampling of num_samples x all-IG-params OOMs HBM for wide models
        (D=20k blew 29 GB at 250 samples)."""
        if key is None:
            key = jax.random.PRNGKey(42)
        chunk = min(chunk, num_samples)
        n_chunks = max(num_samples // chunk, 1)

        def body(carry, i):
            k = jax.random.fold_in(key, i)
            # broadcast disabled: calibration means need independent draws
            values, _ = self.sample_and_log_prob(
                params, k, (chunk,), apply_broadcast=False
            )
            carry = {
                n: carry[n] + jnp.mean(v, axis=0) / n_chunks
                for n, v in values.items()
            }
            return carry, None

        init = {
            n: jnp.zeros(s.shape, s.base.dtype) for n, s in self.surrogates.items()
        }
        out, _ = jax.lax.scan(body, init, jnp.arange(n_chunks))
        return out


def build_trainable_normal_dist(loc, scale, ndims=None, dtype=None, strategy=None):
    """API-parity helper (bayesianquilts.vi.advi.build_trainable_normal_dist).
    ``strategy`` accepted and ignored — sharding is orthogonal in spmf_tpu."""
    del strategy
    return TrainableNormal(loc, scale, event_ndims=ndims, dtype=dtype)


def build_trainable_InverseGamma_dist(concentration, scale, ndims=None, dtype=None, strategy=None):
    del strategy
    return TrainableInverseGamma(concentration, scale, event_ndims=ndims, dtype=dtype)


def build_surrogate_posterior(joint_prior, bijectors, dtype=None, strategy=None,
                              init_loc=None, init_scale=None):
    """Auto-build a mean-field surrogate for an arbitrary named joint prior
    (bayesianquilts.vi.advi.build_surrogate_posterior; reference call site:
    poisson.py:778-781 for the PoissonAutoencoder).

    Strategy: for each variable, a TrainableNormal in unconstrained space,
    initialized near zero with small scale, pushed through the model
    bijector. ``init_loc`` / ``init_scale`` are optional per-name override
    dicts (scalar or array) — e.g. the PoissonAutoencoder passes
    scaling.md-derived per-layer scales instead of the generic 1e-3.
    """
    del strategy
    init_loc = init_loc or {}
    init_scale = init_scale or {}
    # Draw a deterministic structure sample to get shapes
    probe = joint_prior.sample(jax.random.PRNGKey(0))
    surrogates = {}
    for name, val in probe.items():
        b = bijectors.get(name, tfb.Identity()) if isinstance(bijectors, dict) else tfb.Identity()
        loc = jnp.full(jnp.shape(val), -3.0, dtype or val.dtype)
        if isinstance(b, tfb.Identity):
            loc = jnp.zeros(jnp.shape(val), dtype or val.dtype)
        if name in init_loc:
            loc = jnp.broadcast_to(
                jnp.asarray(init_loc[name], loc.dtype), jnp.shape(val)
            )
        scale = jnp.broadcast_to(
            jnp.asarray(init_scale.get(name, 1e-3), dtype or val.dtype),
            jnp.shape(val),
        )
        surrogates[name] = TransformedSurrogate(
            TrainableNormal(loc, scale, event_ndims=len(jnp.shape(val))), b
        )
    return SurrogatePosterior(surrogates)
