"""Sparse (horseshoe+) Poisson matrix factorization — TPU-native rebuild.

Reference: mederrata_spmf/poisson.py:25-717. Generative model for count rows
x_i in N^D with latent dim K:

    encoder   theta_i = g(x_i) @ A,  A = w1 * u   (w = s / colsum(s), w1 = w[0])
    decoder   rate    = f(theta @ v) + phi,  phi = eta_i * w2 * w_intercept
    x_ij ~ Poisson(rate_ij)

with a horseshoe+ prior on the *encoding* loadings u and the split weights s
(Makalic–Schmidt SqrtInverseGamma decomposition of the half-Cauchy scales,
reference poisson.py:303-341).

TPU notes: the energy is a pure function of (batch, samples); the hot ops are
the (S,B,D)x(D,K) encode einsum, the (S,B,K)x(S,K,D) decode einsum and the
fused Poisson log-prob + finite-mask + clip + row/feature reduction (see
spmf_tpu.ops for the Pallas path). All shapes static under jit.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from spmf_tpu import bijectors as tfb
from spmf_tpu import distributions as tfd
from spmf_tpu.config import canonical_dtype
from spmf_tpu.data import as_data_factory
from spmf_tpu.models.base import BayesianModel
from spmf_tpu.vi.surrogates import (
    SurrogatePosterior,
    TrainableInverseGamma,
    TrainableNormal,
    TransformedSurrogate,
)

__all__ = ["PoissonFactorization"]


def _def_depth(mro, name):
    """MRO index of the class that defines ``name`` (len(mro) if none):
    the 'vouching' rule shared by the fused-kernel and COO-energy
    eligibility checks — a method defined in a MORE derived class than the
    dispatcher invalidates the dispatcher's baked-in assumptions."""
    for i, c in enumerate(mro):
        if name in c.__dict__:
            return i
    return len(mro)


class PoissonFactorization(BayesianModel):
    """Sparse (horseshoe) Poisson matrix factorization
    (reference: mederrata_spmf/poisson.py:25)."""

    s_tau_scale = 1.0

    def _fused_kind(self):
        """Which fused-kernel likelihood (spmf_tpu.ops.fused_poisson
        ``likelihood`` flag) this model's observation distribution
        corresponds to, or None. A class overriding
        ``_observation_distribution`` MUST also override this (the pairing
        is enforced structurally in _can_fuse via the defining classes)."""
        return "poisson"

    def _fused_codes(self):
        """Per-column type-code lane for the ('mixed', s) kernel
        likelihood, or None for single-family models
        (MixedFactorization overrides)."""
        return None

    def encoder_function(self, x):
        """g(x) (reference poisson.py:34-43)."""
        x = jnp.asarray(x, self.dtype)
        if self.log_transform:
            return jnp.log(x / self.eta_i + 1.0)
        return x / jnp.asarray(self.eta_i, self.dtype)

    def decoder_function(self, x):
        """f(x) = g^{-1}(x) (reference poisson.py:45-54)."""
        x = jnp.asarray(x, self.dtype)
        if self.log_transform:
            return jnp.exp(x * self.eta_i) - 1.0
        return x * jnp.asarray(self.eta_i, self.dtype)

    def __init__(
        self,
        latent_dim=None,
        feature_dim=None,
        u_tau_scale=0.01,
        s_tau_scale=1.0,
        symmetry_breaking_decay=0.99,
        strategy=None,
        mesh=None,
        encoder_function=None,
        decoder_function=None,
        scale_columns=True,
        scale_rows=True,
        log_transform=False,
        horshoe_plus=True,
        horseshoe_plus=None,
        column_norms=None,
        count_key="counts",
        initialize_distributions=True,
        dtype=None,
        data=None,
        fused_likelihood=None,
        gamma_sampler=None,
        aux_broadcast=False,
        sparse_dense_scatter=None,
        likelihood_clip="reference",
        **kwargs,
    ):
        """Mirrors the reference constructor signature (poisson.py:56-64),
        including the ``horshoe_plus`` spelling (with a corrected alias).
        ``strategy`` is accepted for parity; use ``mesh`` for TPU sharding."""
        super().__init__(data=None, data_transform_fn=None, strategy=strategy,
                         mesh=mesh, dtype=dtype)

        self.scale_rows = scale_rows
        self.scale_columns = scale_columns
        self.horseshoe_plus = horshoe_plus if horseshoe_plus is None else horseshoe_plus
        self.eta_i = jnp.ones((), self.dtype)
        self.xi_u_global = jnp.ones((), self.dtype)
        self._column_norms_given = column_norms is not None
        if column_norms is not None:
            self.eta_i = jnp.asarray(column_norms, self.dtype)
        self.count_key = count_key

        if encoder_function is not None:
            self.encoder_function = encoder_function
        if decoder_function is not None:
            self.decoder_function = decoder_function
        self.symmetry_breaking_decay = symmetry_breaking_decay
        self.log_transform = log_transform

        self.feature_dim = feature_dim
        self.latent_dim = self.feature_dim if latent_dim is None else latent_dim

        self.u_tau_scale = u_tau_scale
        self.s_tau_scale = s_tau_scale
        if fused_likelihood is None:
            # Pallas fused decode+likelihood wins ~3x on TPU (bench r1:
            # 39,954 vs 13,625 rows/sec); CPU keeps the XLA path (exact
            # autodiff, no interpret-mode overhead)
            import jax as _jax

            fused_likelihood = _jax.default_backend() == "tpu"
        self.fused_likelihood = fused_likelihood
        if gamma_sampler is None:
            # 'fused': one Pallas kernel with in-kernel RNG for the whole
            # horseshoe-auxiliary block (ops/fused_ig.py). Composes with
            # meshes: replicated params (dp-only) run the kernel replicated;
            # fp-sharded params run it per-shard under shard_map
            # (SurrogatePosterior._sample_igs_fused_sharded). Elsewhere the
            # WH 'fast' sampler (same math, threefry RNG).
            import jax as _jax

            gamma_sampler = (
                "fused"
                if _jax.default_backend() == "tpu"
                and self.dtype == jnp.float32
                else "fast"
            )
        self.gamma_sampler = gamma_sampler
        #: share one horseshoe-auxiliary draw across the S ELBO samples.
        #: Validated on the parity config (docs/aux_broadcast_parity.json):
        #: unbiased, converges to the same ELBO (40.4994 vs 40.4964) — but
        #: S-fold (~8x) aux-gradient variance, costing ~1.5x more epochs.
        #: The step-time win shrank as the rest of the step got faster:
        #: ~2x at the r2 kernels' debut, re-measured at +13% (32.6 vs 28.7
        #: ms/step, B=8192/D=20k interleaved) on the final grad-fused
        #: kernels — with the epoch cost, it no longer pays; kept for API
        #: compatibility and small-batch regimes.
        self.aux_broadcast = aux_broadcast
        #: COO batches: None/'auto' = densify on device and use the fused
        #: MXU path when fusion is active (TPU default; see the scatter
        #: note in unormalized_log_prob_parts), True/False force.
        self.sparse_dense_scatter = sparse_dense_scatter
        #: fused-kernel clip mode: 'reference' reproduces the reference's
        #: data-dependent log-likelihood clip bound; 'static' clips at the
        #: kernel's constant FLOOR instead — identical losses on all
        #: healthy data (the dynamic bound only binds in rescue scenarios,
        #: docs/PARITY.md) and bit-identical gradients always, but the
        #: kernel drops the global-min/clip-count tile reductions
        #: (ops/fused_poisson._sum_static_grad_kernel; measured TPU step
        #: win in docs/clip_mode_ab.json). Only consulted on the fused
        #: path; the XLA fallback keeps reference semantics.
        if likelihood_clip not in ("reference", "static"):
            raise ValueError(
                f"likelihood_clip must be 'reference' or 'static', got "
                f"{likelihood_clip!r}")
        self.likelihood_clip = likelihood_clip
        self._fused_interpret = False  # True: run the Pallas kernel interpreted (CPU)
        self.fusion_inactive_reason = None
        self._fusion_warned = False

        if data is not None:
            self.set_data(data)
        if initialize_distributions:
            self.create_distributions()
        print(f"Feature dim: {self.feature_dim} -> Latent dim {self.latent_dim}")

    # ------------------------------------------------------------------ data
    def _counts(self, data):
        """Fetch the count matrix from a batch dict, tolerating both the
        current 'counts' and legacy 'data' keys (reference staleness noted in
        SURVEY.md §2.6: factorize_csv.py:195 vs :83-87)."""
        if isinstance(data, dict):
            if self.count_key in data:
                return data[self.count_key]
            for k in ("counts", "data"):
                if k in data:
                    return data[k]
            raise KeyError(f"No count key in batch: {list(data)}")
        return data

    def _next_batch(self):
        """Pull the next batch from the bound dataset when the energy is
        called without data (reference gaussian.py:616-622 dataset_cycler)."""
        if self.data is None:
            raise ValueError("No data bound and none passed to the energy")
        it = getattr(self, "_dataset_cycler", None)
        if it is None:
            from itertools import cycle

            self._dataset_cycler = it = cycle(self.data())
        return next(it)

    def compute_scales(self, data_factory=None, compute_normalization=True, n=None):
        """One full pass for column stats -> eta_i, xi_u_global
        (reference poisson.py:113-154).

        ``compute_normalization=False`` (explicit column_norms given) keeps
        the user's eta_i but, when ``scale_rows`` is on, STILL computes
        xi_u_global: the reference leaves it at 1.0 in that case, so encode's
        row scaling multiplies by raw row sums (hundreds for scRNA data) and
        the exp decoder overflows — a latent reference bug that float64
        merely hides."""
        factory = as_data_factory(data_factory) or self.data
        need_eta = self.scale_columns and compute_normalization
        need_xi = self.scale_columns and self.scale_rows and bool(
            np.all(np.asarray(self.xi_u_global) == 1.0)
        )
        if not (need_eta or need_xi):
            return
        compute_normalization = need_eta
        print("Looping through the entire dataset once to get some stats")
        src = getattr(factory, "source", None)
        if hasattr(src, "col_stats"):
            # CSR fast path (SparseCounts): one streaming pass over the
            # nonzeros, no slab densification
            colsums, col_nonzero = src.col_stats()
        else:
            colsums = None
            col_nonzero = None
            for batch in factory():
                x = np.asarray(self._counts(batch), np.float64)
                colsums = x.sum(0, keepdims=True) + (0 if colsums is None else colsums)
                nz = (x > 0).sum(0, keepdims=True)
                col_nonzero = nz + (0 if col_nonzero is None else col_nonzero)
        with np.errstate(divide="ignore", invalid="ignore"):
            colmeans_nonzero = colsums / col_nonzero
        rowmean_nonzero = np.nansum(colmeans_nonzero)
        if compute_normalization:
            self.eta_i = jnp.asarray(
                np.where(colmeans_nonzero > 1, colmeans_nonzero, 1.0), self.dtype
            )
        if self.scale_rows:
            self.xi_u_global = jnp.asarray(rowmean_nonzero, self.dtype)
        else:
            self.xi_u_global = jnp.ones((), self.dtype)

    def set_data(self, data, data_transform_fn=None, n=None,
                 compute_normalization=None):
        super().set_data(data, data_transform_fn)
        if compute_normalization is None:
            # skip the stats pass when explicit column_norms were provided
            compute_normalization = not self._column_norms_given
        self.compute_scales(self.data, compute_normalization=compute_normalization)

    # ----------------------------------------------------------- model parts
    def encoding_matrix(self, u=None, s=None):
        """A = w1 * u (reference poisson.py:652-666)."""
        u = self.calibrated_expectations["u"] if u is None else u
        s = self.calibrated_expectations["s"] if s is None else s
        weights = s / jnp.sum(s, axis=-2, keepdims=True)
        weights_1 = weights[..., 0, :, None]  # (..., D, 1)
        return weights_1 * u  # (..., D, K)

    def decoding_matrix(self, v=None):
        """B = v (reference poisson.py:668-678)."""
        return self.calibrated_expectations["v"] if v is None else v

    def intercept_matrix(self, w=None, s=None):
        """phi = eta_i * w2 * w, shape (..., 1, D)
        (reference poisson.py:680-701)."""
        w = self.calibrated_expectations["w"] if w is None else w
        s = self.calibrated_expectations["s"] if s is None else s
        weights = s / jnp.sum(s, axis=-2, keepdims=True)
        weights_2 = weights[..., 1:2, :]  # (..., 1, D)
        return jnp.asarray(self.eta_i, self.dtype) * weights_2 * w

    def encode(self, x, u=None, s=None):
        """theta = g(x) @ A, optional row scaling (reference poisson.py:623-650)."""
        u = self.calibrated_expectations["u"] if u is None else u
        s = self.calibrated_expectations["s"] if s is None else s
        x = jnp.asarray(x, self.dtype)
        encoding = self.encoding_matrix(u, s)
        z = jnp.matmul(self.encoder_function(x), encoding)
        if self.scale_rows:
            xi_u = jnp.sum(x, axis=-1, keepdims=True) / self.xi_u_global
            z = z * xi_u
        return z

    def encode_batched(self, x, u=None, s=None, row_chunk: int = 8192):
        """``encode`` streamed over row chunks, collecting on host.

        ``encode(X)`` materializes the whole matrix on device — at scRNA
        export scale (100k x 50k f32 = 20 GB) that overflows a v5e chip's
        16 GB HBM. This helper slices ``row_chunk`` rows at a time
        (remainder padded to the chunk shape so every dispatched op reuses
        one compiled shape) and returns a host ``np.ndarray``. Dispatches
        through ``self.encode`` so subclass overrides (Bernoulli's
        no-row-scaling encode) are honored. Exact same math as ``encode``."""
        x = np.asarray(x)
        if x.ndim != 2 or x.shape[0] <= row_chunk:
            return np.asarray(self.encode(x, u, s))
        # resolve the calibrated expectations ONCE: self.encode would
        # otherwise re-resolve u/s and rebuild the encoding matrix per
        # chunk, each an eager dispatch through the slow remote tunnel
        # (r3 advisor note — 13 redundant rebuilds at 100k rows / 8192)
        u = self.calibrated_expectations["u"] if u is None else u
        s = self.calibrated_expectations["s"] if s is None else s
        # ONE compiled executable for every chunk (the padding fixes the
        # shape): per-chunk eager encode would rebuild the encoding matrix
        # and pay several tunnel dispatches each time. Dispatches through
        # self.encode inside the trace, so subclass overrides are honored.
        enc = jax.jit(lambda c: self.encode(c, u, s))
        n = x.shape[0]
        out = []
        for lo in range(0, n, row_chunk):
            chunk = x[lo:lo + row_chunk]
            pad = row_chunk - chunk.shape[0]
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad, x.shape[1]), chunk.dtype)], axis=0)
            z = np.asarray(enc(chunk))
            out.append(z[:row_chunk - pad] if pad else z)
        return np.concatenate(out, axis=0)

    def _observation_distribution(self, rate):
        """Decoder likelihood family hook — Poisson here; Bernoulli/Normal/
        mixed decoders override (reference poisson.py:178, bernoulli.py:148)."""
        return tfd.Poisson(rate=rate)

    def _theta_prior_log_prob(self, theta):
        """Prior on the encoded representation ('z' energy part) — HalfNormal(1)
        here (reference poisson.py:597-604); Gaussian model uses Normal(0,1)."""
        rv = tfd.Independent(tfd.HalfNormal(scale=jnp.ones_like(theta)), 2)
        return rv.log_prob(theta)

    def encode_sparse(self, sparse_counts, u=None, s=None):
        """Encode a CSR/COO SparseCounts dataset without densifying
        (spmf_tpu.ops.sparse_encode; g(0)=0 makes this exact)."""
        from spmf_tpu.ops import sparse_encode_coo

        u = self.calibrated_expectations["u"] if u is None else u
        s = self.calibrated_expectations["s"] if s is None else s
        A = self.encoding_matrix(u, s)
        sc = sparse_counts
        counts = np.diff(sc.indptr)
        rows = np.repeat(np.arange(sc.num_rows), counts)
        return sparse_encode_coo(
            rows, sc.indices, sc.data, sc.num_rows, A, self.eta_i,
            self.log_transform,
            xi_global=self.xi_u_global if self.scale_rows else None,
        )

    def log_likelihood_components(self, s, u, v, w, data, **kwargs):
        """Pointwise decoder log-likelihood + rate (reference poisson.py:156-184)."""
        x = self._counts(data)
        theta_u = self.encode(x, u, s)                       # (..., B, K)
        phi = self.intercept_matrix(w, s)                    # (..., 1, D)
        B = self.decoding_matrix(v)                          # (..., K, D)
        theta_beta = jnp.matmul(theta_u, B)                  # (..., B, D)
        rate = self.decoder_function(theta_beta) + phi
        rv = self._observation_distribution(rate)
        return {
            "log_likelihood": rv.log_prob(jnp.asarray(x, self.dtype)),
            "rate": rate,
        }

    def predictive_distribution(self, s, u, v, w, data, **kwargs):
        """Sample-reduced predictive log-likelihood.

        NOTE divergence from reference: poisson.py:204-208 reduces a key
        ``'ll'`` that is never set (KeyError whenever u has sample dims);
        we reduce ``'log_likelihood'``, which is the evident intent."""
        prediction = self.log_likelihood_components(s=s, u=u, v=v, w=w, data=data)
        reduce_dim = jnp.ndim(u) - 2
        if reduce_dim > 0:
            prediction["log_likelihood"] = jnp.sum(
                prediction["log_likelihood"],
                axis=tuple(range(reduce_dim)),
            )
        return prediction

    # ------------------------------------------------------------ prior etc.
    # --- model-family hooks (overridden by Bernoulli / Gaussian / Mixed) ---
    #: signed encoder loadings: Normal/Horseshoe + Identity bijector instead
    #: of HalfNormal/AbsHorseshoe + Softplus (reference gaussian.py:228-272)
    _u_signed = False

    def _vw_bijectors(self):
        return {"v": tfb.Softplus(), "w": tfb.Softplus()}

    def _vw_priors(self, ones):
        D, K = self.feature_dim, self.latent_dim
        return {
            "v": tfd.Independent(tfd.HalfNormal(scale=0.1 * ones(K, D)), 2),
            "w": tfd.Independent(tfd.HalfNormal(scale=ones(1, D)), 2),
        }

    def _vw_surrogates(self, ones):
        D, K = self.feature_dim, self.latent_dim
        return {
            "v": TransformedSurrogate(
                TrainableNormal(-6.0 * ones(K, D), 5e-4 * ones(K, D), 2),
                self.bijectors["v"],
            ),
            "w": TransformedSurrogate(
                TrainableNormal(-6.0 * ones(1, D), 5e-4 * ones(1, D), 2),
                self.bijectors["w"],
            ),
        }

    def _u_prior_plus(self, decay):
        if self._u_signed:
            return lambda u_eta, u_tau: tfd.Independent(
                tfd.Normal(loc=0.0 * u_eta, scale=u_eta * u_tau * decay), 2
            )
        return lambda u_eta, u_tau: tfd.Independent(
            tfd.HalfNormal(scale=u_eta * u_tau * decay), 2
        )

    def _u_prior_nonplus(self, decay, ones):
        D, K = self.feature_dim, self.latent_dim
        scale = self.u_tau_scale * np.asarray(decay) * ones(D, K)
        if self._u_signed:
            return tfd.Independent(tfd.Horseshoe(scale=scale), 2)
        return tfd.Independent(tfd.AbsHorseshoe(scale=scale), 2)

    def create_distributions(self):
        """Build prior joint + trainable surrogate (reference poisson.py:212-573)."""
        D, K = self.feature_dim, self.latent_dim
        dt = self.dtype
        # constants are built in numpy: model construction stays off the XLA
        # compiler (each tiny eager op would otherwise trigger a compile)
        ones = lambda *shape: np.ones(shape, dt)

        self.bijectors = {
            k: tfb.Softplus()
            for k in ("u", "u_eta", "u_tau", "s", "s_eta", "s_tau")
        }
        if self._u_signed:
            self.bijectors["u"] = tfb.Identity()
        self.bijectors.update(self._vw_bijectors())
        decay = np.asarray(self.symmetry_breaking_decay, dt) ** np.arange(
            K, dtype=dt
        )[None, :]
        decay = jnp.asarray(decay)

        dist = dict(self._vw_priors(ones))
        if self.horseshoe_plus:
            dist.update(
                u=self._u_prior_plus(decay),
                u_eta=lambda u_eta_a: tfd.Independent(
                    tfd.SqrtInverseGamma(0.5 * ones(D, K), 1.0 / u_eta_a), 2
                ),
                u_eta_a=tfd.Independent(
                    tfd.InverseGamma(0.5 * ones(D, K), ones(D, K)), 2
                ),
                u_tau=lambda u_tau_a: tfd.Independent(
                    tfd.SqrtInverseGamma(0.5 * ones(1, K), 1.0 / u_tau_a), 2
                ),
                u_tau_a=tfd.Independent(
                    tfd.InverseGamma(0.5 * ones(1, K), ones(1, K) / self.u_tau_scale**2), 2
                ),
                s=lambda s_eta, s_tau: tfd.Independent(
                    tfd.HalfNormal(scale=s_eta * s_tau), 2
                ),
                s_eta=lambda s_eta_a: tfd.Independent(
                    tfd.SqrtInverseGamma(0.5 * ones(2, D), 1.0 / s_eta_a), 2
                ),
                s_eta_a=tfd.Independent(
                    tfd.InverseGamma(0.5 * ones(2, D), ones(2, D)), 2
                ),
                s_tau=lambda s_tau_a: tfd.Independent(
                    tfd.SqrtInverseGamma(0.5 * ones(1, D), 1.0 / s_tau_a), 2
                ),
                s_tau_a=tfd.Independent(
                    tfd.InverseGamma(0.5 * ones(1, D), ones(1, D) / self.s_tau_scale**2), 2
                ),
            )
            self.bijectors["u_eta_a"] = tfb.Softplus()
            self.bijectors["u_tau_a"] = tfb.Softplus()
            self.bijectors["s_eta_a"] = tfb.Softplus()
            self.bijectors["s_tau_a"] = tfb.Softplus()
        else:
            dist.update(
                u=tfd.Independent(
                    tfd.AbsHorseshoe(scale=self.u_tau_scale * decay * ones(D, K)), 2
                ),
                s=tfd.Independent(
                    tfd.AbsHorseshoe(scale=self.s_tau_scale * ones(1, D)), 2
                ),
            )

        self.prior_distribution = tfd.JointDistributionNamed(dist)

        # dispatched through the hook so subclasses control their own v/w
        # initializations (GaussianFactorization: v loc -5, w loc +0.5,
        # reference gaussian.py:427-443)
        sur = dict(self._vw_surrogates(ones))
        if self.horseshoe_plus:
            sur.update(
                u=TransformedSurrogate(
                    TrainableNormal(-6.0 * ones(D, K), 5e-4 * ones(D, K), 2),
                    self.bijectors["u"],
                ),
                u_eta=TransformedSurrogate(
                    TrainableInverseGamma(3.0 * ones(D, K), ones(D, K), 2),
                    self.bijectors["u_eta"],
                ),
                u_tau=TransformedSurrogate(
                    TrainableInverseGamma(3.0 * ones(1, K), ones(1, K), 2),
                    self.bijectors["u_tau"],
                ),
                s_eta=TransformedSurrogate(
                    TrainableInverseGamma(ones(2, D), ones(2, D), 2),
                    self.bijectors["s_eta"],
                ),
                s_tau=TransformedSurrogate(
                    TrainableInverseGamma(ones(1, D), ones(1, D), 2),
                    self.bijectors["s_tau"],
                ),
                s=TransformedSurrogate(
                    TrainableNormal(
                        ones(2, D) * np.asarray([[-2.0], [-1.0]], dt),
                        1e-3 * ones(2, D),
                        2,
                    ),
                    self.bijectors["s"],
                ),
                u_eta_a=TransformedSurrogate(
                    TrainableInverseGamma(2.0 * ones(D, K), ones(D, K), 2),
                    self.bijectors["u_eta_a"],
                ),
                u_tau_a=TransformedSurrogate(
                    TrainableInverseGamma(
                        2.0 * ones(1, K), ones(1, K) / self.u_tau_scale**2, 2
                    ),
                    self.bijectors["u_tau_a"],
                ),
                s_eta_a=TransformedSurrogate(
                    TrainableInverseGamma(2.0 * ones(2, D), ones(2, D), 2),
                    self.bijectors["s_eta_a"],
                ),
                s_tau_a=TransformedSurrogate(
                    TrainableInverseGamma(
                        2.0 * ones(1, D), ones(1, D) / self.s_tau_scale**2, 2
                    ),
                    self.bijectors["s_tau_a"],
                ),
            )
        else:
            sur.update(
                s=TransformedSurrogate(
                    TrainableNormal(
                        ones(2, D) * np.asarray([[-2.0], [-1.0]], dt),
                        1e-3 * ones(2, D),
                        2,
                    ),
                    self.bijectors["s"],
                ),
                u=TransformedSurrogate(
                    TrainableNormal(-9.0 * ones(D, K), 5e-4 * ones(D, K), 2),
                    self.bijectors["u"],
                ),
            )

        aux_names = ()
        if getattr(self, "aux_broadcast", False):
            aux_names = tuple(
                n for n in sur if "_eta" in n or "_tau" in n
            )
        from spmf_tpu.parallel.mesh import _feature_axis_for

        self._surrogate = SurrogatePosterior(
            sur,
            gamma_sampler=getattr(self, "gamma_sampler", "exact"),
            broadcast_names=aux_names,
            mesh=self.mesh,
            feature_axes={n: _feature_axis_for(n) for n in sur},
        )
        self.surrogate_params = self._surrogate.init()
        self.var_list = list(sur.keys())
        self.set_calibration_expectations()

    # ---------------------------------------------------------------- energy
    def unormalized_log_prob_parts(self, data, prior_weight=1.0, **params):
        """Energy parts (reference poisson.py:582-621): weighted prior parts,
        HalfNormal(1) prior on theta ('z'), finite-masked / clipped Poisson
        log-likelihood summed over features+rows ('x')."""
        if data is None:
            data = self._next_batch()
        prior_parts = self.prior_distribution.log_prob_parts(params)
        prior_parts = {k: v * prior_weight for k, v in prior_parts.items()}

        if isinstance(data, dict) and "coo_rowl" in data:
            # block-aligned batches (DeviceSparseCounts block_rows): the
            # blocked energy when this class's COO math is authoritative
            # and no mesh shards the batch; otherwise flatten to the
            # legacy triplet format and fall through the dispatch below
            if (self._coo_energy_supported()
                    and (self.mesh is None or not any(
                        self.mesh.shape[a] > 1
                        for a in self.mesh.axis_names))):
                self._fusion_last_ok = False
                self.fusion_inactive_reason = (
                    "blocked COO energy dispatched (block-aligned batch)")
                return self._coo_log_prob_parts_blocked(
                    data, prior_parts, params)
            data = self._flatten_blocked_coo(data)

        if isinstance(data, dict) and "coo_vals" in data:
            # TPU-native sparse: two energies, chosen per batch shape.
            # Dense-scatter: scatter the COO triplets into a transient
            # dense (B, D) slab ON DEVICE and take the fused MXU-dense
            # path — dense FLOPs beat gathers at ordinary scRNA
            # densities. Flat-gather COO energy: below the measured
            # ~0.17% density crossover (benchmarks/sparse_ab.py
            # interleaved A/B, docs/gather_probe.json) the per-nnz
            # gather-dot energy wins AND never materializes the slab.
            # Storage stays sparse (host CSR / HBM triplets) either way.
            if self._sparse_dense_scatter(data["indices"].shape[0],
                                          data["coo_rows"].shape[-1]):
                data = self._densify_coo(data, enforce_slab_limit=False)
            elif self._coo_energy_supported() and self._coo_energy_mesh_ok():
                # intended sparse path — record the dispatch (observable
                # via fusion_active) without the XLA-fallback warning,
                # which would be false here
                self._fusion_last_ok = False
                self.fusion_inactive_reason = (
                    "sparse COO gather energy dispatched (dense-scatter "
                    "not engaged for this batch shape/slab)"
                )
                return self._coo_log_prob_parts(data, prior_parts, params)
            else:
                # densify (slab-checked) and take the generic dense path:
                # a subclass swapped the observation model, so the gather
                # COO energy would silently train the wrong likelihood
                # (the dense XLA fallback trains the right one)
                data = self._densify_coo(data)

        theta = self.encode(self._counts(data), params["u"], params["s"])
        prior_parts["z"] = self._theta_prior_log_prob(theta)

        x = jnp.asarray(self._counts(data), self.dtype)
        if self._can_fuse(x.shape):
            # Pallas fused decode+likelihood: identical semantics, no
            # (S,B,D) HBM round-trips (spmf_tpu.ops.fused_poisson). With a
            # mesh, the shard_map-composed variant pmin's the clip bound
            # and psum's the sums across dp x fp.
            phi = self.intercept_matrix(params["w"], params["s"])
            B = self.decoding_matrix(params["v"])
            squeeze = theta.ndim == 2
            out = self._fused_x_part(
                theta[None] if squeeze else theta,
                B[None] if squeeze else B,
                phi[None] if squeeze else phi,
                x,
            ).astype(self.dtype)
            prior_parts["x"] = out[0] if squeeze else out
            return prior_parts

        ll = self.log_likelihood_components(data=data, **params)["log_likelihood"]
        finite = jnp.where(jnp.isfinite(ll), ll, jnp.zeros_like(ll))
        min_val = jnp.min(finite) - 10.0
        if self.dtype == jnp.float32:
            # keep sum(clip(ll, min_val, 0)) representable (see
            # spmf_tpu.ops.fused_poisson._floor_min_val)
            min_val = jnp.maximum(min_val, jnp.float32(-1e27))
        ll = jnp.clip(ll, min_val, 0.0)
        ll = jnp.where(jnp.isfinite(ll), ll, min_val)
        prior_parts["x"] = jnp.sum(ll, axis=(-1, -2))
        return prior_parts

    def _coo_encode_nz(self, rows, cols, vals, B, A, v, phi, eta,
                       psum_axis=None, per_row=False):
        """Shared COO math: encode theta from (possibly dp-local) triplets
        and compute the nonzero likelihood term. With ``psum_axis`` the raw
        segment-sums, row sums, and nonzero sums are ``lax.psum``'d — the
        row scaling is applied AFTER the psum so each row's full triplet
        set contributes regardless of shard assignment. With ``per_row``
        the nonzero term keeps the row axis (lead + (B,), for the
        streaming sparse WAIC/log_likelihood scorer) instead of summing
        over rows."""
        from jax.scipy.special import gammaln

        from spmf_tpu.ops import sparse_encode_coo

        theta = sparse_encode_coo(
            rows, cols, vals, B, A, self.eta_i, self.log_transform,
            xi_global=None,
        )                                                    # (..., B, K)
        if psum_axis is not None:
            theta = jax.lax.psum(theta, psum_axis)
        if self.scale_rows:
            rowsums = jax.ops.segment_sum(vals, rows, num_segments=B)
            if psum_axis is not None:
                rowsums = jax.lax.psum(rowsums, psum_axis)
            theta = theta * (
                rowsums / jnp.asarray(self.xi_u_global, A.dtype)
            )[:, None]

        # nonzero term: sum_nz [x log(rate) - lgamma(x+1)]; zero padding is
        # an exact no-op (x=0 -> both pieces vanish; rate floored positive).
        # Sample dims flatten INTO the gather width — (nnz, S, K) results
        # pad 16->128 lanes under TPU tiling (8x bytes, measured 6.4x
        # slower end-to-end; docs/gather_probe.json) — so gather from
        # (B, L*K) / (D, L*K) tables instead. The flatten requires
        # matching lead (sample) dims, so broadcast v/phi up to theta's
        # leads first (jnp.take used to tolerate mismatched leads via
        # broadcasting; the reshape below does not).
        K = theta.shape[-1]
        lead = theta.shape[:-2]
        v = jnp.broadcast_to(v, lead + v.shape[-2:])      # lead + (K, D)
        phi = jnp.broadcast_to(phi, lead + phi.shape[-2:])  # lead + (1, D)
        L = int(np.prod(lead, dtype=np.int64)) if lead else 1
        D = v.shape[-1]
        th_flat = jnp.moveaxis(
            theta.reshape((L, B, K)), 0, 1).reshape(B, L * K)
        v_flat = jnp.transpose(
            v.reshape((L, K, D)), (2, 0, 1)).reshape(D, L * K)
        phi_flat = jnp.transpose(phi.reshape((L, D)))        # (D, L)
        theta_r = jnp.take(th_flat, rows, axis=0, mode="clip")
        v_c = jnp.take(v_flat, cols, axis=0, mode="clip")    # (nnz, L*K)
        tv = (theta_r * v_c).reshape(-1, L, K).sum(-1)       # (nnz, L)
        phi_c = jnp.take(phi_flat, cols, axis=0, mode="clip")
        if self.log_transform:
            rate_nz = jnp.exp(tv * eta[cols][:, None]) - 1.0 + phi_c
        else:
            rate_nz = tv * eta[cols][:, None] + phi_c
        rate_nz = jnp.maximum(rate_nz, jnp.finfo(self.dtype).tiny)
        if per_row:
            nz_row = jax.ops.segment_sum(
                vals[:, None] * jnp.log(rate_nz), rows, num_segments=B
            ) - jax.ops.segment_sum(
                gammaln(vals + 1.0), rows, num_segments=B)[:, None]
            nz_term = jnp.moveaxis(nz_row, 0, -1).reshape(lead + (B,))
        else:
            nz_term = (
                jnp.sum(vals[:, None] * jnp.log(rate_nz), axis=0)
                - jnp.sum(gammaln(vals + 1.0))
            ).reshape(lead)
        if psum_axis is not None:
            nz_term = jax.lax.psum(nz_term, psum_axis)
        return theta, nz_term

    def _coo_log_prob_parts_blocked(self, data, prior_parts, params):
        """Blocked COO energy (r5): consumes the block-aligned layout
        (DeviceSparseCounts block_rows — ``coo_rowl``/``coo_cols``/
        ``coo_vals`` of shape (Rb, NBLK), rows sorted within each
        R-row block, pads exact no-ops). Same math as
        _coo_log_prob_parts, restructured for the TPU memory system:

        - ONE wide gather serves every per-nnz table read (A row, v row,
          phi, eta fused into one (D, W) table — gather cost on TPU is
          ~per-INDEX, not per-byte, up to several 128-lane rows;
          docs/sparse_epoch_decomp.json probes), and its VJP is ONE
          scatter instead of four;
        - every segment-sum / per-row gather becomes a one-hot MXU
          contraction over the 128-row blocks (einsum with
          (Rb, NBLK, R) one-hots — 3x the XLA scatter's throughput,
          measured 11.7 vs 35 ms at 1.65M nnz x 128 lanes).

        Identity decode link only (the dispatcher flattens otherwise).
        Single-shard only (meshed batches flatten to the shard_map path).
        """
        from jax.scipy.special import gammaln

        rowl = data["coo_rowl"]
        cols = data["coo_cols"]
        vals = jnp.asarray(data["coo_vals"], self.dtype)
        B = data["indices"].shape[0]
        Rb, NBLK = rowl.shape
        R = B // Rb

        A = self.encoding_matrix(params["u"], params["s"])   # (..., D, K)
        v = self.decoding_matrix(params["v"])                # (..., K, D)
        phi = self.intercept_matrix(params["w"], params["s"])  # (..., 1, D)
        D = v.shape[-1]
        eta = jnp.broadcast_to(jnp.asarray(self.eta_i, self.dtype), (1, D))[0]

        K = A.shape[-1]
        lead = A.shape[:-2]
        L = int(np.prod(lead, dtype=np.int64)) if lead else 1
        A = jnp.broadcast_to(A, lead + A.shape[-2:]) if lead else A
        v = jnp.broadcast_to(v, lead + v.shape[-2:]) if lead else v
        phi = jnp.broadcast_to(phi, lead + phi.shape[-2:]) if lead else phi
        LK = L * K

        # ONE fused per-nnz table: [A (D, LK) | v (D, LK) | phi (D, L) |
        # eta (D, 1)], width padded to a 128 multiple (a (nnz, 272) take
        # measured SLOWER than (nnz, 384) — pad explicitly)
        A_flat = jnp.moveaxis(A.reshape((L, D, K)), 0, 1).reshape(D, LK)
        v_flat = jnp.transpose(
            v.reshape((L, K, D)), (2, 0, 1)).reshape(D, LK)
        phi_flat = jnp.transpose(phi.reshape((L, D)))        # (D, L)
        W = 2 * LK + L + 1
        Wp = -(-W // 128) * 128
        table = jnp.concatenate(
            [A_flat, v_flat, phi_flat, eta[:, None],
             jnp.zeros((D, Wp - W), A_flat.dtype)], axis=-1)
        tk = jnp.take(table, cols.reshape(-1), axis=0, mode="clip")
        A_g = tk[:, :LK]
        v_g = tk[:, LK:2 * LK]
        phi_g = tk[:, 2 * LK:2 * LK + L]
        eta_g = tk[:, 2 * LK + L]

        vals_f = vals.reshape(-1)
        if self.log_transform:
            g = jnp.log(vals_f / eta_g + 1.0)                # encoder g(x)
        else:
            g = vals_f / eta_g
        contrib = (g[:, None] * A_g).reshape(Rb, NBLK, LK)
        oh = (rowl[..., None]
              == jnp.arange(R, dtype=rowl.dtype)).astype(A_flat.dtype)
        theta_blk = jnp.einsum("bnw,bnr->brw", contrib, oh)  # (Rb, R, LK)
        if self.scale_rows:
            rowsums = jnp.einsum("bn,bnr->br", vals, oh)
            theta_blk = theta_blk * (
                rowsums / jnp.asarray(self.xi_u_global, A_flat.dtype)
            )[..., None]
        theta = jnp.moveaxis(
            theta_blk.reshape(B, L, K), 1, 0).reshape(lead + (B, K))

        theta_r = jnp.einsum("brw,bnr->bnw", theta_blk, oh).reshape(
            -1, L, K)                                        # (nnz, L, K)
        tv = jnp.sum(theta_r * v_g.reshape(-1, L, K), axis=-1)  # (nnz, L)
        if self.log_transform:
            rate_nz = jnp.exp(tv * eta_g[:, None]) - 1.0 + phi_g
        else:
            rate_nz = tv * eta_g[:, None] + phi_g
        rate_nz = jnp.maximum(rate_nz, jnp.finfo(self.dtype).tiny)
        nz_term = (
            jnp.sum(vals_f[:, None] * jnp.log(rate_nz), axis=0)
            - jnp.sum(gammaln(vals_f + 1.0))
        ).reshape(lead)

        prior_parts["z"] = self._theta_prior_log_prob(theta)
        if self.log_transform:
            total_rate = self._exp_rate_total(theta, v) \
                - B * D + B * jnp.sum(phi, axis=(-1, -2))
        else:
            v_eta = jnp.sum(v * eta, axis=-1)                # (..., K)
            total_rate = jnp.einsum(
                "...k,...k->...", jnp.sum(theta, axis=-2), v_eta
            ) + B * jnp.sum(phi, axis=(-1, -2))
        prior_parts["x"] = nz_term - total_rate
        return prior_parts

    @staticmethod
    def _flatten_blocked_coo(data):
        """Adapter: a block-aligned batch as the legacy flat triplet
        batch (batch-local rows j*R + rowl; pads stay exact no-ops)."""
        rowl = data["coo_rowl"]
        Rb, NBLK = rowl.shape
        R = data["indices"].shape[0] // Rb
        rows = (jnp.arange(Rb, dtype=rowl.dtype)[:, None] * R
                + rowl).reshape(-1)
        out = {k: v for k, v in data.items() if k != "coo_rowl"}
        out["coo_rows"] = rows
        out["coo_cols"] = data["coo_cols"].reshape(-1)
        out["coo_vals"] = data["coo_vals"].reshape(-1)
        return out

    #: auto-mode ceiling for the transient dense (B, D) slab (f32 bytes):
    #: beyond this, auto keeps the gather COO energy — the r2 "never
    #: densify" guarantee for very wide D, where the slab wouldn't fit HBM
    #: alongside the model (v5e: 16 GB)
    _DENSE_SCATTER_MAX_SLAB_BYTES = 4 << 30

    #: auto-mode density bound for the flat-gather COO energy: below this
    #: (padded nnz / (B*D), a static upper bound on batch density) the
    #: gather energy beats the dense slab — interleaved A/B at B=8192,
    #: D=50k measured the crossover at ~0.17% (coo 65.8 vs dense 86.5
    #: ms/step at 0.1%; dense wins 1.5x at 0.3%, 3.3x at 1% —
    #: benchmarks/sparse_ab.py); 0.15% keeps a safety margin
    _COO_ENERGY_MAX_DENSITY = 0.0015

    def _sparse_dense_scatter(self, batch_rows=None, pad_nnz=None):
        """Whether COO batches take the dense-scatter + fused-MXU path
        (see unormalized_log_prob_parts). 'auto'/None: yes when the fused
        kernel is active for the densified (B, D) batch shape (TPU; the
        shape matters — a non-mesh-divisible B would densify into the
        unfused XLA fallback, which materializes the (S, B, D) rate tensor
        the COO energy exists to avoid) AND the transient slab stays under
        _DENSE_SCATTER_MAX_SLAB_BYTES AND the batch isn't so sparse that
        the flat-gather COO energy wins outright
        (_COO_ENERGY_MAX_DENSITY); forceable with
        sparse_dense_scatter=True/False."""
        mode = self.sparse_dense_scatter
        if mode in (None, "auto"):
            shape = None
            if batch_rows is not None and self.feature_dim:
                slab = int(batch_rows) * int(self.feature_dim) \
                    * jnp.dtype(self.dtype).itemsize
                if slab > self._DENSE_SCATTER_MAX_SLAB_BYTES:
                    return False
                shape = (int(batch_rows), int(self.feature_dim))
                if (pad_nnz is not None
                        and int(pad_nnz) < self._COO_ENERGY_MAX_DENSITY
                        * shape[0] * shape[1]
                        and self._coo_energy_supported()
                        and self._coo_energy_mesh_ok()):
                    return False
            # record=False: a rejection here routes to the COO gather
            # energy (the designed sparse path), NOT the XLA fallback —
            # warning '~3x slower' from this probe would be false, and the
            # caller records the actual dispatch outcome itself
            return self._can_fuse(shape, record=False)
        return bool(mode)

    def _densify_coo(self, batch, enforce_slab_limit=True):
        """Scatter a COO batch's triplets into a transient dense (B, D)
        slab on device, returning a dense-count batch dict. Zero padding
        scatters 0 += 0 into cell (0, 0) — exact."""
        B = batch["indices"].shape[0]
        D = int(self.feature_dim)
        if enforce_slab_limit:
            slab = B * D * jnp.dtype(self.dtype).itemsize
            if slab > self._DENSE_SCATTER_MAX_SLAB_BYTES:
                raise ValueError(
                    f"this path needs a transient dense ({B}, {D}) slab "
                    f"({slab / 2**30:.1f} GiB > "
                    f"{self._DENSE_SCATTER_MAX_SLAB_BYTES / 2**30:.0f} GiB "
                    "ceiling) — use a smaller batch size (or raise "
                    "_DENSE_SCATTER_MAX_SLAB_BYTES)"
                )
        x = jnp.zeros((B, D), self.dtype).at[
            batch["coo_rows"], batch["coo_cols"]
        ].add(jnp.asarray(batch["coo_vals"], self.dtype))
        return dict(batch, **{self.count_key: x})

    def _coo_energy_supported(self):
        """Whether the gather COO energy (_coo_log_prob_parts) computes this
        model's likelihood. Its math is the stock Poisson observation model
        with the identity/log decode link baked in — the same MRO rule as
        _fusion_check: the class defining _coo_log_prob_parts vouches only
        for observation machinery at or above it, so a subclass swapping the
        likelihood (Bernoulli/Mixed/Normal-obs) without re-owning the COO
        energy must not silently train Poisson."""
        mro = type(self).__mro__
        coo_depth = _def_depth(mro, "_coo_log_prob_parts")
        for hook in ("_observation_distribution", "log_likelihood_components",
                     "_fused_x_part", "_fused_kind", "encode"):
            if _def_depth(mro, hook) < coo_depth:
                return False
        # both links are baked into the gather math (sparse_encode_coo takes
        # log_transform directly, the nz rate uses the stock decode), so
        # instance- or class-level encoder/decoder overrides invalidate it
        for fn in ("decoder_function", "encoder_function"):
            if fn in self.__dict__ or (
                getattr(type(self), fn)
                is not getattr(PoissonFactorization, fn)
            ):
                return False
        return True

    def _coo_energy_mesh_ok(self):
        """The gather COO energy composes with ANY mesh since r4: triplets
        shard jointly over every >1 axis (dp and fp alike — their
        assignment is arbitrary and the partial sums psum exactly), so
        very-wide-D sparse data on an fp mesh has a training path even
        when the dense slab exceeds _DENSE_SCATTER_MAX_SLAB_BYTES
        (VERDICT r3 #7 closed). Kept as a hook for future mesh topologies
        the energy could not serve."""
        return True

    def _coo_log_prob_parts(self, data, prior_parts, params):
        """Sparse (COO) energy: trains on padded triplet batches without
        ever materializing the dense (B, D) slab — the nonzero term is a
        gather-dot over the triplets and the rate total collapses to
        sum_b(theta) . sum_d(v*eta) for the identity decode link
        (spmf_tpu.data.SparseCounts.as_coo; BASELINE.json north-star sparse
        encoder design).

        Deliberate divergence from the dense path (documented in
        docs/PARITY.md): the exact Poisson log-likelihood is finite by
        construction here, so the reference's data-dependent clip
        (poisson.py:606-619) is a no-op and is not applied."""
        rows = data["coo_rows"]
        cols = data["coo_cols"]
        vals = jnp.asarray(data["coo_vals"], self.dtype)
        B = data["indices"].shape[0]

        A = self.encoding_matrix(params["u"], params["s"])   # (..., D, K)
        v = self.decoding_matrix(params["v"])                # (..., K, D)
        phi = self.intercept_matrix(params["w"], params["s"])  # (..., 1, D)
        D = v.shape[-1]
        eta = jnp.broadcast_to(jnp.asarray(self.eta_i, self.dtype), (1, D))[0]

        axes = ()
        if self.mesh is not None:
            axes = tuple(ax for ax in self.mesh.axis_names
                         if self.mesh.shape[ax] > 1)
        nshards = int(np.prod([self.mesh.shape[ax] for ax in axes],
                              dtype=np.int64)) if axes else 1
        if axes and rows.shape[-1] % nshards:
            raise ValueError(
                f"padded nnz {rows.shape[-1]} must divide the mesh device "
                f"count {nshards} (SparseCounts.as_coo pads to 1024-"
                "multiples, which covers any mesh up to 1024 devices)"
            )

        if not axes:
            theta, nz_term = self._coo_encode_nz(rows, cols, vals, B, A, v,
                                                 phi, eta)
        else:
            # triplets shard jointly over EVERY >1 mesh axis (dp AND fp —
            # VERDICT r3 #7: triplet assignment is arbitrary, so the fp
            # axis is just more devices to spread nnz over; the per-shard
            # partial segment-sums and nonzero sums are exact under a
            # psum over all the axes). The params replicate into the
            # shard_map — they are small (D x K etc.) next to the data,
            # which is the thing fp meshes exist to split.
            from jax.sharding import PartitionSpec as P

            def body(rows, cols, vals, A, v, phi, eta):
                theta, nz = self._coo_encode_nz(
                    rows, cols, vals, B, A, v, phi, eta, psum_axis=axes
                )
                return theta, nz

            theta, nz_term = jax.shard_map(
                body, mesh=self.mesh,
                in_specs=(P(axes), P(axes), P(axes), P(), P(), P(), P()),
                out_specs=(P(), P()),
                check_vma=False,
            )(rows, cols, vals, A, v, phi, eta)

        prior_parts["z"] = self._theta_prior_log_prob(theta)
        # -sum_ij rate over ALL B x D entries, without materializing them
        if self.log_transform:
            # rate = exp(tv*eta) - 1 + phi: the exp total needs the fused
            # reduction kernel (f32); f64/CPU falls back to a direct sum
            total_rate = self._exp_rate_total(theta, v) \
                - B * D + B * jnp.sum(phi, axis=(-1, -2))
        else:
            # sum_ij (theta@v)*eta = sum_k [sum_b theta_bk][sum_d v_kd eta_d]
            v_eta = jnp.sum(v * eta, axis=-1)                # (..., K)
            total_rate = jnp.einsum(
                "...k,...k->...", jnp.sum(theta, axis=-2), v_eta
            ) + B * jnp.sum(phi, axis=(-1, -2))
        prior_parts["x"] = nz_term - total_rate
        return prior_parts

    def _exp_rate_total(self, theta, v):
        """sum_ij exp((theta @ v) * eta) per sample, for the sparse energy's
        log-transform link — Pallas tile reduction in f32 (never
        materializes (S, B, D)); direct XLA sum in f64 (CPU parity runs)."""
        from spmf_tpu.ops import fused_exp_rate_sum

        if self.dtype == jnp.float32:
            squeeze = theta.ndim == 2
            th = theta[None] if squeeze else theta
            vv = v[None] if squeeze else v
            out = fused_exp_rate_sum(th, vv, self.eta_i,
                                     self._fused_interpret)
            return (out[0] if squeeze else out).astype(self.dtype)
        return jnp.sum(
            jnp.exp(jnp.matmul(theta, v)
                    * jnp.asarray(self.eta_i, self.dtype)),
            axis=(-1, -2),
        )

    def _fused_x_part(self, theta, B, phi, x):
        """Fused-kernel 'x' energy part, (S,) f32. theta (S,B,K),
        B (S,K,D), phi (S,1,D), x (B,D). The mixed family rides the same
        kernels via its per-column ``codes`` lane (_fused_codes)."""
        from spmf_tpu.ops import (
            fused_poisson_loglik,
            fused_poisson_loglik_sharded,
        )

        kind = self._fused_kind()
        codes = self._fused_codes()
        clip = getattr(self, "likelihood_clip", "reference")
        if self.mesh is None:
            return fused_poisson_loglik(
                theta, B, phi, x, self.eta_i, self.log_transform,
                self._fused_interpret, kind, codes, clip,
            )
        return fused_poisson_loglik_sharded(
            theta, B, phi, x, self.eta_i, self.mesh, self.log_transform,
            self._fused_interpret, data_axis=self._row_mesh_axes(),
            likelihood=kind, codes=codes, clip=clip,
        )

    def _row_mesh_axes(self):
        """Row-sharding axis spec for the mesh: plain 'dp', or the joint
        ('dcn', 'dp') tuple on multi-slice meshes (rows shard over both;
        parallel.mesh.make_multislice_mesh)."""
        if (self.mesh is not None and "dcn" in self.mesh.axis_names
                and self.mesh.shape["dcn"] > 1):
            return ("dcn", "dp")
        return "dp"

    def _can_fuse(self, batch_shape=None, record=True):
        """Fused kernel only for the stock Poisson decode path: no subclass
        likelihood/encode overrides and no user-supplied decoder. Under a
        mesh, ``fused_poisson_loglik_sharded`` composes the kernel with the
        dp x fp layout, provided shard_map can split the batch evenly
        (``batch_shape``, when given, is the static (B, D) of the counts).

        Rejections are observable (VERDICT r2 #5 — losing the ~3x kernel
        because B % dp != 0 must not be silent): the reason lands in
        ``self.fusion_inactive_reason`` and, when the user asked for fusion
        (``fused_likelihood=True``), a one-time UserWarning fires.
        ``record=False`` for query-only evaluations (the WAIC path, the
        ``fusion_active`` fallback) so they never clobber the rejection
        recorded at the last TRAINING dispatch."""
        ok, reason = self._fusion_check(batch_shape)
        if record:
            self.fusion_inactive_reason = reason
            self._fusion_last_ok = ok
            if not ok and self.fused_likelihood and not getattr(
                self, "_fusion_warned", False
            ):
                # query-only (record=False) evaluations must not consume
                # the one-shot warning meant for the training dispatch
                import warnings

                self._fusion_warned = True
                warnings.warn(
                    f"fused likelihood disabled, falling back to the XLA "
                    f"path (~3x slower on TPU): {reason}",
                    UserWarning,
                    stacklevel=3,
                )
        return ok

    @property
    def fusion_active(self):
        """Fusion state AS OF THE LAST ``_can_fuse`` evaluation (see
        fusion_inactive_reason) — reading it must not re-evaluate without
        the batch shape and clobber a shape-based rejection recorded when
        the actual training batch was dispatched. Evaluates once (shape-
        less) only if no dispatch has happened yet."""
        last = getattr(self, "_fusion_last_ok", None)
        if last is None:
            return self._can_fuse(record=False)
        return last

    def _fusion_check(self, batch_shape=None):
        """(ok, reason) for the fused-kernel eligibility rules."""
        if not self.fused_likelihood:
            return False, "fused_likelihood=False (CPU default)"
        if self._fused_kind() is None:
            return False, "model family has no fused-kernel likelihood"
        if batch_shape is not None and self.mesh is not None:
            row_axes = self._row_mesh_axes()
            row_axes = row_axes if isinstance(row_axes, tuple) else (row_axes,)
            for dim, ax in zip(batch_shape[-2:], (row_axes, ("fp",))):
                nsh = int(np.prod([self.mesh.shape[a] for a in ax
                                   if a in self.mesh.axis_names],
                                  dtype=np.int64))
                if dim % nsh:
                    return False, (
                        f"batch dim {dim} does not divide mesh axes "
                        f"{ax!r} (total {nsh} shards) — pad the "
                        "batch/feature dim to a multiple"
                    )
        mro = type(self).__mro__
        kind_depth = _def_depth(mro, "_fused_kind")
        # the likelihood math is baked into the kernel per kind: the class
        # that (re)defines _fused_kind vouches for whatever observation
        # machinery is in effect AT OR ABOVE it in the MRO. A subclass
        # overriding the observation distribution or the likelihood
        # assembly in a MORE derived class without re-owning _fused_kind
        # loses fusion (with a warning) instead of computing a wrong
        # likelihood.
        if _def_depth(mro, "_observation_distribution") < kind_depth:
            return False, (
                "subclass overrides _observation_distribution without "
                "re-owning _fused_kind"
            )
        if _def_depth(mro, "log_likelihood_components") < kind_depth:
            return False, (
                "subclass overrides log_likelihood_components without "
                "re-owning _fused_kind"
            )
        # the decode link is baked into the kernel, so both instance- and
        # class-level decoder overrides must disable fusion
        if "decoder_function" in self.__dict__ or (
            type(self).decoder_function
            is not PoissonFactorization.decoder_function
        ):
            return False, "custom decoder_function overrides the decode link"
        return True, None

    def unormalized_log_prob(self, data=None, prior_weight=1.0, **params):
        # NOTE: the reference hard-codes prior_weight=1. when forwarding to
        # the parts function (poisson.py:577) — reproduced for loss parity.
        parts = self.unormalized_log_prob_parts(data, prior_weight=1.0, **params)
        out = 0.0
        for v in parts.values():
            out = out + v
        return out

    def unormalized_log_prob_list(self, *x):
        """Positional-args wrapper (reference poisson.py:703-709)."""
        return self.unormalized_log_prob(**dict(zip(self.var_list, x)))

    def _coo_row_log_likelihood(self, batch, samples):
        """Streaming sparse scorer: per-row Poisson log-likelihood over COO
        triplets without ever densifying the (B, D) slab. Identity decode
        link only — the per-row rate total collapses to
        theta_i . (v @ eta) + sum_j(phi_j), so each row's ll is
        [nz gather term] - [closed-form rate total] exactly (the same
        algebra as _coo_log_prob_parts, kept per-row). Like the COO
        energy, the log-likelihood here is exact/finite by construction,
        so the reference's data-dependent clip is a no-op (docs/PARITY.md).
        Under a mesh the triplets shard over every >1 axis and the per-row
        partials psum (rows stay global)."""
        rows = batch["coo_rows"]
        cols = batch["coo_cols"]
        vals = jnp.asarray(batch["coo_vals"], self.dtype)
        B = batch["indices"].shape[0]
        A = self.encoding_matrix(samples["u"], samples["s"])
        v = self.decoding_matrix(samples["v"])
        phi = self.intercept_matrix(samples["w"], samples["s"])
        D = v.shape[-1]
        eta = jnp.broadcast_to(jnp.asarray(self.eta_i, self.dtype), (1, D))[0]

        axes = ()
        if self.mesh is not None:
            axes = tuple(ax for ax in self.mesh.axis_names
                         if self.mesh.shape[ax] > 1)
        nshards = int(np.prod([self.mesh.shape[ax] for ax in axes],
                              dtype=np.int64)) if axes else 1
        if axes and rows.shape[-1] % nshards:
            # same actionable guard as the training energy (above) — a
            # bare shard_map error here is opaque
            raise ValueError(
                f"padded nnz {rows.shape[-1]} must divide the mesh device "
                f"count {nshards} (SparseCounts.as_coo pads to 1024-"
                "multiples, which covers any mesh up to 1024 devices)"
            )
        if not axes:
            theta, nz_row = self._coo_encode_nz(
                rows, cols, vals, B, A, v, phi, eta, per_row=True)
        else:
            from jax.sharding import PartitionSpec as P

            def body(rows, cols, vals, A, v, phi, eta):
                return self._coo_encode_nz(
                    rows, cols, vals, B, A, v, phi, eta,
                    psum_axis=axes, per_row=True)

            theta, nz_row = jax.shard_map(
                body, mesh=self.mesh,
                in_specs=(P(axes), P(axes), P(axes), P(), P(), P(), P()),
                out_specs=(P(), P()),
                check_vma=False,
            )(rows, cols, vals, A, v, phi, eta)

        v_eta = jnp.sum(v * eta, axis=-1)                    # (..., K)
        row_rate = jnp.einsum("...bk,...k->...b", theta, v_eta) \
            + jnp.sum(phi, axis=(-1, -2))[..., None]
        return nz_row - row_rate                             # (..., B)

    def _row_log_likelihood(self, batch, samples):
        if isinstance(batch, dict) and "coo_rowl" in batch:
            # scoring runs once per posterior chunk — the legacy flat
            # path is plenty; keep ONE scorer implementation
            batch = self._flatten_blocked_coo(batch)
        if isinstance(batch, dict) and "coo_vals" in batch:
            if (not self._sparse_dense_scatter(
                    batch["indices"].shape[0],
                    batch["coo_rows"].shape[-1])
                    and not self.log_transform
                    and self._coo_energy_supported()
                    and self._coo_energy_mesh_ok()):
                # ultra-sparse (or slab-over-ceiling) batches score via
                # the flat-gather COO row scorer — previously these
                # densified unconditionally, so wide-D data whose slab
                # exceeded _DENSE_SCATTER_MAX_SLAB_BYTES could not be
                # scored at all
                return self._coo_row_log_likelihood(batch, samples)
            # ordinary densities: densify the slab on device (same
            # scatter as the training path) and stream the fused per-row
            # kernel
            batch = self._densify_coo(batch)
        x_shape = np.shape(self._counts(batch))
        if self._can_fuse(x_shape, record=False):
            # stream per-row sums tile-by-tile (no (S,B,D) tensor) — WAIC
            # at D=20k with 100 posterior samples would otherwise
            # materialize ~8 GB per batch (docs/ROADMAP.md item 7). Under
            # a mesh, the shard_map-composed variant keeps rows dp-local
            # and psums the per-row feature sums over fp (VERDICT r3 #2 —
            # meshed models previously lost the memory-safe scoring path
            # exactly at the scale meshes exist for).
            from spmf_tpu.ops import (
                fused_poisson_row_loglik,
                fused_poisson_row_loglik_sharded,
            )

            x = jnp.asarray(self._counts(batch), self.dtype)
            theta = self.encode(x, samples["u"], samples["s"])
            phi = self.intercept_matrix(samples["w"], samples["s"])
            B = self.decoding_matrix(samples["v"])
            squeeze = theta.ndim == 2
            args = (
                theta[None] if squeeze else theta,
                B[None] if squeeze else B,
                phi[None] if squeeze else phi,
                x,
                self.eta_i,
            )
            kw = dict(
                log_transform=self.log_transform,
                interpret=self._fused_interpret,
                likelihood=self._fused_kind(),
                codes=self._fused_codes(),
            )
            if self.mesh is None:
                out = fused_poisson_row_loglik(*args, **kw)
            else:
                out = fused_poisson_row_loglik_sharded(
                    *args[:5], self.mesh,
                    data_axis=self._row_mesh_axes(), **kw)
            out = out.astype(self.dtype)
            return out[0] if squeeze else out
        ll = self.log_likelihood_components(data=batch, **samples)["log_likelihood"]
        return jnp.sum(ll, axis=-1)  # (S, B)

    def _config(self):
        return {
            "latent_dim": self.latent_dim,
            "feature_dim": self.feature_dim,
            "u_tau_scale": float(self.u_tau_scale),
            "s_tau_scale": float(self.s_tau_scale),
            "symmetry_breaking_decay": float(self.symmetry_breaking_decay),
            "scale_columns": bool(self.scale_columns),
            "scale_rows": bool(self.scale_rows),
            "log_transform": bool(self.log_transform),
            "horseshoe_plus": bool(self.horseshoe_plus),
            "count_key": self.count_key,
            "likelihood_clip": getattr(self, "likelihood_clip",
                                       "reference"),
        }

