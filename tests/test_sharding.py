"""Sharding equivalence on the virtual 8-device CPU mesh.

The TPU-native replacement for the reference's tf.distribute strategy hook
(SURVEY.md §5.8): dp row-sharding + fp feature-sharding must be numerically
equivalent to single-device execution (XLA inserts the collectives)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P_

from spmf_tpu import PoissonFactorization
from spmf_tpu.parallel import (
    data_parallel_mesh,
    make_mesh,
    replicate,
    shard_batch,
    shard_params_feature_dim,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

B, D, P, S = 32, 16, 4, 3
RNG = np.random.default_rng(0)
X = RNG.poisson(1.0, size=(B, D)).astype(np.float64)


def _model():
    return PoissonFactorization(
        latent_dim=P, feature_dim=D, u_tau_scale=0.1, dtype="float64",
        scale_columns=False,
    )


def _loss_fn(model):
    surrogate = model._surrogate

    def loss(params, key, batch):
        samples, logq = surrogate.sample_and_log_prob(params, key, (S,))
        lp = model.unormalized_log_prob(data=batch, **samples)
        return -jnp.mean(lp - logq) / B

    return loss


def test_dp_sharded_loss_matches_single_device():
    model = _model()
    loss = jax.jit(_loss_fn(model))
    key = jax.random.PRNGKey(0)
    batch = {"counts": jnp.asarray(X), "indices": jnp.arange(B)}
    ref = float(loss(model.surrogate_params, key, batch))

    mesh = data_parallel_mesh(8)
    sharded_batch = shard_batch(batch, mesh)
    params = replicate(model.surrogate_params, mesh)
    out = float(loss(params, key, sharded_batch))
    np.testing.assert_allclose(out, ref, rtol=1e-10)


def test_dp_fp_sharded_grad_matches_single_device():
    model = _model()
    loss = _loss_fn(model)
    key = jax.random.PRNGKey(1)
    batch = {"counts": jnp.asarray(X), "indices": jnp.arange(B)}
    ref_grads = jax.jit(jax.grad(loss))(model.surrogate_params, key, batch)

    mesh = make_mesh((4, 2), ("dp", "fp"))
    sbatch = {
        "counts": jax.device_put(
            jnp.asarray(X), NamedSharding(mesh, P_("dp", "fp"))
        ),
        "indices": jax.device_put(jnp.arange(B), NamedSharding(mesh, P_("dp"))),
    }
    sparams = shard_params_feature_dim(model.surrogate_params, mesh, "fp")
    grads = jax.jit(jax.grad(loss))(sparams, key, sbatch)
    for name in ref_grads:
        for leaf in ref_grads[name]:
            np.testing.assert_allclose(
                np.asarray(grads[name][leaf]),
                np.asarray(ref_grads[name][leaf]),
                rtol=1e-8,
                atol=1e-10,
                err_msg=f"{name}.{leaf}",
            )


def test_full_train_step_on_mesh():
    model = _model()
    loss = _loss_fn(model)
    optimizer = optax.chain(optax.clip(5.0), optax.adam(0.05))
    mesh = make_mesh((4, 2), ("dp", "fp"))
    params = shard_params_feature_dim(model.surrogate_params, mesh, "fp")
    opt_state = optimizer.init(params)
    batch = {
        "counts": jax.device_put(jnp.asarray(X), NamedSharding(mesh, P_("dp", "fp"))),
        "indices": jax.device_put(jnp.arange(B), NamedSharding(mesh, P_("dp"))),
    }

    @jax.jit
    def step(p, o, key, b):
        l, g = jax.value_and_grad(loss)(p, key, b)
        updates, o = optimizer.update(g, o, p)
        return optax.apply_updates(p, updates), o, l

    p, o, l0 = step(params, opt_state, jax.random.PRNGKey(0), batch)
    p, o, l1 = step(p, o, jax.random.PRNGKey(1), batch)
    assert np.isfinite(float(l0)) and np.isfinite(float(l1))


def test_graft_entry_dryrun():
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge

    fn, args = ge.entry()
    val = float(jax.jit(fn)(*args))
    assert np.isfinite(val)
    ge.dryrun_multichip(8)


def test_fit_routes_dp_fp_sharding_and_matches_single_device():
    """The public model.fit() on a dp x fp mesh must (a) place the surrogate
    params feature-sharded, and (b) reproduce single-device losses exactly
    (VERDICT r1 #3: the validated layout must be reachable from the user
    API, not only from hand-rolled train steps)."""
    data = {"counts": X, "indices": np.arange(B)}

    ref = _model()
    ref_losses = ref.fit(batched_data_factory=data, num_steps=3,
                         learning_rate=0.05, sample_size=S, seed=7,
                         verbose=False, rel_tol=None)

    mesh = make_mesh((4, 2), ("dp", "fp"))
    m = PoissonFactorization(
        latent_dim=P, feature_dim=D, u_tau_scale=0.1, dtype="float64",
        scale_columns=False, mesh=mesh,
    )
    losses = m.fit(batched_data_factory=data, num_steps=3,
                   learning_rate=0.05, sample_size=S, seed=7,
                   verbose=False, rel_tol=None)
    np.testing.assert_allclose(losses, ref_losses, rtol=1e-8)

    # params stayed fp-sharded through best-checkpoint restore
    spec = m.surrogate_params["u"]["loc"].sharding.spec
    assert "fp" in str(spec), spec
    spec_v = m.surrogate_params["v"]["loc"].sharding.spec
    assert "fp" in str(spec_v), spec_v

    # and the calibrated expectations / encode still work on sharded params
    z = np.asarray(m.encode(X[:4]))
    assert np.isfinite(z).all()


def test_fit_param_sharding_replicated_option():
    data = {"counts": X, "indices": np.arange(B)}
    mesh = make_mesh((4, 2), ("dp", "fp"))
    m = PoissonFactorization(
        latent_dim=P, feature_dim=D, u_tau_scale=0.1, dtype="float64",
        scale_columns=False, mesh=mesh,
    )
    losses = m.fit(batched_data_factory=data, num_steps=2,
                   learning_rate=0.05, sample_size=S, seed=7, verbose=False,
                   rel_tol=None, param_sharding="replicated")
    assert np.isfinite(losses).all()
    spec = m.surrogate_params["u"]["loc"].sharding.spec
    assert "fp" not in str(spec), spec


def test_fused_likelihood_composes_with_mesh():
    """VERDICT r1 #2: the fused Pallas likelihood must keep running under a
    dp x fp mesh (shard_map: per-shard min kernel -> pmin -> sum kernel ->
    psum), matching the XLA path's global-clip semantics exactly."""
    mesh = make_mesh((4, 2), ("dp", "fp"))

    def build(fused):
        m = PoissonFactorization(
            latent_dim=P, feature_dim=D, u_tau_scale=0.1, dtype="float64",
            scale_columns=False, mesh=mesh, fused_likelihood=fused,
        )
        m._fused_interpret = True  # CPU: interpret-mode kernels
        return m

    ref = build(False)
    fused = build(True)
    assert fused._can_fuse(X.shape)
    batch = {"counts": jnp.asarray(X), "indices": jnp.arange(B)}
    key = jax.random.PRNGKey(2)
    samples, _ = ref._surrogate.sample_and_log_prob(
        ref.surrogate_params, key, (S,)
    )

    px = np.asarray(ref.unormalized_log_prob_parts(batch, **samples)["x"])
    fx = np.asarray(fused.unormalized_log_prob_parts(batch, **samples)["x"])
    np.testing.assert_allclose(fx, px, rtol=1e-5)

    # gradients through the full energy agree (clip bound is interior here)
    def loss(model):
        def f(p):
            s, logq = model._surrogate.sample_and_log_prob(p, key, (S,))
            return -jnp.mean(model.unormalized_log_prob(data=batch, **s) - logq)
        return f

    g_ref = jax.jit(jax.grad(loss(ref)))(ref.surrogate_params)
    g_fused = jax.jit(jax.grad(loss(fused)))(fused.surrogate_params)
    for name in g_ref:
        for leaf in g_ref[name]:
            np.testing.assert_allclose(
                np.asarray(g_fused[name][leaf]), np.asarray(g_ref[name][leaf]),
                rtol=5e-4, atol=1e-7, err_msg=f"{name}.{leaf}",
            )


def test_fused_fit_runs_on_mesh():
    """model.fit() with fused likelihood on a dp x fp mesh end-to-end."""
    mesh = make_mesh((4, 2), ("dp", "fp"))
    m = PoissonFactorization(
        latent_dim=P, feature_dim=D, u_tau_scale=0.1, dtype="float64",
        scale_columns=False, mesh=mesh, fused_likelihood=True,
    )
    m._fused_interpret = True
    data = {"counts": X, "indices": np.arange(B)}
    losses = m.fit(batched_data_factory=data, num_steps=2,
                   learning_rate=0.05, sample_size=S, seed=7, verbose=False,
                   rel_tol=None)
    assert np.isfinite(losses).all()


def _fused_ig_model(mesh):
    m = PoissonFactorization(
        latent_dim=P, feature_dim=D, u_tau_scale=0.1, dtype="float32",
        scale_columns=False, mesh=mesh, gamma_sampler="fused",
        fused_likelihood=False,
    )
    return m


def test_fused_ig_sampler_sharded_assembly_exact():
    """docs/ROADMAP.md item 5: the fused IG sampler composes with an fp
    mesh via shard_map. With a seed-independent deterministic kernel impl,
    the per-shard concat/split/psum assembly must reproduce the unsharded
    computation EXACTLY (validates specs, local shapes, and the logq
    reduction; the kernel math itself is TPU-validated in
    benchmarks/validate_fused_ig_tpu.py)."""
    mesh = make_mesh((2, 4), ("dp", "fp"))
    m = _fused_ig_model(mesh)
    sur = m._surrogate
    assert sur._fp_size() == 4

    def det_impl(a_flat, b_flat, seed, S_):
        y = jnp.broadcast_to(2.0 * a_flat + b_flat, (S_,) + a_flat.shape)
        return y, jnp.full((S_,), jnp.sum(a_flat * b_flat))

    sur._ig_impl = det_impl
    names = sur._ig_names
    assert sur._fused_igs_sharded_ok(names, (S,))
    key = jax.random.PRNGKey(0)
    values, logq = jax.jit(
        lambda p: sur._sample_igs(names, p, key, (S,))
    )(m.surrogate_params)

    from spmf_tpu.bijectors import Softplus

    sp = Softplus()
    exp_logq = 0.0
    for n in names:
        a = sp.forward(m.surrogate_params[n]["raw_concentration"])
        b = sp.forward(m.surrogate_params[n]["raw_scale"])
        np.testing.assert_allclose(
            np.asarray(values[n]),
            np.broadcast_to(np.asarray(2.0 * a + b), (S,) + a.shape),
            rtol=1e-6, err_msg=n,
        )
        exp_logq = exp_logq + float(jnp.sum(a * b))
    np.testing.assert_allclose(np.asarray(logq), exp_logq, rtol=1e-5)


def test_fused_ig_sampler_sharded_logq_identity_and_grads():
    """With the pure-JAX reference kernel (threefry RNG), the sharded
    sampler's summed logq must equal the per-variable surrogate log_prob
    of the values it returns, and gradients must flow to every IG param."""
    from spmf_tpu.ops.fused_ig import ig_sample_logq_reference

    mesh = make_mesh((2, 4), ("dp", "fp"))
    m = _fused_ig_model(mesh)
    sur = m._surrogate
    sur._ig_impl = lambda a, b, seed, S_: ig_sample_logq_reference(
        a, b, jax.random.PRNGKey(seed), S_
    )
    names = sur._ig_names
    key = jax.random.PRNGKey(3)

    def sample_logq(p):
        values, logq = sur._sample_igs(names, p, key, (S,))
        return values, logq

    values, logq = jax.jit(sample_logq)(m.surrogate_params)
    manual = 0.0
    for n in names:
        manual = manual + sur.surrogates[n].log_prob(
            m.surrogate_params[n], values[n]
        )
    np.testing.assert_allclose(np.asarray(logq), np.asarray(manual),
                               rtol=1e-4)

    g = jax.jit(jax.grad(lambda p: jnp.sum(sample_logq(p)[1])))(
        m.surrogate_params
    )
    for n in names:
        for leaf, arr in g[n].items():
            assert np.isfinite(np.asarray(arr)).all(), f"{n}.{leaf}"
            assert np.abs(np.asarray(arr)).max() > 0, f"{n}.{leaf}"


def test_fused_ig_sampler_plain_under_dp_mesh():
    """dp-only meshes keep the PLAIN fused IG path (params replicated, the
    kernel runs replicated under jit); end-to-end fit must work and match
    the unsharded fit exactly (same threefry reference impl, same seed)."""
    from spmf_tpu.ops.fused_ig import ig_sample_logq_reference

    impl = lambda a, b, seed, S_: ig_sample_logq_reference(  # noqa: E731
        a, b, jax.random.PRNGKey(seed), S_
    )

    def run(mesh):
        m = PoissonFactorization(
            latent_dim=P, feature_dim=D, u_tau_scale=0.1, dtype="float32",
            scale_columns=False, mesh=mesh, gamma_sampler="fused",
            fused_likelihood=False,
        )
        m._surrogate._ig_impl = impl
        if mesh is None:
            assert m._surrogate._fused_igs_ok(m._surrogate._ig_names, (S,))
        data = {"counts": X.astype(np.float32), "indices": np.arange(B)}
        return m.fit(batched_data_factory=data, num_steps=2,
                     learning_rate=0.05, sample_size=S, seed=11,
                     verbose=False, rel_tol=None)

    ref = run(None)
    out = run(data_parallel_mesh(8))
    np.testing.assert_allclose(out, ref, rtol=1e-5)


def test_coo_energy_dp_sharded_matches_single_device():
    """Sparse COO training under a dp mesh: triplets shard over dp with
    psum'd segment-sums / row sums / nonzero sums — the energy must equal
    the single-device COO energy exactly (arbitrary row-shard assignment,
    zero padding, row scaling on)."""
    from spmf_tpu.data import SparseCounts

    rng = np.random.default_rng(9)
    dense = rng.poisson(0.8, (40, 12)).astype(float)
    sp = SparseCounts.from_dense(dense)
    rows, cols, vals = sp.batch_coo(np.arange(40))
    pad = ((len(vals) + 39) // 40) * 40  # divisible by dp=8 (and 40)
    batch = {
        "coo_rows": np.zeros(pad, np.int32),
        "coo_cols": np.zeros(pad, np.int32),
        "coo_vals": np.zeros(pad),
        "indices": np.arange(40),
    }
    batch["coo_rows"][:len(vals)] = rows
    batch["coo_cols"][:len(vals)] = cols
    batch["coo_vals"][:len(vals)] = vals
    # shuffle triplets: shards must not rely on row-contiguity
    perm = rng.permutation(pad)
    for k in ("coo_rows", "coo_cols", "coo_vals"):
        batch[k] = batch[k][perm]

    def run(mesh):
        m = PoissonFactorization(
            latent_dim=3, feature_dim=12, u_tau_scale=0.1, dtype="float64",
            mesh=mesh, data=sp.batch(40),
        )
        key = jax.random.PRNGKey(1)
        samples, _ = m._surrogate.sample_and_log_prob(
            m.surrogate_params, key, (3,)
        )
        return np.asarray(jax.jit(
            lambda s: m.unormalized_log_prob(data=batch, **s)
        )(samples))

    ref = run(None)
    out = run(data_parallel_mesh(8))
    np.testing.assert_allclose(out, ref, rtol=1e-12)

    # gradients flow through the sharded path
    mesh = data_parallel_mesh(8)
    m = PoissonFactorization(
        latent_dim=3, feature_dim=12, u_tau_scale=0.1, dtype="float64",
        mesh=mesh, data=sp.batch(40),
    )
    key = jax.random.PRNGKey(1)

    def loss(p):
        s, lq = m._surrogate.sample_and_log_prob(p, key, (3,))
        return -jnp.mean(m.unormalized_log_prob(data=batch, **s) - lq)

    g = jax.jit(jax.grad(loss))(m.surrogate_params)
    assert np.abs(np.asarray(g["u"]["loc"])).max() > 0


def test_mixed_fused_composes_with_mesh():
    """VERDICT r2 #3: the mixed family must not lose fusion under a mesh.
    The ('mixed', s) codes lane shards over fp like eta, so the dp x fp
    sharded fused energy must equal the single-device fused energy
    bit-for-bit (same kernel math + exact scalar psum/pmin combine)."""
    from spmf_tpu import MixedFactorization

    Bm, Dm, Pm, Sm = 24, 12, 3, 2
    rng = np.random.default_rng(5)
    types = ["poisson"] * 4 + ["bernoulli"] * 4 + ["normal"] * 4
    rng.shuffle(types)
    Xm = rng.poisson(1.0, size=(Bm, Dm)).astype(np.float64)
    bern = [i for i, t in enumerate(types) if t == "bernoulli"]
    norm = [i for i, t in enumerate(types) if t == "normal"]
    Xm[:, bern] %= 2
    Xm[:, norm] = rng.normal(size=(Bm, len(norm)))

    def build(mesh):
        m = MixedFactorization(
            column_types=types, latent_dim=Pm, u_tau_scale=0.1,
            dtype="float64", fused_likelihood=True, obs_scale=0.7,
            mesh=mesh,
        )
        m._fused_interpret = True
        return m

    single = build(None)
    mesh = make_mesh((4, 2), ("dp", "fp"))
    sharded = build(mesh)
    assert sharded._fused_kind() == ("mixed", 0.7)
    assert sharded._can_fuse(batch_shape=(Bm, Dm))
    sharded.surrogate_params = single.surrogate_params

    key = jax.random.PRNGKey(9)
    samples, _ = single._surrogate.sample_and_log_prob(
        single.surrogate_params, key, (Sm,)
    )
    batch = {"counts": jnp.asarray(Xm), "indices": jnp.arange(Bm)}
    x_single = np.asarray(
        single.unormalized_log_prob_parts(batch, **samples)["x"]
    )
    sbatch = {
        "counts": jax.device_put(
            jnp.asarray(Xm), NamedSharding(mesh, P_("dp", "fp"))
        ),
        "indices": jax.device_put(jnp.arange(Bm), NamedSharding(mesh, P_("dp"))),
    }
    x_sharded = np.asarray(
        sharded.unormalized_log_prob_parts(sbatch, **samples)["x"]
    )
    np.testing.assert_allclose(x_sharded, x_single, rtol=1e-6)

    # gradients flow through the sharded mixed kernel
    def loss(p):
        s, lq = sharded._surrogate.sample_and_log_prob(p, key, (Sm,))
        return -jnp.mean(sharded.unormalized_log_prob(data=sbatch, **s) - lq)

    g = jax.jit(jax.grad(loss))(sharded.surrogate_params)
    flat, _ = jax.tree_util.tree_flatten(g)
    assert all(np.isfinite(np.asarray(a)).all() for a in flat)


def test_autoencoder_trains_on_dp_mesh():
    """VERDICT r2 #7: the autoencoder gets mesh coverage like every other
    family — a dp mesh must reproduce the single-device loss trajectory
    (params replicated, batch rows sharded, grad psum over dp)."""
    from spmf_tpu import PoissonAutoencoder
    from spmf_tpu.data import ArrayDataset

    rng = np.random.default_rng(4)
    Xa = rng.poisson(1.0, (64, 6)).astype(np.float64)

    def run(mesh):
        data = ArrayDataset({"counts": Xa, "indices": np.arange(64)}).batch(32)
        m = PoissonAutoencoder(data, latent_dim=2, dtype="float64", mesh=mesh)
        return m.fit(batched_data_factory=data, num_steps=2,
                     learning_rate=0.05, sample_size=4, verbose=False,
                     rel_tol=None)

    ref = run(None)
    dp = run(data_parallel_mesh(8))
    assert np.isfinite(dp).all()
    np.testing.assert_allclose(dp, ref, rtol=1e-8)


def test_coo_dense_scatter_composes_with_dp_mesh():
    """sparse_dense_scatter=True under a dp mesh: the on-device scatter
    feeds the mesh dense path and must equal the single-device dense
    energy exactly."""
    from spmf_tpu.data import SparseCounts

    dense = RNG.poisson(0.6, (32, 10)).astype(np.float64)
    sp = SparseCounts.from_dense(dense)

    def build(mesh):
        m = PoissonFactorization(
            latent_dim=3, feature_dim=10, u_tau_scale=0.1, dtype="float64",
            scale_columns=False, sparse_dense_scatter=True, mesh=mesh,
        )
        return m

    single = build(None)
    mesh = data_parallel_mesh(8)
    meshed = build(mesh)
    meshed.surrogate_params = single.surrogate_params
    key = jax.random.PRNGKey(2)
    samples, _ = single._surrogate.sample_and_log_prob(
        single.surrogate_params, key, (3,)
    )
    rows, cols, vals = sp.batch_coo(np.arange(32))
    pad = -(-(len(vals) + 16) // 8) * 8  # divisible by dp=8 for shard_batch
    coo = {
        "coo_rows": np.zeros(pad, np.int32),
        "coo_cols": np.zeros(pad, np.int32),
        "coo_vals": np.zeros(pad),
        "indices": np.arange(32),
    }
    coo["coo_rows"][:len(vals)] = rows
    coo["coo_cols"][:len(vals)] = cols
    coo["coo_vals"][:len(vals)] = vals

    ref = np.asarray(
        single.unormalized_log_prob(
            data={"counts": dense, "indices": np.arange(32)}, **samples
        )
    )
    got = np.asarray(meshed.unormalized_log_prob(data=shard_batch(coo, mesh),
                                                 **samples))
    np.testing.assert_allclose(got, ref, rtol=1e-12)


def test_coo_gather_energy_composes_with_fp_mesh():
    """VERDICT r3 #7 closed: the gather COO energy shards its triplets
    jointly over EVERY >1 mesh axis (dp AND fp), so very-wide-D sparse
    data on an fp-bearing mesh has a training path even when the dense
    slab would exceed the scatter ceiling. The sharded energy must match
    the dense-batch energy exactly, and a non-divisible triplet padding
    must raise the documented error, not a shard_map shape crash."""
    import warnings

    from spmf_tpu.data.sparse import SparseCounts

    rng = np.random.default_rng(0)
    B, D, P = 7, 8, 2  # B=7 defeats the fused/dense-scatter shape check
    dense = rng.poisson(0.8, (B, D)).astype(float)
    mesh = make_mesh((4, 2), ("dp", "fp"))
    m = PoissonFactorization(latent_dim=P, feature_dim=D, u_tau_scale=0.1,
                             dtype="float64", scale_columns=False,
                             fused_likelihood=True, mesh=mesh)
    assert m._coo_energy_supported() and m._coo_energy_mesh_ok()

    sp = SparseCounts.from_dense(dense)
    rows, cols, vals = sp.batch_coo(np.arange(B))
    pad = -(-max(len(vals), 1) // 8) * 8  # multiple of the 8 mesh devices
    coo = {"coo_rows": np.zeros(pad, np.int32),
           "coo_cols": np.zeros(pad, np.int32),
           "coo_vals": np.zeros(pad),
           "indices": np.arange(B)}
    coo["coo_rows"][:len(vals)] = rows
    coo["coo_cols"][:len(vals)] = cols
    coo["coo_vals"][:len(vals)] = vals

    key = jax.random.PRNGKey(0)
    samples, _ = m._surrogate.sample_and_log_prob(m.surrogate_params, key, (2,))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        lp_c = m.unormalized_log_prob(data=coo, **samples)
        # the COO dispatch must have recorded the gather-energy routing
        # (checked before the dense call below overwrites the record)
        assert "gather energy dispatched" in m.fusion_inactive_reason
        lp_d = m.unormalized_log_prob(
            data={"counts": dense, "indices": np.arange(B)}, **samples)
    np.testing.assert_allclose(np.asarray(lp_c), np.asarray(lp_d), rtol=1e-10)

    # non-divisible padded nnz -> the documented ValueError
    bad = {k: (v[:-3] if np.ndim(v) and len(v) == pad else v)
           for k, v in coo.items()}
    with pytest.raises(ValueError, match="must divide the mesh device"):
        m.unormalized_log_prob(data=bad, **samples)


def test_epoch_scan_composes_with_mesh():
    """VERDICT r3 #1: the whole-epoch lax.scan engine path must run under
    a dp x fp mesh — dataset tensors sharded over the mesh, the in-scan
    shuffled gather partitioned — and reproduce the UNMESHED scan
    trajectory exactly: the scan derives its shuffle from the engine key
    chain, so meshed and unmeshed runs consume identical batches, and the
    sharding must not change the math (XLA collectives only)."""
    from spmf_tpu.data import DeviceArrayDataset, as_data_factory

    def run(mesh):
        m = PoissonFactorization(
            latent_dim=P, feature_dim=D, u_tau_scale=0.1, dtype="float64",
            scale_columns=False, mesh=mesh,
        )
        # 32 rows at batch 12 -> 2 full batches + an 8-row remainder (both
        # divisible by dp=4; the remainder path must shard too)
        ds = DeviceArrayDataset({"counts": X, "indices": np.arange(B)},
                                batch_size=12, shuffle=True, seed=0)
        losses = m.fit(batched_data_factory=as_data_factory(ds),
                       num_steps=3, learning_rate=0.05, sample_size=S,
                       seed=7, verbose=False, rel_tol=None)
        return m, losses

    ref_m, ref_losses = run(None)
    assert ref_m.last_fit.extras["epoch_scan"] is True

    mesh = make_mesh((4, 2), ("dp", "fp"))
    m, losses = run(mesh)
    assert m.last_fit.extras["epoch_scan"] is True
    np.testing.assert_allclose(losses, ref_losses, rtol=1e-8)
    # params stayed fp-sharded through the scan carry + best restore
    assert "fp" in str(m.surrogate_params["u"]["loc"].sharding.spec)


def test_epoch_chunk_composes_with_mesh():
    """K-epoch on-device chunks must ride the meshed scan path and stay
    trajectory-identical (f64) to single-epoch meshed dispatches."""
    from spmf_tpu.data import DeviceArrayDataset, as_data_factory

    mesh = make_mesh((4, 2), ("dp", "fp"))

    def run(**kw):
        m = PoissonFactorization(
            latent_dim=P, feature_dim=D, u_tau_scale=0.1, dtype="float64",
            scale_columns=False, mesh=mesh,
        )
        ds = DeviceArrayDataset({"counts": X, "indices": np.arange(B)},
                                batch_size=8, shuffle=True, seed=0)
        losses = m.fit(batched_data_factory=as_data_factory(ds),
                       num_steps=6, learning_rate=0.05, sample_size=S,
                       seed=7, verbose=False, rel_tol=None, patience=2,
                       **kw)
        return m, losses

    m1, single = run(epoch_chunk=1)
    mk, chunked = run(epoch_chunk=3)
    assert mk.last_fit.extras["epoch_chunk"] == 3
    assert chunked == single
    for a, b in zip(jax.tree_util.tree_leaves(m1.surrogate_params),
                    jax.tree_util.tree_leaves(mk.surrogate_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_waic_streaming_kernel_composes_with_mesh():
    """VERDICT r3 #2: the streaming per-row WAIC kernel must keep running
    under a dp x fp mesh (rows dp-local, per-row feature sums psum'd over
    fp) instead of falling back to the (chunk, B, D)-materializing XLA
    path. Meshed waic() must match unmeshed waic() on the same draws."""
    def build(mesh):
        m = PoissonFactorization(
            latent_dim=P, feature_dim=D, u_tau_scale=0.1, dtype="float64",
            scale_columns=False, mesh=mesh, fused_likelihood=True,
        )
        m._fused_interpret = True
        return m

    data = {"counts": X, "indices": np.arange(B)}
    ref = build(None).waic(data=data, num_samples=4, sample_chunk=4)
    mesh = make_mesh((4, 2), ("dp", "fp"))
    meshed = build(mesh).waic(data=data, num_samples=4, sample_chunk=4)
    for k in ("waic", "lppd", "pwaic", "se"):
        # pwaic is a variance of near-identical lls: catastrophic
        # cancellation amplifies the f32 kernel's tile-order differences
        # (abs diff ~1e-8), so it gets an absolute floor
        np.testing.assert_allclose(meshed[k], ref[k], rtol=1e-5,
                                   atol=1e-6, err_msg=k)

    # the per-row kernel itself: sharded output equals the single-device
    # kernel bit-for-bit in structure (psum over fp of per-shard sums)
    from spmf_tpu.ops import (
        fused_poisson_row_loglik,
        fused_poisson_row_loglik_sharded,
    )

    rng = np.random.default_rng(5)
    theta = rng.gamma(1.0, 1.0, (S, B, P)).astype(np.float32)
    v = rng.gamma(1.0, 1.0, (S, P, D)).astype(np.float32)
    phi = rng.gamma(1.0, 0.1, (S, 1, D)).astype(np.float32)
    one = fused_poisson_row_loglik(theta, v, phi, X.astype(np.float32),
                                   1.0, False, True)
    shd = fused_poisson_row_loglik_sharded(
        theta, v, phi, X.astype(np.float32), 1.0, mesh,
        log_transform=False, interpret=True)
    np.testing.assert_allclose(np.asarray(shd), np.asarray(one),
                               rtol=2e-5, atol=1e-4)


def test_coo_row_scorer_composes_with_mesh():
    """The flat-gather COO row scorer (sparse WAIC/log_likelihood, r4)
    under a dp x fp mesh: triplets shard over every >1 axis, per-row
    partial sums psum — meshed waic() over COO batches must match the
    unmeshed evaluation."""
    from spmf_tpu.data import SparseCounts

    rng = np.random.default_rng(11)
    dense = (rng.random((B, D)) < 0.05) * rng.poisson(2.0, (B, D))

    def build(mesh):
        m = PoissonFactorization(
            latent_dim=P, feature_dim=D, u_tau_scale=0.1, dtype="float64",
            scale_columns=False, mesh=mesh,
        )
        # force the COO scorer branch (not the densify fallback)
        m._DENSE_SCATTER_MAX_SLAB_BYTES = 0
        return m

    sp = SparseCounts.from_dense(dense).batch(B, drop_remainder=True).as_coo()
    ref = build(None).waic(data=sp, num_samples=4, sample_chunk=4)
    meshed = build(make_mesh((4, 2), ("dp", "fp"))).waic(
        data=sp, num_samples=4, sample_chunk=4)
    for k in ("waic", "lppd", "pwaic", "se"):
        np.testing.assert_allclose(meshed[k], ref[k], rtol=1e-7,
                                   atol=1e-9, err_msg=k)


def test_epoch_scan_mesh_composes_with_fused_kernel():
    """The production v5e combination: fused Pallas likelihood +
    dp x fp mesh + whole-epoch scan dispatch (shard_map inside lax.scan
    inside the donated jit). Must engage the scan path and train finite."""
    from spmf_tpu.data import DeviceArrayDataset, as_data_factory

    mesh = make_mesh((4, 2), ("dp", "fp"))
    m = PoissonFactorization(
        latent_dim=P, feature_dim=D, u_tau_scale=0.1, dtype="float64",
        scale_columns=False, mesh=mesh, fused_likelihood=True,
    )
    m._fused_interpret = True
    ds = DeviceArrayDataset({"counts": X, "indices": np.arange(B)},
                            batch_size=16, shuffle=True, seed=0)
    losses = m.fit(batched_data_factory=as_data_factory(ds), num_steps=2,
                   learning_rate=0.05, sample_size=S, seed=7,
                   verbose=False, rel_tol=None)
    assert m.last_fit.extras["epoch_scan"] is True
    assert np.isfinite(losses).all()


def test_static_clip_composes_with_mesh():
    """clip='static' under a dp x fp mesh: the single-psum combine must
    match the reference-mode sharded combine on healthy data."""
    mesh = make_mesh((4, 2), ("dp", "fp"))

    def build(mode):
        m = PoissonFactorization(
            latent_dim=P, feature_dim=D, u_tau_scale=0.1, dtype="float64",
            scale_columns=False, mesh=mesh, fused_likelihood=True,
            likelihood_clip=mode,
        )
        m._fused_interpret = True
        return m

    ref = build("reference")
    st = build("static")
    batch = {"counts": jnp.asarray(X), "indices": jnp.arange(B)}
    key = jax.random.PRNGKey(2)
    samples, _ = ref._surrogate.sample_and_log_prob(
        ref.surrogate_params, key, (S,))
    px = np.asarray(ref.unormalized_log_prob_parts(batch, **samples)["x"])
    sx = np.asarray(st.unormalized_log_prob_parts(batch, **samples)["x"])
    np.testing.assert_allclose(sx, px, rtol=1e-6)


def test_fit_routes_dcn_dp_fp_sharding_matches_single_device():
    """Multi-slice (DCN) layout (SURVEY.md §5.8 "psum over ICI, and DCN
    for multi-slice"): a ('dcn', 'dp', 'fp') mesh must train through the
    public fit() with rows sharded jointly over (dcn, dp) and params
    replicated over dcn, reproducing single-device losses."""
    data = {"counts": X, "indices": np.arange(B)}

    ref = _model()
    ref_losses = ref.fit(batched_data_factory=data, num_steps=3,
                         learning_rate=0.05, sample_size=S, seed=7,
                         verbose=False, rel_tol=None)

    mesh = make_mesh((2, 2, 2), ("dcn", "dp", "fp"))
    m = PoissonFactorization(
        latent_dim=P, feature_dim=D, u_tau_scale=0.1, dtype="float64",
        scale_columns=False, mesh=mesh,
    )
    losses = m.fit(batched_data_factory=data, num_steps=3,
                   learning_rate=0.05, sample_size=S, seed=7,
                   verbose=False, rel_tol=None)
    np.testing.assert_allclose(losses, ref_losses, rtol=1e-8)
    # params stayed fp-sharded (and dcn-replicated) through the fit
    spec = m.surrogate_params["u"]["loc"].sharding.spec
    assert "fp" in str(spec) and "dcn" not in str(spec), spec


def test_fused_likelihood_composes_with_dcn_mesh():
    """The fused Pallas likelihood under a multi-slice mesh: rows shard
    over the JOINT ('dcn', 'dp') axes (ops.fused_poisson._row_axes), the
    psum spans dcn + dp + fp."""
    mesh = make_mesh((2, 2, 2), ("dcn", "dp", "fp"))

    def build(fused):
        m = PoissonFactorization(
            latent_dim=P, feature_dim=D, u_tau_scale=0.1, dtype="float64",
            scale_columns=False, mesh=mesh, fused_likelihood=fused,
        )
        m._fused_interpret = True  # CPU: interpret-mode kernels
        return m

    ref = build(False)
    fused = build(True)
    assert fused._can_fuse(X.shape)
    batch = {"counts": jnp.asarray(X), "indices": jnp.arange(B)}
    key = jax.random.PRNGKey(2)
    samples, _ = ref._surrogate.sample_and_log_prob(
        ref.surrogate_params, key, (S,))
    px = np.asarray(ref.unormalized_log_prob_parts(batch, **samples)["x"])
    fx = np.asarray(fused.unormalized_log_prob_parts(batch, **samples)["x"])
    np.testing.assert_allclose(fx, px, rtol=1e-5)

    # a batch that does not divide dcn*dp shards is rejected with the
    # actionable reason, not an opaque shard_map error
    ok, reason = fused._fusion_check((B + 2, D))
    assert not ok and "does not divide mesh axes" in reason


def test_make_multislice_mesh_single_process_shape():
    """Single process (one 'slice' group): the builder still yields a
    well-formed (1, ici...) mesh usable by fit."""
    from spmf_tpu.parallel import make_multislice_mesh

    mesh = make_multislice_mesh(ici_shape=(4, 2), ici_axis_names=("dp", "fp"),
                                devices=jax.devices()[:8])
    assert mesh.axis_names == ("dcn", "dp", "fp")
    assert mesh.shape["dcn"] == 1 and mesh.shape["dp"] == 4
