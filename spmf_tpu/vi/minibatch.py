"""Minibatch stochastic ADVI engine.

Rebuild of ``bayesianquilts.vi.minibatch.fit_surrogate_posterior`` (reference
import: mederrata_spmf/gaussian.py:24) and the ``BayesianModel.fit`` /
``calibrate_advi`` training loop, whose behavior is documented from recorded
notebook outputs (SURVEY.md §2.9):

- per-epoch average / last batch loss reporting,
- "checkpoint" save on every improving epoch,
- plateau detection -> learning-rate decay (x0.99) + best-checkpoint restore,
- rel_tol / abs_tol / num_steps stopping,
- returns the loss trace.

TPU-first design: the inner step is a single jitted function
(sample -> energy -> entropy -> grad -> clip -> Adam update); when a
``jax.sharding.Mesh`` is supplied, batches are sharded over the ``dp`` axis
and — with an ``fp`` mesh axis (``param_sharding='auto'|'fp'``) — the
feature dim D of params and data columns is sharded over ``fp``; XLA inserts
the gradient ``psum`` over dp and the contraction collectives over fp (ICI).
"""
from __future__ import annotations

import os
import uuid
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

__all__ = ["FitResult", "fit_surrogate_posterior"]


@dataclass
class FitResult:
    params: Any
    losses: List[float]
    learning_rate: float
    opt_state: Any = None
    checkpoint_path: Optional[str] = None
    converged: bool = False
    extras: Dict[str, Any] = field(default_factory=dict)


def _fp_axis(mesh):
    """Name of the active feature-parallel mesh axis, or None."""
    if mesh is not None and "fp" in mesh.axis_names and mesh.shape["fp"] > 1:
        return "fp"
    return None


def _axes_tuple(data_axis):
    """The row-sharding axis (or joint (dcn, dp) tuple) as a tuple."""
    return data_axis if isinstance(data_axis, tuple) else (data_axis,)


def _data_axis_size(mesh, data_axis):
    """Total number of row shards (product over the joint row axes)."""
    return int(np.prod([
        mesh.shape[a] for a in _axes_tuple(data_axis)
        if a in mesh.axis_names
    ], dtype=np.int64))


def _device_batch(batch, dtype, mesh, data_axis="dp", multihost=None):
    """Move a dict batch to device: rows sharded over ``data_axis``, and the
    feature (column) dim of 2-D arrays additionally sharded over ``fp`` when
    the mesh has one — the dp x fp layout validated by tests/test_sharding.

    Multi-host (``jax.process_count() > 1``, or ``multihost=True`` for
    tests): every process's factory yields the identical global batch
    (the datasets' shuffles are seeded), and each process materializes ONLY
    its own row shard — ``process_local_rows`` +
    ``jax.make_array_from_process_local_data`` assemble the global array
    without any process device_putting rows it does not own (VERDICT r2 #6;
    the dp axis must span processes evenly, the standard TPU pod layout)."""
    out = {}
    fp = _fp_axis(mesh)
    if multihost is None:
        multihost = jax.process_count() > 1
    for k, v in batch.items():
        if multihost and mesh is not None and all(
                a in mesh.axis_names for a in _axes_tuple(data_axis)) \
                and np.ndim(v) >= 1:
            # slice the process-local rows HOST-side before any device
            # placement: materializing the full global batch on-device
            # first would both ship rows this process does not own and
            # OOM for pod-scale global batches
            from jax.sharding import NamedSharding, PartitionSpec as P

            from spmf_tpu.parallel.distributed import process_local_rows

            host = np.asarray(jax.device_get(v)) if isinstance(v, jax.Array) \
                else np.asarray(v)
            n_rows = host.shape[0]
            axes = [data_axis] + [None] * (host.ndim - 1)
            if (
                fp is not None
                and host.ndim >= 2
                and host.shape[1] > 1
                and host.shape[1] % mesh.shape[fp] == 0
            ):
                axes[1] = fp
            if np.issubdtype(host.dtype, np.floating):
                host = host.astype(dtype)
            start, stop = process_local_rows(n_rows)
            out[k] = jax.make_array_from_process_local_data(
                NamedSharding(mesh, P(*axes)), host[start:stop]
            )
            continue
        arr = jnp.asarray(v)
        if jnp.issubdtype(arr.dtype, jnp.floating):
            arr = arr.astype(dtype)
        if mesh is not None and arr.ndim >= 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            axes = [data_axis] + [None] * (arr.ndim - 1)
            if (
                fp is not None
                and arr.ndim >= 2
                and arr.shape[1] > 1
                and arr.shape[1] % mesh.shape[fp] == 0
            ):
                axes[1] = fp
            arr = jax.device_put(arr, NamedSharding(mesh, P(*axes)))
        out[k] = arr
    return out


def _batch_rows(batch):
    """Row count of a dict batch — prefer the canonical keys (a COO batch's
    first value is nnz-sized, not row-sized)."""
    for k in ("indices", "counts", "data"):
        if k in batch:
            return batch[k].shape[0]
    return next(iter(batch.values())).shape[0]


def _snapshot(tree):
    return jax.tree_util.tree_map(np.asarray, jax.device_get(tree))


def _host_tree(tree):
    """``jax.device_get`` that tolerates cross-host-sharded leaves
    (VERDICT r3 #3: a dp x fp layout spanning processes makes params
    non-fully-addressable, and a plain device_get raises on a real pod):
    addressable arrays fetch directly; the rest are process-allgathered,
    so every host ends with the full global value. The allgather is a
    COLLECTIVE — all processes must call this together (they do: the fit
    loop's control flow is identical on every host)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    out = []
    for x in leaves:
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            from jax.experimental import multihost_utils

            x = multihost_utils.process_allgather(x, tiled=True)
        out.append(np.asarray(jax.device_get(x)))
    return jax.tree_util.tree_unflatten(treedef, out)


@jax.jit
def _copy_arrays(tree):
    return jax.tree_util.tree_map(jnp.copy, tree)


def _device_copy(tree):
    """On-device copy of a pytree (new buffers; shardings preserved): best-
    params tracking without host round-trips — the donated jitted step
    invalidates prior buffers, so a real copy is required, but it stays on
    the chip (~0.1 ms for 70 MB) instead of a device_get through the host
    (which costs ~50 ms/epoch through the TPU tunnel). Jitted: ONE dispatch
    per tree, not one per leaf (each eager dispatch pays tunnel latency)."""
    if all(isinstance(x, jax.Array)
           for x in jax.tree_util.tree_leaves(tree)):
        return _copy_arrays(tree)
    return jax.tree_util.tree_map(
        lambda x: x.copy() if isinstance(x, jax.Array) else x, tree
    )


def fit_surrogate_posterior(
    energy_fn: Callable,  # (batch_dict, samples_dict, prior_weight) -> (S,) log-prob
    surrogate,            # SurrogatePosterior
    params,               # surrogate parameter pytree
    batched_data_factory: Callable,  # () -> iterable of dict batches
    dataset_size: Optional[int] = None,
    batch_size: Optional[int] = None,
    sample_size: int = 8,
    sample_batches: int = 1,
    num_steps: int = 100,
    learning_rate: float = 0.1,
    decay_rate: float = 0.99,
    abs_tol: Optional[float] = None,
    rel_tol: Optional[float] = 1e-4,
    clip_value: float = 5.0,
    patience: int = 3,
    convergence_window: int = 8,
    seed: int = 0,
    dtype=jnp.float32,
    mesh=None,
    checkpoint_dir: Optional[str] = None,
    verbose: bool = True,
    opt_state=None,
    profile_dir: Optional[str] = None,
    remat_sampling: Optional[bool] = None,
    param_sharding: str = "auto",
    decay_schedule: Optional[str] = None,
    prefetch: int = 2,
    resume_from: Optional[str] = None,
    elbo_estimator: str = "standard",
    antithetic: bool = False,
    epoch_scan: Optional[bool] = None,
    epoch_chunk: Optional[int] = None,
    checkpoint_full_state: bool = True,
) -> FitResult:
    """Run minibatch ADVI. See module docstring for reproduced semantics.

    The per-row displayed loss is -ELBO / rows-in-batch with the ELBO
    estimated by ``sample_size`` x ``sample_batches`` reparameterized
    samples: mean_s[ energy(batch, z_s) - log q(z_s) ].
    ``prior_weight = batch_size / dataset_size`` is forwarded to the energy
    (the Poisson/Bernoulli reference models deliberately ignore it —
    reference poisson.py:577 quirk — the Gaussian model honours it).
    ``antithetic`` mirrors the surrogate base draws across the (even)
    sample axis — each draw keeps its marginal law so the ELBO estimate
    stays unbiased, but the pairs are negatively coupled, reducing
    gradient variance per sample (measured: docs/antithetic_experiment.json;
    requires a pathwise gamma sampler, i.e. not ``gamma_sampler='exact'``;
    the fused IG kernel mirrors its in-kernel uniforms natively). The
    value ``'stratified'`` additionally couples the S/2 pairs with a
    randomly-shifted lattice of base uniforms (pair p shifts every
    uniform by p/(S/2); exact bit-domain arithmetic, marginals unchanged
    — ops.gamma.lattice_uniform): a no-op for S=2, measured variance
    reduction for S>=4 (docs/stratified_experiment.json).
    ``prefetch`` sets how many batches the background assembly thread runs
    ahead of the device (0 disables threading). ``epoch_scan`` (default
    auto) runs each whole epoch as ONE jitted ``lax.scan`` dispatch when
    the data source is a device-resident ``DeviceArrayDataset`` in a
    single process — shuffle, batch gathers, and every train step
    execute on-chip with no per-batch host dispatches (the per-batch
    Python loop costs ~6 eager dispatches/batch through the remote-device
    tunnel, which at production batch sizes rivals the step itself).
    Composes with a ``mesh``: the dataset tensors are sharded over dp
    (rows) x fp (wide columns), the in-scan shuffled gather compiles to a
    partitioned gather, and each batch is constrained back to the dp x fp
    layout the sharded step math expects — a v5e-8 data-parallel fit
    rides the same single-dispatch epochs as a single chip (multi-host
    fits keep the general loop: their batches are assembled per-process
    on host). A ``DeviceSparseCounts`` source (HBM CSR) can take the
    scan path on a single unmeshed device with an EXPLICIT
    ``epoch_scan=True``: each batch's padded COO triplets are assembled
    in-scan by the dataset's static-shape gather, and the per-batch nnz
    totals ride out for the pad-overflow audit. Auto does not engage it
    for sparse sources: the general loop's eager assembles already
    pipeline behind the step, and the scan measured ~5% slower (and the
    K-epoch chunk 2x slower) interleaved at the production sparse config
    (benchmarks/sparse_fit_ab.py).
    ``epoch_chunk`` (scan path only) additionally runs K epochs per
    dispatch with the per-epoch best/plateau/divergence control flow
    executed on device — the default (None) engages K=8 adaptively once
    steady-state epochs measure under ~1 s (round-trip-dominated) AND at
    least 3 chunks of work remain (the K-epoch scan is its own XLA
    executable; engaging for a handful of epochs would pay a fresh
    compile to save a few dispatches). The decision sequence is the host
    loop's exactly (bit-identical in f64 — tested; in f32 the chunked
    decisions are made in the compute dtype on device and may differ from
    host float64 means at 1-ulp ties). Checkpoint files are written once
    per chunk (at the last improving epoch), and rel/abs-tol early
    stopping is evaluated at chunk granularity: up to K-1 post-threshold
    epochs execute and appear in the loss trace / best-params tracking.
    An explicit ``epoch_chunk`` larger than the remaining epochs is
    clamped (one chunk covering the remainder); the adaptive default
    instead falls back to single-epoch dispatches for tails shorter than
    K rather than compile a second scan shape. ``resume_from`` restores
    an engine checkpoint before training — a .npz path, or a directory
    (the newest .npz under it, recursively): preemption recovery beyond
    the reference's in-loop-only restore (SURVEY.md §5.3/5.4). With
    ``checkpoint_full_state`` (the default), checkpoints carry the Adam
    moments and the control state (decayed lr, best loss, plateau stall
    counter) alongside the params, and a resume continues all of them —
    the optimizer does not re-warm from zero moments and the lr schedule
    does not reset to ``learning_rate``. Params-only checkpoints (older
    files, or ``checkpoint_full_state=False``) restore params and start
    the optimizer/control state fresh. Full-state files remain loadable
    by ``utils.checkpoint.load_pytree(path, like=params)`` (the params
    keep their leaf naming); an explicit ``opt_state=`` argument takes
    precedence over a checkpoint's optimizer state (with a warning).
    """
    say = print if verbose else (lambda *a, **k: None)

    from spmf_tpu.utils.debug import warn_known_bad_sample_dim

    warn_known_bad_sample_dim(sample_size, "sample_size")

    if decay_schedule == "reference":
        # trajectory-shape parity: the reference engine's observed plateau
        # decays are 0.05 -> 0.0466 -> 0.0421 (SURVEY.md §2.9), i.e. ~x0.93
        # per plateau (first transition exactly; the second implies 0.903,
        # within the fit residual of the two recorded prints). The default
        # 0.99 converges to the same endpoint ~4x sooner (docs/PARITY.md).
        decay_rate = 0.93
    elif decay_schedule not in (None, "default"):
        raise ValueError(f"unknown decay_schedule {decay_schedule!r}")

    prior_weight = 1.0
    if dataset_size is not None and batch_size is not None:
        prior_weight = float(batch_size) / float(dataset_size)

    epoch_offset = 0
    _resume_opt_leaves = None  # flat optimizer leaves from a full checkpoint
    _resume_meta = None  # control-state dict (lr/best_loss/stall) if present
    if resume_from is not None:
        import re

        from spmf_tpu.utils.checkpoint import load_fit_state

        def _epoch_tag(p):
            # checkpoints are {run_id}-{epoch}.npz: order by the epoch
            # tag, NOT mtime — restoring a checkpoint dir to a fresh
            # node (cp -r / gsutil) rewrites mtimes in arbitrary order
            m = re.search(r"-(\d+)\.npz$", os.path.basename(p))
            return (int(m.group(1)) if m else -1, os.path.getmtime(p))

        path = resume_from
        if os.path.isdir(path):
            import glob

            cands = sorted(
                glob.glob(os.path.join(path, "**", "*.npz"), recursive=True),
                key=_epoch_tag,
            )
            if not cands:
                raise FileNotFoundError(f"no .npz checkpoints under {path}")
            path = cands[-1]
        # continue the global epoch numbering: this run's checkpoint tags
        # start where the restored one left off, so tag-major ordering stays
        # monotonic across repeated preemptions (a second resume must prefer
        # run 2's epoch-10 checkpoint over run 1's epoch-50 one)
        epoch_offset = max(_epoch_tag(path)[0], 0)
        loaded, _resume_opt_leaves, _resume_meta = load_fit_state(
            path, params_like=params
        )
        if _resume_meta is not None:
            # the recorded global epoch is the robust source for the tag
            # continuation (a renamed/copied file loses the filename tag)
            epoch_offset = max(epoch_offset,
                               int(_resume_meta.get("epoch", 0)))
        # cast to the engine dtypes (a checkpoint from an f32 TPU run must
        # not silently downgrade an f64 parity refit)
        params = jax.tree_util.tree_map(
            lambda a, b: jnp.asarray(a, jnp.asarray(b).dtype), loaded, params
        )
        say(f"Resumed surrogate params from {path}")

    # Mesh placement (SURVEY.md §5.7/5.8): rows over 'dp'; with
    # param_sharding='fp'/'auto' and an fp mesh axis, the feature dim D of
    # the surrogate params is sharded over 'fp' (others replicated). XLA
    # inserts the grad psum over dp and the contraction collectives over fp.
    data_axis = "dp"
    if mesh is not None:
        from spmf_tpu.parallel.mesh import replicate, shard_params_feature_dim

        if "dp" not in mesh.axis_names:
            data_axis = mesh.axis_names[0]
        if ("dcn" in mesh.axis_names and mesh.shape["dcn"] > 1
                and data_axis != "dcn"):
            # multi-slice layout (make_multislice_mesh): rows shard jointly
            # over (dcn, dp) — the gradient psum's dcn leg is the only
            # collective that crosses the data-center network; params
            # replicate over dcn (fp contraction traffic stays intra-slice)
            data_axis = ("dcn", data_axis)
        fp = _fp_axis(mesh)
        mode = param_sharding
        if mode == "auto":
            mode = "fp" if fp is not None else "replicated"
        if mode == "fp" and fp is not None:
            params = shard_params_feature_dim(params, mesh, fp)
        else:
            params = replicate(params, mesh)

    # hyperparam_dtype pins the injected lr to f32: without it, update()
    # re-canonicalizes lr to f64 under jax_enable_x64 while init() and the
    # plateau writes use f32 — a dtype flip the epoch-scan carry rejects
    optimizer = optax.inject_hyperparams(
        lambda lr: optax.chain(optax.clip(clip_value), optax.adam(lr)),
        hyperparam_dtype=jnp.float32,
    )(lr=learning_rate)
    if opt_state is None:
        opt_state = optimizer.init(params)
        if _resume_opt_leaves is not None:
            # full-state resume: the checkpoint carries the Adam moments;
            # restore them into the freshly-initialized state's structure,
            # dtypes, and device/sharding placement (a checkpoint taken on
            # one layout must come up on this run's layout)
            treedef = jax.tree_util.tree_structure(opt_state)
            init_flat = jax.tree_util.tree_leaves(opt_state)
            if len(_resume_opt_leaves) == len(init_flat):
                restored = []
                for a, b in zip(_resume_opt_leaves, init_flat):
                    arr = jnp.asarray(a, jnp.asarray(b).dtype)
                    sh = getattr(b, "sharding", None)
                    # re-place only onto real (mesh) shardings: device_put
                    # onto a single-device sharding COMMITS the array, and
                    # a committed local scalar (optax's step count, which
                    # init creates on the default device) can then no
                    # longer mix with global-mesh-sharded leaves in the
                    # jitted step on a multi-host mesh
                    if sh is not None and not isinstance(
                            sh, jax.sharding.SingleDeviceSharding):
                        arr = jax.device_put(arr, sh)
                    restored.append(arr)
                opt_state = jax.tree_util.tree_unflatten(treedef, restored)
            else:  # different optimizer config (e.g. clip chain changed)
                import warnings

                warnings.warn(
                    "resume_from checkpoint has "
                    f"{len(_resume_opt_leaves)} optimizer leaves but this "
                    f"run's optimizer has {len(init_flat)}; restoring "
                    "params only (fresh optimizer state)",
                    RuntimeWarning,
                )
                _resume_meta = None
    elif _resume_opt_leaves is not None:
        import warnings

        warnings.warn(
            "both opt_state= and a full-state resume_from checkpoint were "
            "given; the explicit opt_state wins (checkpoint optimizer/"
            "control state ignored)",
            RuntimeWarning,
        )
        _resume_meta = None
    # best-checkpoint tracking uses on-device copies (_device_copy), which
    # preserve the step's steady-state device layout (re-feeding that exact
    # layout avoids jit recompiles on restore). The user-visible contract —
    # returned params keep the layout the caller passed in (e.g.
    # param_sharding='replicated') — is re-applied ONCE at the end with a
    # device-side device_put (no host hop).
    param_shardings = (
        jax.tree_util.tree_map(lambda x: getattr(x, "sharding", None), params)
        if mesh is not None else None
    )

    if elbo_estimator == "stl":
        # "sticking the landing" (Roeder et al. 2017): evaluate log q with
        # STOPPED variational parameters so only the pathwise sample term
        # carries gradient — drops the score term (zero in expectation),
        # removing its variance, which dominates near the optimum.
        # Unbiased; the density is evaluated in PRE-bijector space via the
        # samplers' logq_params seam (a constrained-space inverse would
        # clamp softplus-floored samples and overflow their gradients).
        # Measured on the parity config: SLOWER convergence here — the
        # score term acts as a control variate for the heavy-tailed
        # horseshoe auxiliaries (docs/stl_experiment.json); opt-in.
        def draw(p_, k_):
            p_stop = jax.tree_util.tree_map(jax.lax.stop_gradient, p_)
            return surrogate.sample_and_log_prob(
                p_, k_, (sample_size,), logq_params=p_stop,
                antithetic=antithetic,
            )
    elif elbo_estimator == "standard":
        draw = lambda p_, k_: surrogate.sample_and_log_prob(
            p_, k_, (sample_size,), antithetic=antithetic)
    else:
        raise ValueError(f"unknown elbo_estimator {elbo_estimator!r}")
    if remat_sampling is None:
        # the fused Pallas IG sampler's RNG-replay VJP is already
        # residual-free, so rematerializing it just re-runs the kernel
        # (measured 18.3 -> 48 ms at D=20k); the XLA samplers still win
        # from remat (+34% r1)
        remat_sampling = getattr(surrogate, "gamma_sampler", "") != "fused"
    if remat_sampling:
        # rematerialize the surrogate sampling in the backward pass instead
        # of storing its residuals: the pipeline is memory-bound, and the
        # random draws replay bit-identically from the same key
        # (measured +34% step throughput at D=20k on v5e)
        draw = jax.checkpoint(
            draw, policy=jax.checkpoint_policies.nothing_saveable
        )

    def _step_math(p, o, key, batch):
        def loss_fn(p_):
            total = 0.0
            for k in jax.random.split(key, sample_batches):
                samples, logq = draw(p_, k)
                lp = energy_fn(batch, samples, prior_weight)
                total = total + jnp.mean(lp - logq)
            rows = _batch_rows(batch)
            return -(total / sample_batches) / rows

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, o = optimizer.update(grads, o, p)
        p = optax.apply_updates(p, updates)
        return p, o, loss

    step = partial(jax.jit, donate_argnums=(0, 1))(_step_math)

    # Whole-epoch fast path (TPU-native): with a device-resident dataset on
    # a single unmeshed device, the entire epoch — shuffle permutation,
    # batch gathers, every train step — is ONE jitted lax.scan dispatch.
    # The general per-batch loop pays ~6 eager dispatches per batch through
    # the remote-device tunnel (key split, index slice, per-tensor gathers,
    # step), which at production batch sizes rivals the 54 ms step itself
    # (fit() measured 165k rows/sec vs the raw step's 303k at B=16384).
    # Loss-trace/best/plateau/divergence semantics are identical: the scan
    # returns the per-batch losses and all control flow stays per-epoch on
    # host. The sharded/multi-host/host-streamed paths keep the general
    # loop (their batches are assembled or re-placed off-device).
    _scan_ds = None
    _sparse_scan = False
    if epoch_scan is not False:
        from spmf_tpu.data import DeviceArrayDataset
        from spmf_tpu.data.sparse import DeviceSparseCounts

        _src = getattr(batched_data_factory, "source", None)
        eligible = jax.process_count() == 1
        _mesh_nontrivial = mesh is not None and any(
            mesh.shape[a] > 1 for a in mesh.axis_names)
        if isinstance(_src, DeviceArrayDataset) and eligible:
            _scan_ds = _src
        elif (isinstance(_src, DeviceSparseCounts) and eligible
                and epoch_scan is not False and not _mesh_nontrivial):
            # sparse whole-epoch scan (AUTO since r5): the epoch's COO
            # stream is decoded ONCE in-trace (DeviceSparseCounts epoch
            # decode — scatter+cumsum run decode, no per-batch
            # searchsorted) and each in-scan batch is three dynamic
            # slices; per-batch nnz totals ride out of the scan for the
            # overflow check. The r4 opt-in verdict (scan ~5% slower)
            # measured the old per-batch in-scan assembly; with the
            # epoch decode the scan wins (130.9k vs 125.7k rows/sec at
            # B=8192, docs/sparse_bench.json r5). Meshed sparse training
            # keeps the general loop (the COO energy shard_maps per
            # batch there).
            _scan_ds = _src
            _sparse_scan = True
        elif epoch_scan:
            raise ValueError(
                "epoch_scan=True requires a DeviceArrayDataset source "
                "(meshes are fine) or a DeviceSparseCounts source (on a "
                "trivial mesh), and a single process; got "
                f"source={type(_src).__name__}, "
                f"processes={jax.process_count()}"
            )

    run_epoch = None
    _sparse_block = None
    if _scan_ds is not None:
        ds = _scan_ds
        n_rows_ds = ds.num_rows
        bs = int(ds._batch_size or n_rows_ds)
        nb = n_rows_ds // bs
        if _sparse_scan and getattr(ds, "block_rows", None):
            # block-aligned layout: batches are Rb whole blocks; the
            # iterator contract (remainder rows dropped with opt-in)
            # lives in _iter_blocked — reuse its validation
            _sparse_block = int(ds.block_rows)
            if bs % _sparse_block:
                raise ValueError(
                    f"batch size {bs} must be a multiple of "
                    f"block_rows={_sparse_block}")
            _Rb = bs // _sparse_block
            nb = ds.n_blocks // _Rb
            dropped = n_rows_ds - nb * bs
            if dropped and not ds._drop_remainder:
                raise ValueError(
                    f"the blocked layout drops the {dropped}-row "
                    f"remainder (N={n_rows_ds}, batch={bs}, block_rows="
                    f"{_sparse_block}): pass drop_remainder=True to "
                    "batch() to accept this"
                )
            rem = 0
        elif _sparse_scan:
            # mirror the DeviceSparseCounts iterator contract: static
            # per-batch shapes mean the remainder is DROPPED, and only
            # with the caller's opt-in
            if n_rows_ds % bs and not ds._drop_remainder:
                raise ValueError(
                    f"DeviceSparseCounts drops the {n_rows_ds % bs}-row "
                    f"remainder (N={n_rows_ds}, batch={bs}, static "
                    "per-batch compile): pass drop_remainder=True to "
                    "batch() to accept this, or a batch size dividing N"
                )
            rem = 0
        else:
            rem = 0 if ds._drop_remainder else n_rows_ds % bs
        if nb == 0:
            if rem == 0:
                raise ValueError(
                    "batched_data_factory() yields no batches — check "
                    "batch_size/drop_remainder vs dataset size"
                )
            nb, bs, rem = 1, rem, 0
        do_shuffle = bool(ds._shuffle)
        # tensors ride in as ARGUMENTS, not closure constants: closed-over
        # arrays serialize into the remote-compile request body (the tunnel
        # rejects multi-GB bodies with HTTP 413) and pin an extra executable
        # reference; as arguments they are passed by device handle
        _cast = lambda v: (v.astype(dtype)  # noqa: E731
                           if jnp.issubdtype(v.dtype, jnp.floating) else v)
        if _sparse_block:
            ds_tensors = {
                "blk": {"cols": ds.cols_blk, "vals": _cast(ds.vals_blk),
                        "rowl": ds.rowl_blk},
                "extras": {k: _cast(v) for k, v in ds.extras.items()},
            }
        elif _sparse_scan:
            _coo_pad = ds._pad(bs)
            ds_tensors = {
                "csr": {"indptr": ds.indptr, "cols": ds.indices,
                        "vals": _cast(ds.data)},
                "extras": {k: _cast(v) for k, v in ds.extras.items()},
            }
        else:
            ds_tensors = {k: _cast(v) for k, v in ds.tensors.items()}

        # Mesh composition (VERDICT r3 #1): the dataset tensors live
        # SHARDED across the mesh — rows over dp, wide column dims over fp
        # (each device holds only its tile); the in-scan shuffled gather
        # then compiles to a partitioned gather (local gather + masked
        # reduce-scatter over dp — batch-sized communication, never a
        # dataset-sized all-gather on the output side), and each gathered
        # batch is re-constrained to the dp x fp layout the sharded step
        # math (fused kernels, fp param contractions) already expects.
        # Without this, a meshed fit fell back to the per-batch eager loop
        # whose dispatch overhead the scan path was built to eliminate
        # (~55 ms/batch measured, docs/ROADMAP.md 4b).
        _constrain_batch = None
        if mesh is not None and any(
                mesh.shape[a] > 1 for a in mesh.axis_names):
            # trivial (all-size-1) meshes skip the plumbing entirely: the
            # device_put/with_sharding_constraint round-trips measured a
            # ~13% epoch overhead on a (1,1) mesh with nothing to shard
            # (docs/mesh_scan_tpu_check.json)
            from jax.sharding import NamedSharding, PartitionSpec as P

            _fp = _fp_axis(mesh)
            _dp_n = _data_axis_size(mesh, data_axis)

            def _row_spec(nrows, arr):
                axes = [None] * arr.ndim
                if _dp_n > 1 and nrows % _dp_n == 0:
                    axes[0] = data_axis
                if (_fp is not None and arr.ndim >= 2 and arr.shape[1] > 1
                        and arr.shape[1] % mesh.shape[_fp] == 0):
                    axes[1] = _fp
                return NamedSharding(mesh, P(*axes))

            ds_tensors = {
                k: jax.device_put(v, _row_spec(n_rows_ds, v))
                for k, v in ds_tensors.items()
            }

            def _constrain_batch(b):
                return {
                    k: jax.lax.with_sharding_constraint(
                        v, _row_spec(v.shape[0], v))
                    for k, v in b.items()
                }

        def _epoch_math(p, o, key, tensors):
            """One epoch (shuffle, batch scan, remainder) as traced jax.
            Returns per-batch losses and per-batch assembled-nnz totals
            (zeros on the dense path) — the sparse scan's static pad
            cannot be overflow-checked in-trace without a host sync, so
            the totals ride out for DeviceSparseCounts.check_overflow."""
            perm_key, step_key = jax.random.split(key)
            if _sparse_block:
                # block-aligned: shuffle BLOCK ids; each batch is one
                # tiny 2-D row gather of the aligned tables
                idx = (jax.random.permutation(perm_key, ds.n_blocks)
                       if do_shuffle
                       else jnp.arange(ds.n_blocks)).astype(jnp.int32)
            else:
                idx = (jax.random.permutation(perm_key, n_rows_ds)
                       if do_shuffle else jnp.arange(n_rows_ds))

            _ep = None
            if _sparse_scan and not _sparse_block:
                # decode the WHOLE shuffled epoch's COO stream ONCE
                # (static size = total nnz; scatter+cumsum run decode) —
                # each in-scan batch is then three dynamic slices instead
                # of a per-batch searchsorted assembly (the r4 scan path's
                # 5%-slower verdict was that per-batch decode)
                _ep = type(ds)._epoch_decode_math(
                    tensors["csr"]["indptr"], tensors["csr"]["cols"],
                    tensors["csr"]["vals"],
                    idx[:nb * bs].astype(jnp.int32), _coo_pad)

            def gather(start, size):
                if _sparse_block:
                    ids = jax.lax.dynamic_slice_in_dim(
                        idx, (start // bs) * _Rb, _Rb)
                    b = dict(type(ds)._blocked_take_math(
                        tensors["blk"], ids, _sparse_block))
                    sl = b["indices"]
                    for k, v in tensors["extras"].items():
                        b[k] = jnp.take(v, sl, axis=0)
                    return b, jnp.zeros((), jnp.int32)
                if _sparse_scan:
                    b = dict(type(ds)._epoch_take_math(
                        _ep, start // bs, bs, _coo_pad))
                    nnz = b.pop("coo_nnz")
                    sl = b["indices"]
                    for k, v in tensors["extras"].items():
                        b[k] = jnp.take(v, sl, axis=0)
                    return b, nnz
                sl = jax.lax.dynamic_slice_in_dim(idx, start, size)
                b = {k: jnp.take(v, sl, axis=0)
                     for k, v in tensors.items()}
                b = _constrain_batch(b) if _constrain_batch else b
                return b, jnp.zeros((), jnp.int32)

            def body(carry, args):
                start, k_ = args
                batch, nnz = gather(start, bs)
                p_, o_, loss = _step_math(*carry, k_, batch)
                return (p_, o_), (loss, nnz)

            keys = jax.random.split(step_key, nb + (1 if rem else 0))
            (p, o), (losses_arr, nnz_arr) = jax.lax.scan(
                body, (p, o), (jnp.arange(nb) * bs, keys[:nb])
            )
            if rem:
                batch_rem, nnz_rem = gather(nb * bs, rem)
                p, o, loss_rem = _step_math(p, o, keys[nb], batch_rem)
                losses_arr = jnp.concatenate([losses_arr, loss_rem[None]])
                nnz_arr = jnp.concatenate([nnz_arr, nnz_rem[None]])
            return p, o, losses_arr, nnz_arr

        @partial(jax.jit, donate_argnums=(0, 1))
        def _run_epoch_impl(p, o, key_data, tensors):
            return _epoch_math(p, o, jax.random.wrap_key_data(key_data),
                               tensors)

        def run_epoch(p, o, key_data):
            p, o, losses_arr, nnz_arr = _run_epoch_impl(
                p, o, key_data, ds_tensors)
            if _sparse_scan:
                ds._pending_nnz.append(nnz_arr)
                # amortized overflow audit (one tiny fetch; the epoch just
                # completed, so this does not stall the pipeline)
                if len(ds._pending_nnz) >= 8:
                    ds.check_overflow()
            return p, o, losses_arr

        def _select(pred, a, b):
            """Per-leaf where: a if pred else b (structures must match)."""
            return jax.tree_util.tree_map(
                lambda x, y: jnp.where(pred, x, y), a, b
            )

        @partial(jax.jit, donate_argnums=(0, 1, 2, 3, 4, 5, 6))
        def _run_chunk_impl(p, o, bp, bo, bloss, stall, lr, kds, tensors):
            """K epochs in ONE dispatch with the engine's per-epoch control
            flow executed on device: best-params tracking, divergence
            restore (lr x0.5), and plateau decay+restore (lr x decay_rate)
            as lax selects — the exact decision sequence of the host loop,
            so chunked and single-epoch runs produce identical
            trajectories. Returns per-epoch batch losses and event flags
            (improved/plateau/finite) so the host can replay prints,
            checkpoint tags, and convergence checks."""
            decay = jnp.asarray(decay_rate, jnp.float32)
            pat = jnp.asarray(patience, jnp.int32)

            def epoch_body(carry, kd):
                p_, o_, bp_, bo_, bloss_, stall_, lr_ = carry
                p_, o_, losses_arr, nnz_arr = _epoch_math(
                    p_, o_, jax.random.wrap_key_data(kd), tensors
                )
                # decisions are made in the engine compute dtype (the
                # bloss carry's): mixed-precision params can promote the
                # loss above it, which would flip the carry type
                eloss = jnp.mean(losses_arr).astype(bloss_.dtype)
                finite = jnp.isfinite(eloss)
                improved = finite & (eloss < bloss_)
                stall_ = jnp.where(
                    finite, jnp.where(improved, 0, stall_ + 1), stall_
                )
                plateau = finite & (stall_ >= pat)
                bp_ = _select(improved, p_, bp_)
                bo_ = _select(improved, o_, bo_)
                bloss_ = jnp.where(improved, eloss, bloss_)
                lr_ = jnp.where(
                    ~finite, lr_ * 0.5, jnp.where(plateau, lr_ * decay, lr_)
                )
                restore = (~finite) | plateau
                o_restored = bo_._replace(
                    hyperparams=dict(bo_.hyperparams,
                                     lr=lr_.astype(jnp.float32))
                )
                p_ = _select(restore, bp_, p_)
                o_ = _select(restore, o_restored, o_)
                stall_ = jnp.where(plateau, 0, stall_)
                flags = jnp.stack([improved, plateau, finite])
                return (p_, o_, bp_, bo_, bloss_, stall_, lr_), (
                    losses_arr, flags, nnz_arr,
                )

            carry, (losses_k, flags_k, nnz_k) = jax.lax.scan(
                epoch_body, (p, o, bp, bo, bloss, stall, lr), kds
            )
            return carry, losses_k, flags_k, nnz_k

        def run_chunk(p, o, bp, bo, bloss, stall, lr, kds):
            carry, losses_k, flags_k, nnz_k = _run_chunk_impl(
                p, o, bp, bo,
                jnp.asarray(bloss, dtype=dtype),
                jnp.asarray(stall, jnp.int32),
                jnp.asarray(lr, jnp.float32),
                kds, ds_tensors,
            )
            if _sparse_scan:
                ds._pending_nnz.append(nnz_k.reshape(-1))
                # overflow audit once per chunk (a chunk is K epochs, so
                # this matches run_epoch's every-8-epochs cadence and a
                # truncated pad can't persist through per-chunk checkpoints)
                ds.check_overflow()
            return carry, losses_k, flags_k

    @jax.jit
    def eval_loss(p, key, batch):
        samples, logq = surrogate.sample_and_log_prob(p, key, (sample_size,))
        lp = energy_fn(batch, samples, prior_weight)
        return -jnp.mean(lp - logq) / _batch_rows(batch)

    rng = jax.random.PRNGKey(seed)

    ckpt_path = None
    run_id = str(uuid.uuid4())
    if jax.process_count() > 1 and checkpoint_dir is not None:
        # every process must agree on the run directory and file names
        # (process 0's files ARE the checkpoint; per-process uuids would
        # scatter the resumable state across directories)
        from jax.experimental import multihost_utils

        run_id = bytes(
            np.asarray(
                multihost_utils.broadcast_one_to_all(
                    np.frombuffer(run_id.encode("ascii"), np.uint8)
                )
            )
        ).decode("ascii")
    if checkpoint_dir is not None:
        ckpt_path = os.path.join(checkpoint_dir, run_id)
        os.makedirs(ckpt_path, exist_ok=True)

    def save_ckpt(tree_np, tag, opt_tree=None, control=None):
        if ckpt_path is None:
            return None
        from spmf_tpu.utils.checkpoint import save_fit_state, save_pytree

        path = os.path.join(ckpt_path, f"{run_id}-{int(tag) + epoch_offset}.npz")
        # gather BEFORE the process-0 gate: _host_tree's allgather of
        # cross-host-sharded leaves is a collective every process joins
        tree_np = _host_tree(tree_np)
        if opt_tree is not None:
            opt_tree = _host_tree(opt_tree)
        if jax.process_count() > 1 and jax.process_index() != 0:
            return path  # process 0 writes; others report the same path
        if checkpoint_full_state and opt_tree is not None:
            # full-state checkpoint: params stay under load_pytree's leaf
            # naming (params-only consumers read the file unchanged), plus
            # the Adam moments and the control state a resume continues
            # from — lr/best_loss/stall at save time (the host mirrors, or
            # the device carry when the chunk path passes it — the device
            # scalars are authoritative there and round-trip exactly), and
            # the GLOBAL epoch tag so a chain of preemptions keeps
            # monotonic numbering even if a file is renamed/copied
            c_loss, c_stall, c_lr = (
                control if control is not None else (best_loss, stall, lr)
            )
            save_fit_state(
                path,
                tree_np,
                opt_tree,
                meta={
                    "lr": float(np.float32(c_lr)),
                    "best_loss": float(c_loss),
                    "stall": int(c_stall),
                    "epoch": int(tag) + epoch_offset,
                },
            )
        else:
            save_pytree(path, tree_np)
        return path

    # Initial loss on the first batch (reference prints "Initial loss: ...").
    # Device-resident datasets expose peek_batch (a contiguous slice) so
    # this eval doesn't pay a shuffled gather whose HBM temp is
    # dataset-sized (data/__init__.py:peek_batch). NOTE it is not purely
    # cosmetic: initial_loss is returned as losses[0] and enters the first
    # rel-tol window — on row-ordered datasets a contiguous [0:bs) slice
    # can be unrepresentative of the dataset average (it never seeds
    # best_loss, so training decisions are unaffected; r3 advisor note).
    _src = getattr(batched_data_factory, "source", None)
    if hasattr(_src, "peek_batch"):
        first_batch = _src.peek_batch()
    else:
        first_batch = next(iter(batched_data_factory()))
    rng, k0 = jax.random.split(rng)
    initial_loss = float(eval_loss(params, k0, _device_batch(first_batch, dtype, mesh, data_axis)))
    say(f"Initial loss: {initial_loss}")

    if epoch_offset > 0:
        # resumed runs fold the restored global epoch into the key chain
        # that derives the TRAINING keys (after the display-only initial
        # eval, which stays comparable across runs): with the same seed, a
        # resume would otherwise REPLAY the original run's per-epoch keys
        # from index 0 (both epoch paths derive them from this rng),
        # correlating the continued trajectory with the segment already
        # consumed. Folding keeps determinism (same seed + same checkpoint
        # -> same continuation) with a fresh stream; fresh runs (offset 0)
        # are bit-unchanged.
        rng = jax.random.fold_in(rng, epoch_offset)

    epoch_key_data = None
    if run_epoch is not None:
        # ONE host-side key fetch for the whole fit: each epoch's key rides
        # into run_epoch as raw uint32 data (re-wrapped in-jit), so the RNG
        # costs zero per-epoch eager dispatches through the tunnel
        rng, sub = jax.random.split(rng)
        epoch_key_data = np.asarray(
            jax.random.key_data(jax.random.split(sub, num_steps))
        )

    losses: List[float] = [initial_loss]
    # Epoch AVERAGES are the checkpoint unit. The single-batch initial eval
    # is display-only (reference prints it) and must not seed best_loss:
    # comparing it against epoch averages froze segmented/resumed fits
    # whose first batch is easier than the dataset average — the fit would
    # return its input params unchanged. best_params still starts as the
    # initial params so divergence recovery before the first finite epoch
    # has something to restore.
    best_loss = np.inf
    lr = learning_rate
    stall = 0
    if _resume_meta is not None:
        # full-state resume: continue the interrupted run's control state —
        # the decayed learning rate, the best loss the checkpoint unit
        # tracks (so non-improving epochs after resume don't overwrite the
        # restored best), and the plateau stall counter at save time
        lr = float(np.float32(_resume_meta.get("lr", lr)))
        best_loss = float(_resume_meta.get("best_loss", best_loss))
        stall = int(_resume_meta.get("stall", 0))
        opt_state.hyperparams["lr"] = jnp.asarray(lr, dtype=jnp.float32)
        # printed only after the optimizer restore VALIDATED (a leaf-count
        # mismatch or an explicit opt_state= clears _resume_meta above);
        # the checkpoint lr deliberately supersedes the argument — flag it
        # when they differ so a deliberate lr override isn't silently lost
        say("Restored optimizer/control state: "
            f"lr={lr}, best_loss={best_loss}, stall={stall}, "
            f"epoch={epoch_offset}"
            + (f" (checkpoint lr supersedes learning_rate={learning_rate};"
               " pass opt_state= or checkpoint_full_state=False runs to"
               " override)"
               if np.float32(learning_rate) != np.float32(lr) else ""))
    best_params = _device_copy(params)
    best_opt_state = _device_copy(opt_state)
    converged = False
    epoch_seconds: List[float] = []

    profiler_cm = None
    if profile_dir is not None:
        # aux-subsystem upgrade over the reference (which has no profiling,
        # SURVEY.md §5.1): jax.profiler trace of the training loop
        profiler_cm = jax.profiler.trace(profile_dir)
        profiler_cm.__enter__()

    import time as _time

    from spmf_tpu.data.prefetch import prefetch_batches

    # host batch assembly + H2D placement run in a daemon thread, `prefetch`
    # batches ahead of the device step (double-buffering; the 1-core host
    # otherwise alternates with the TPU — the r2 sparse-path bottleneck)
    to_device = lambda b: _device_batch(b, dtype, mesh, data_axis)  # noqa: E731

    def _decay_f32(value, factor):
        """f32-exact LR update: the lr actually applied on device is always
        f32 (hyperparam_dtype), so the host accumulator must follow the
        same rounding — keeps chunked (device-side) and single-epoch
        (host-side) control flow bit-identical across plateau decays."""
        return float(np.float32(value) * np.float32(factor))

    def _check_convergence(epoch):
        nonlocal converged
        if len(losses) > convergence_window:
            window = losses[-convergence_window:]
            spread = max(window) - min(window)
            if rel_tol is not None and spread < rel_tol * abs(window[-1]):
                converged = True
            if abs_tol is not None and spread < abs_tol:
                converged = True
            if converged:
                say(f"Converged (window spread {spread:.3e}); "
                    f"stopping at epoch {epoch}")
        return converged

    # Epoch-chunk policy: with the scan path, K epochs can run as ONE
    # dispatch (run_chunk — per-epoch control flow on device), amortizing
    # the per-epoch dispatch + loss-fetch round-trip through the tunnel.
    # epoch_chunk>1 forces it; the default (None) is adaptive — the first
    # two epochs run singly (compile + a steady-state timing), then
    # chunking engages only when epochs are fast enough (<~1 s) that
    # round-trips actually matter AND >= 3 chunks of work remain (the
    # K-epoch scan is its own XLA executable; engaging for a short tail
    # would pay a fresh compile to save a handful of dispatches).
    if epoch_chunk is not None and epoch_chunk < 1:
        raise ValueError(f"epoch_chunk must be >= 1, got {epoch_chunk}")
    chunk_size = 0
    explicit_chunk = epoch_chunk is not None and epoch_chunk > 1
    if explicit_chunk:
        if run_epoch is None:
            raise ValueError(
                "epoch_chunk > 1 requires the epoch_scan fast path "
                "(DeviceArrayDataset or DeviceSparseCounts source, "
                "single process)"
            )
        chunk_size = epoch_chunk

    def _bookkeep(epoch, epoch_loss, last_batch_loss, improved, finite,
                  on_improve=None):
        """Shared per-epoch bookkeeping for BOTH decision sources (host
        comparisons on the per-epoch paths, device flags on the chunk
        path): prints, best/stall/lr accounting. Returns the plateau
        decision, computed from the mirrored stall counter — identical to
        the device's by construction (asserted at the replay site)."""
        nonlocal best_loss, stall, lr
        losses.append(epoch_loss)
        say(
            f"Epoch {epoch}: average-batch loss: {epoch_loss} "
            f"last batch loss: {last_batch_loss}"
        )
        if not finite:
            # divergence: restore best and decay hard (reference recovers
            # via its plateau-restore path)
            say(f"Non-finite loss; restoring from a checkpoint - loss: {best_loss}")
            lr = _decay_f32(lr, 0.5)
            return False
        if improved:
            best_loss = epoch_loss
            stall = 0
            if on_improve is not None:
                on_improve(epoch)
        else:
            stall += 1
        plateau = stall >= patience
        if plateau:
            lr = _decay_f32(lr, decay_rate)
            say(f"We are in a loss plateau learning rate: {lr} loss: {epoch_loss}")
            say(f"Restoring from a checkpoint - loss: {best_loss}")
            stall = 0
        return plateau

    chunk_used = 0
    dev_carry = None  # (bloss, stall, lr) device scalars between chunks
    epoch = 0
    interrupted = False
    try:
        while epoch < num_steps:
            remaining = num_steps - epoch
            if (run_epoch is not None and epoch_chunk is None and epoch == 2
                    and not _sparse_scan
                    and epoch_seconds[1] <= 1.0 and remaining >= 3 * 8):
                # (_sparse_scan excluded: the K-epoch executable measured
                # 2x SLOWER per epoch over a CSR-carrying scan —
                # benchmarks/sparse_fit_ab.py; explicit epoch_chunk>1 is
                # still honored, trajectory-identical)
                chunk_size = 8
            K = 0
            if chunk_size > 1:
                # explicit requests clamp to the remainder (honor the user's
                # opt-in at the cost of one extra scan-shape compile); the
                # adaptive default leaves short tails to the already-compiled
                # single-epoch program instead
                K = (min(chunk_size, remaining) if explicit_chunk
                     else (chunk_size if remaining >= chunk_size else 0))
            if K >= 2:
                t_chunk = _time.perf_counter()
                carry_in = (dev_carry if dev_carry is not None
                            else (best_loss, stall, lr))
                (params, opt_state, best_params, best_opt_state,
                 blo_d, sta_d, lr_d), losses_k, flags_k = run_chunk(
                    params, opt_state, best_params, best_opt_state,
                    *carry_in, epoch_key_data[epoch:epoch + K],
                )
                # decision state stays in DEVICE form across consecutive
                # chunks: re-deriving bloss from the host replay (f64 means)
                # and re-casting to the compute dtype would drift from the
                # uninterrupted on-device carry in f32 runs
                dev_carry = (blo_d, sta_d, lr_d)
                jax.block_until_ready(losses_k)
                per_epoch = (_time.perf_counter() - t_chunk) / K
                chunk_used = max(chunk_used, K)
                arr = np.asarray(losses_k)
                fl = np.asarray(flags_k)
                last_improve = None
                # replay the device decisions through the same bookkeeping
                # helper the per-epoch paths drive from host state
                for i in range(K):
                    epoch += 1
                    epoch_seconds.append(per_epoch)
                    bl = [float(x) for x in arr[i]]
                    improved, plateau_dev, finite = (bool(f) for f in fl[i])
                    if improved:
                        last_improve = epoch
                    plateau = _bookkeep(
                        epoch, float(np.mean(bl)), bl[-1], improved, finite
                    )
                    # stall mirrors the device counter exactly, so the host-
                    # derived plateau must match the device decision; if it
                    # ever drifts (a future edit desynchronizing the mirror),
                    # surface it loudly but keep training — the actual params
                    # followed the DEVICE decisions either way (a bare assert
                    # would vanish under -O, or kill an hours-long fit)
                    if plateau != plateau_dev:  # pragma: no cover
                        import warnings

                        warnings.warn(
                            "epoch-chunk replay drifted from the on-device "
                            "decision sequence at epoch "
                            f"{epoch} (host plateau={plateau}, device="
                            f"{plateau_dev}); prints/lr bookkeeping may lag "
                            "the device state",
                            RuntimeWarning,
                        )
                if last_improve is not None:
                    path = save_ckpt(
                        best_params, last_improve, best_opt_state,
                        # the DEVICE carry is the authoritative control state
                        # on the chunk path (the host replay's f64 means can
                        # drift at 1-ulp ties in f32 runs — same reason the
                        # inter-chunk carry stays in device form)
                        control=(float(blo_d), int(sta_d), float(lr_d)),
                    )
                    if path is not None:
                        say(f"Saved a checkpoint: {path}")
                # rel/abs-tol stopping at chunk granularity (docstring): every
                # epoch of the chunk executed, so all K enter the trace and
                # the best-params tracking before the window is evaluated
                if _check_convergence(epoch):
                    break
                continue

            dev_carry = None
            epoch += 1
            t_epoch = _time.perf_counter()
            if run_epoch is not None:
                params, opt_state, epoch_losses = run_epoch(
                    params, opt_state, epoch_key_data[epoch - 1]
                )
            else:
                batch_losses = []
                for batch in prefetch_batches(
                    batched_data_factory(), prefetch, to_device
                ):
                    rng, k = jax.random.split(rng)
                    params, opt_state, loss = step(params, opt_state, k, batch)
                    batch_losses.append(loss)
                if not batch_losses:
                    raise ValueError(
                        "batched_data_factory() yielded no batches in epoch "
                        f"{epoch} — check batch_size/drop_remainder vs dataset size"
                    )
                epoch_losses = jnp.stack(batch_losses)
            jax.block_until_ready(epoch_losses)
            epoch_seconds.append(_time.perf_counter() - t_epoch)
            # ONE device fetch for the epoch (per-scalar float() would cost a
            # host round-trip per batch through the tunnel)
            batch_losses = [float(l) for l in np.asarray(epoch_losses)]
            epoch_loss = float(np.mean(batch_losses))
            finite = bool(np.isfinite(epoch_loss))
            improved = finite and epoch_loss < best_loss

            def _on_improve(e):
                nonlocal best_params, best_opt_state
                best_params = _device_copy(params)
                best_opt_state = _device_copy(opt_state)
                path = save_ckpt(best_params, e, best_opt_state)
                if path is not None:
                    say(f"Saved a checkpoint: {path}")

            plateau = _bookkeep(epoch, epoch_loss, batch_losses[-1], improved,
                                finite, on_improve=_on_improve)
            if not finite or plateau:
                params = _device_copy(best_params)
                opt_state = _device_copy(best_opt_state)
                opt_state.hyperparams["lr"] = jnp.asarray(lr, dtype=jnp.float32)
                if not finite:
                    continue

            # rel/abs-tol convergence over a trailing window of epoch losses
            if _check_convergence(epoch):
                break

    except KeyboardInterrupt:
        # graceful interrupt (Ctrl-C / SIGINT): keep the best state
        # reached so far instead of losing the in-memory result —
        # the caller gets a normal FitResult (extras['interrupted'])
        # and on-disk checkpoints (if enabled) are already written
        interrupted = True
        say(f"Interrupted at epoch {epoch}; returning the best "
            f"params so far (loss {best_loss})")
    if profiler_cm is not None:
        profiler_cm.__exit__(None, None, None)
    if _sparse_scan:
        # final static-pad audit for the sparse scan path (the iterator
        # checks at each epoch end; the scan accumulates per-epoch totals)
        _scan_ds.check_overflow()

    # hand back the best parameters (matches reference restore-best
    # behavior), re-placed to the caller's input layout
    if param_shardings is not None:
        params = jax.tree_util.tree_map(
            lambda x, sh: jax.device_put(x, sh) if sh is not None else x,
            best_params, param_shardings,
        )
    else:
        params = _device_copy(best_params)
    return FitResult(
        params=params,
        losses=losses,
        learning_rate=lr,
        opt_state=opt_state,
        checkpoint_path=ckpt_path,
        converged=converged,
        extras={"epoch_seconds": epoch_seconds,
                "epoch_scan": run_epoch is not None,
                # largest K that actually ran (0 = never chunked). When
                # chunked, epoch_seconds entries are chunk_wall/K amortized
                # values and checkpoints were written once per chunk.
                "epoch_chunk": chunk_used,
                # True when a KeyboardInterrupt ended the loop early: the
                # returned params are the best reached before the interrupt
                "interrupted": interrupted},
    )
