#!/usr/bin/env python3
"""Factorize a preprocessed scRNA-seq count matrix.

Rebuild of reference bin/factorize_scrnaseq_counts.py:25-293: loads the
``*_counts.npy`` / ``*_genenames.npy`` / ``*_UMAP*.npy`` triplet produced by
preprocess_scrnaseq_counts.py, fits PoissonMatrixFactorization
(latent_dim=3, log_transform, column norms, u_tau_scale=1/sqrt(D*N)),
exports U/V/W/Z + derived scores as .npy, renders figures.
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from spmf_tpu import PoissonMatrixFactorization  # noqa: E402
from spmf_tpu.data import ArrayDataset  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--datapath", default=".", help="directory with the npy triplet")
    ap.add_argument("--dataset", default="pbmc3k")
    ap.add_argument("-d", "--dimension", type=int, default=3)
    ap.add_argument("-b", "--batch-size", type=int, default=256)
    ap.add_argument("-e", "--num-steps", type=int, default=500)
    ap.add_argument("-lr", "--learning-rate", type=float, default=0.01)
    ap.add_argument("-c", "--clip-value", type=float, default=10.0)
    ap.add_argument("--no-figures", action="store_true")
    ap.add_argument("--sparse", action="store_true",
                    help="train on padded COO triplets (device-side sparse "
                         "energy; never densifies row slabs — for matrices "
                         "too wide/tall to slab through host RAM)")
    ap.add_argument("--block-rows", type=int, default=None,
                    help="with --sparse on an accelerator: use the "
                         "block-aligned device layout (e.g. 128; batch "
                         "size must be a multiple). Fastest sparse path "
                         "(~1.8x, docs/sparse_bench.json) — epochs "
                         "shuffle row BLOCKS, so shuffle your cell order "
                         "once beforehand if it is structured")
    ap.add_argument("--data-parallel", action="store_true",
                    help="shard minibatch rows (or COO triplets with "
                         "--sparse) over all local devices via a dp mesh "
                         "(multi-host: call jax.distributed.initialize "
                         "before running)")
    ap.add_argument("-s", "--sample-size", type=int, default=8,
                    help="ELBO samples per step (default 8)")
    ap.add_argument("--antithetic", action="store_true",
                    help="mirrored-pair ELBO sampling: -s 4 --antithetic "
                         "converges like 8 independent samples at ~half "
                         "the per-step cost (docs/antithetic_experiment"
                         ".json); sample size must be even")
    ap.add_argument("--likelihood-clip", default="reference",
                    choices=["reference", "static"],
                    help="'static' drops the fused kernel's data-dependent "
                         "clip bound: gradients bit-identical, losses "
                         "identical on healthy batches, measured 1.073x "
                         "step speed (docs/clip_mode_ab.json)")
    ap.add_argument("--checkpoint-dir", default=None,
                    help="save a checkpoint per improving epoch here")
    ap.add_argument("--resume-from", default=None,
                    help="restore surrogate params from an engine "
                         "checkpoint (.npz, or a directory: newest inside) "
                         "before training — preemption recovery")
    args = ap.parse_args()

    mesh = None
    if args.data_parallel:
        import jax

        from spmf_tpu.parallel import data_parallel_mesh

        mesh = data_parallel_mesh()
        print(f"data-parallel mesh: {len(jax.devices())} devices")

    datapath = os.path.join(args.datapath, "")
    name = args.dataset
    X = np.load(datapath + name + "_counts.npy")
    gene_names = np.load(datapath + name + "_genenames.npy", allow_pickle=True)
    # scanpy backend: a real UMAP; numpy backend: an honestly-named PCA
    # stand-in — label the figure by what was actually found
    UMAP, emb_label = None, "UMAP"
    for _path, _label in ((datapath + name + "_UMAP_scanpy.npy", "UMAP"),
                          (datapath + name + "_PCA.npy", "PCA")):
        if os.path.exists(_path):
            UMAP, emb_label = np.load(_path), _label
            break

    P = args.dimension
    N, D = X.shape
    BATCH_SIZE = args.batch_size
    print(X.shape)
    print(
        f"Total observations={N}, Batch size={BATCH_SIZE}: "
        f"dropping {N % BATCH_SIZE} observations."
    )

    # row/col size factors via median-normalized sums
    # (reference factorize_scrnaseq_counts.py:48-65)
    after = np.median(np.asarray(X.sum(1)))
    row_size_factors = X.sum(1) / after
    # guard all-zero genes (the reference assumes preprocess_scrnaseq_counts
    # already filtered min_cells>=3; a zero column norm would divide by zero
    # in the encoder — same zero->1 semantics as compute_scales,
    # reference poisson.py:142-149)
    col_norm = X.mean(0)
    col_norm = np.where(col_norm > 0, col_norm, 1.0)
    row_norm = row_size_factors

    if args.sparse:
        from spmf_tpu.data import SparseCounts

        data = (
            SparseCounts.from_dense(
                X, extras={"normalization": row_size_factors}
            )
            .shuffle(seed=0)
            .batch(BATCH_SIZE, drop_remainder=True)
            .as_coo()
        )
        if args.block_rows:
            # block-aligned device layout: the fastest sparse path
            # (one 2-D gather per batch, one-hot MXU energy)
            data = data.to_device(block_rows=args.block_rows)
    else:
        data = (
            ArrayDataset(
                {"data": X, "indices": np.arange(N),
                 "normalization": row_size_factors}
            )
            .shuffle(buffer_size=N)
            .batch(BATCH_SIZE, drop_remainder=True)
        )
        try:
            # keep the whole matrix device-resident: batches become
            # on-device gathers instead of per-step host->device transfers
            import jax

            if jax.default_backend() != "cpu":
                data = data.to_device()
        except Exception:
            pass

    factor = PoissonMatrixFactorization(
        data,
        latent_dim=P,
        strategy=None,
        mesh=mesh,
        scale_rates=True,
        column_norms=col_norm,
        log_transform=True,
        u_tau_scale=1.0 / np.sqrt(D * N),
        likelihood_clip=args.likelihood_clip,
    )

    losses = factor.calibrate_advi(
        num_steps=args.num_steps,
        learning_rate=args.learning_rate,
        abs_tol=1e-3,
        rel_tol=1e-3,
        clip_value=args.clip_value,
        sample_size=args.sample_size,
        antithetic=args.antithetic,
        checkpoint_dir=args.checkpoint_dir,
        resume_from=args.resume_from,
    )

    U = np.asarray(factor.encoding_matrix())
    W = np.asarray(factor.intercept_matrix())
    intercept_score = W * col_norm[np.newaxis, :]
    # stream the full-matrix encode in row chunks: encode(X) would stage
    # all of X on device (100k x 50k f32 = 20 GB > a v5e chip's 16 GB HBM)
    Z = factor.encode_batched(X, row_chunk=max(BATCH_SIZE, 8192))
    cell_score = Z * row_norm[:, np.newaxis]
    V = np.asarray(factor.decoding_matrix())
    gene_score = V * col_norm[np.newaxis, :]

    np.save(datapath + name + f"_U_{P}.npy", U)
    np.save(datapath + name + f"_V_{P}.npy", V)
    np.save(datapath + name + f"_W_{P}.npy", W)
    np.save(datapath + name + f"_Z_{P}.npy", Z)
    np.save(datapath + name + f"_cellscore_{P}.npy", cell_score)
    np.save(datapath + name + f"_genescore_{P}.npy", gene_score)
    np.save(datapath + name + f"_interceptscore_{P}.npy", intercept_score)
    np.save(datapath + name + f"_losses_{P}.npy", np.asarray(losses))

    if args.no_figures:
        return
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        print("matplotlib unavailable; skipping figures")
        return

    # gene-score heatmap of top genes per factor
    # (reference factorize_scrnaseq_counts.py:145-232)
    top = min(25, D)
    order = np.argsort(-gene_score.max(0))[:top]
    fig, ax = plt.subplots(figsize=(10, 6))
    im = ax.imshow(gene_score[:, order], aspect="auto", cmap="Blues")
    ax.set_xticks(np.arange(top))
    ax.set_xticklabels([str(g) for g in gene_names[order]], rotation=90, fontsize=6)
    ax.set_ylabel("factor")
    fig.colorbar(im, ax=ax)
    plt.savefig(datapath + name + f"_genescores_{P}.pdf", bbox_inches="tight")
    plt.close(fig)

    if UMAP is not None:
        fig, axes = plt.subplots(1, P, figsize=(4 * P, 4))
        axes = np.atleast_1d(axes)
        for j in range(P):
            sc = axes[j].scatter(
                UMAP[:, 0], UMAP[:, 1], c=cell_score[:, j], s=2, cmap="viridis"
            )
            axes[j].set_title(f"factor {j} ({emb_label})")
            fig.colorbar(sc, ax=axes[j])
        plt.savefig(datapath + name + f"_{emb_label}_scores_{P}.pdf",
                    bbox_inches="tight")
        plt.close(fig)

    fig, ax = plt.subplots()
    ax.plot(losses)
    ax.set_xlabel("epoch")
    ax.set_ylabel("avg batch loss")
    plt.savefig(datapath + name + f"_losses_{P}.pdf", bbox_inches="tight")
    plt.close(fig)


if __name__ == "__main__":
    main()
