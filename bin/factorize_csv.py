#!/usr/bin/env python3
"""Train PMF on a CSV-formatted count matrix.

Rebuild of the reference packaged CLI (reference: bin/factorize_csv.py:20-204;
flag surface documented in README.md:40-62). Same flags, same outputs
(encoding CSV, saved model, PDF figure, per-row representation CSV), running
against the spmf_tpu backend.
"""
import argparse
import csv
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from spmf_tpu import PoissonMatrixFactorization  # noqa: E402
from spmf_tpu.data import ArrayDataset, load_csv_counts  # noqa: E402


def main():
    parser = argparse.ArgumentParser(
        description="Train PMF on CSV-formatted count matrix")
    parser.add_argument("-f", "--csv-file", nargs="?", type=str,
                        help="Enter the CSV file")
    parser.add_argument("-e", "--epoch", nargs="?", type=int, default=300,
                        help="Enter Epoch value: Default: 300")
    parser.add_argument("-d", "--dimension", nargs="?", type=int, default=2,
                        help="Enter embedding dimension. Default: 2")
    parser.add_argument("-b", "--batch-size", nargs="?", type=int, default=5000,
                        help="Enter batch size. Default: 5000")
    parser.add_argument("-lr", "--learning-rate", nargs="?", type=float,
                        default=0.01, help="Enter float. Default: 0.01")
    parser.add_argument("-c", "--clip-value", nargs="?", type=float, default=3.0,
                        help="Gradient clip value. Default: 3.0")
    parser.add_argument("-lt", "--log-transform", action="store_true",
                        help="Log-transform?")
    parser.add_argument("-rn", "--row-normalize", action="store_true",
                        help="Row normalize based on counts?")
    # additive flags (not in the reference CLI, whose flag surface is
    # otherwise preserved): preemption recovery for long factorizations,
    # same semantics as bin/factorize_scrnaseq_counts.py
    parser.add_argument("-s", "--sample-size", nargs="?", type=int, default=8,
                        help="ELBO samples per step. Default: 8")
    parser.add_argument("--antithetic", action="store_true",
                        help="mirrored-pair ELBO sampling: '-s 4 "
                             "--antithetic' converges like 8 independent "
                             "samples at ~half the step cost (docs/"
                             "antithetic_experiment.json); needs even -s")
    parser.add_argument("--checkpoint-dir", nargs="?", type=str, default=None,
                        help="Write full-state engine checkpoints here "
                             "(per improving epoch)")
    parser.add_argument("--resume-from", nargs="?", type=str, default=None,
                        help="Resume from an engine checkpoint (.npz path "
                             "or a directory; newest restored)")
    args = parser.parse_args(sys.argv[1:])

    if args.csv_file is None:
        sys.exit("You need to specify a csv file")
    elif not os.path.exists(args.csv_file):
        sys.exit("File doesn't exist")

    X = load_csv_counts(args.csv_file)
    N, columns = X.shape
    colmeans = X.mean(axis=0, keepdims=True)
    rowmean = colmeans.sum()

    tensors = {"indices": np.arange(N), "counts": X}
    if args.row_normalize:
        tensors["normalization"] = np.maximum(X.sum(axis=1), 1.0) / rowmean
    data = ArrayDataset(tensors).batch(args.batch_size, drop_remainder=True)
    try:
        # device-resident matrix: the fit loop's epoch_scan/epoch_chunk
        # fast paths engage (whole epochs as single dispatches) instead of
        # per-batch host->device transfers through the device tunnel
        import jax

        if jax.default_backend() != "cpu":
            data = data.to_device()
    except Exception:
        pass

    factor = PoissonMatrixFactorization(
        data,
        latent_dim=args.dimension,
        strategy=None,
        scale_columns=True,
        log_transform=args.log_transform,
        column_norms=colmeans,
        u_tau_scale=1.0 / np.sqrt(columns * N),
    )

    fit_kwargs = {}
    if args.checkpoint_dir is not None:
        fit_kwargs["checkpoint_dir"] = args.checkpoint_dir
    if args.resume_from is not None:
        fit_kwargs["resume_from"] = args.resume_from
    factor.calibrate_advi(
        num_steps=args.epoch,
        rel_tol=1e-4,
        clip_value=args.clip_value,
        learning_rate=args.learning_rate,
        sample_size=args.sample_size,
        antithetic=args.antithetic,
        **fit_kwargs,
    )

    base = f"{args.csv_file}_{args.dimension}D"
    suffix = f"lt_{args.log_transform}_rn_{args.row_normalize}"

    print("Saving the encoding matrix")
    with open(f"{base}_encoding_{suffix}.csv", "w") as f:
        writer = csv.writer(f)
        encoding = np.asarray(factor.encoding_matrix()).T
        for row in range(encoding.shape[0]):
            writer.writerow(encoding[row, :])

    print("Saving the trained model object")
    factor.save(f"{base}_model_{suffix}.npz")

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        print("Saving figure with the encodings")
        fig, ax = plt.subplots(1, 2, figsize=(14, 8))
        pcm = ax[0].imshow(np.asarray(factor.encoding_matrix())[::-1, :],
                           vmin=0, cmap="Blues")
        ax[0].set_ylabel("item")
        ax[0].set_xlabel("factor dimension")
        fig.colorbar(pcm, ax=ax[0], orientation="vertical")

        samples = factor.surrogate_distribution.sample(250)
        s = np.asarray(samples["s"])
        weights = s / s.sum(-2, keepdims=True)
        intercept = (
            np.squeeze(np.asarray(samples["w"]), -2)
            * weights[:, -1, :]
            * np.asarray(factor.eta_i).reshape(1, -1)
        )
        # forest plot of the intercept posteriors (reference
        # bin/factorize_csv.py:176 az.plot_forest). Real arviz when the
        # optional dependency is importable; otherwise a matching manual
        # panel (per-feature rows, thick 50% band, thin 94% band, median).
        def _manual_forest():
            lo94, lo50, mid, hi50, hi94 = np.percentile(
                intercept, [3.0, 25.0, 50.0, 75.0, 97.0], axis=0
            )
            ys = np.arange(columns)
            ax[1].hlines(ys, lo94, hi94, color="C0", linewidth=1)
            ax[1].hlines(ys, lo50, hi50, color="C0", linewidth=3.5)
            ax[1].plot(mid, ys, "o", color="white", markersize=3.5,
                       markeredgecolor="C0", zorder=3)
            ax[1].set_yticks(ys)
            ax[1].set_yticklabels([f"feature {i}" for i in ys])
            ax[1].set_xlabel("background rate")
            ax[1].axvline(1.0, linestyle="dashed", color="black")
            ax[1].set_title("intercept posterior (94% / 50% intervals)")
            ax[1].invert_yaxis()

        try:
            import arviz as az

            az.plot_forest(
                {"background rate": intercept[None]}, ax=ax[1],
                combined=True,
            )
            ax[1].axvline(1.0, linestyle="dashed", color="black")
        except Exception:
            # arviz absent OR its plot_forest API rejects this call shape:
            # the figure is cosmetic — never let it kill the run after
            # minutes of training (the representations CSV follows)
            _manual_forest()
        plt.savefig(f"{base}_encoding_{suffix}.pdf", bbox_inches="tight")
    except ImportError:
        print("matplotlib not available; skipping figure")

    print("Generating representations")
    with open(f"{base}_representation_{suffix}.csv", "w") as f:
        writer = csv.writer(f)
        for record in ArrayDataset(tensors).batch(args.batch_size):
            z = np.asarray(factor.encode(record["counts"]))
            if args.row_normalize:
                z = z * record["normalization"][:, None]
            ind = record["indices"]
            for row in range(z.shape[0]):
                writer.writerow(np.concatenate([[ind[row]], z[row, :]]))


if __name__ == "__main__":
    main()
