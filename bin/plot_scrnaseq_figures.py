#!/usr/bin/env python3
"""Re-plot saved factorization artifacts (no model dependency).

Rebuild of reference bin/plot_scrnaseq_figures.py:1-145: gene-score heatmaps
(:56-97) and UMAP scatter panels (:100-145) from the npy artifacts written by
factorize_scrnaseq_counts.py.
"""
import argparse
import os

import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--datapath", default=".")
    ap.add_argument("--dataset", default="pbmc3k")
    ap.add_argument("-d", "--dimension", type=int, default=3)
    ap.add_argument("--top-genes", type=int, default=25)
    args = ap.parse_args()

    dp = os.path.join(args.datapath, "")
    name, P = args.dataset, args.dimension

    gene_score = np.load(dp + name + f"_genescore_{P}.npy")
    gene_names = np.load(dp + name + "_genenames.npy", allow_pickle=True)
    cell_score = np.load(dp + name + f"_cellscore_{P}.npy")

    top = min(args.top_genes, gene_score.shape[1])
    order = np.argsort(-gene_score.max(0))[:top]
    fig, ax = plt.subplots(figsize=(10, 6))
    im = ax.imshow(gene_score[:, order], aspect="auto", cmap="Blues")
    ax.set_xticks(np.arange(top))
    ax.set_xticklabels([str(g) for g in gene_names[order]], rotation=90, fontsize=6)
    ax.set_ylabel("factor")
    fig.colorbar(im, ax=ax)
    plt.savefig(dp + name + f"_genescores_replot_{P}.pdf", bbox_inches="tight")
    plt.close(fig)

    umap_path = dp + name + "_UMAP_scanpy.npy"
    if os.path.exists(umap_path):
        UMAP = np.load(umap_path)
        fig, axes = plt.subplots(1, P, figsize=(4 * P, 4))
        axes = np.atleast_1d(axes)
        for j in range(P):
            sc = axes[j].scatter(
                UMAP[:, 0], UMAP[:, 1], c=cell_score[:, j], s=2, cmap="viridis"
            )
            axes[j].set_title(f"factor {j}")
            fig.colorbar(sc, ax=axes[j])
        plt.savefig(dp + name + f"_UMAP_replot_{P}.pdf", bbox_inches="tight")
        plt.close(fig)
    print("Figures written to", dp)


if __name__ == "__main__":
    main()
