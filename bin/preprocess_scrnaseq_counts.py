#!/usr/bin/env python3
"""Preprocess 10x scRNA-seq data into the npy triplet consumed by
factorize_scrnaseq_counts.py.

Rebuild of reference bin/preprocess_scrnaseq_counts.py:1-115: scanpy 10x
ingest, QC filtering (min_genes=200, min_cells=3, mito%<5, counts<2500),
HVG ranking by normalized dispersion, PCA/neighbors/leiden/UMAP embeddings,
saves ``<name>_counts.npy``, ``<name>_genenames.npy``,
``<name>_UMAP_scanpy.npy``. scanpy/umap are gated: they are not part of the
baked environment, so this script degrades with a clear message (the
downstream pipeline consumes the npy files regardless of their producer).
"""
import argparse
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--datapath", required=True,
                    help="directory containing the 10x mtx data")
    ap.add_argument("--dataset", default="pbmc3k")
    ap.add_argument("--n-top-genes", type=int, default=1000)
    args = ap.parse_args()

    try:
        import scanpy as sc
    except ImportError:
        sys.exit(
            "scanpy is required for 10x preprocessing and is not installed in "
            "this environment. Produce <name>_counts.npy / <name>_genenames.npy "
            "by any other means and run factorize_scrnaseq_counts.py directly."
        )

    datapath = args.datapath.rstrip("/") + "/"
    name = args.dataset

    adata = sc.read_10x_mtx(datapath, var_names="gene_symbols", cache=True)
    adata.var_names_make_unique()

    # QC (reference preprocess_scrnaseq_counts.py:37-52)
    sc.pp.filter_cells(adata, min_genes=200)
    sc.pp.filter_genes(adata, min_cells=3)
    adata.var["mt"] = adata.var_names.str.startswith("MT-")
    sc.pp.calculate_qc_metrics(
        adata, qc_vars=["mt"], percent_top=None, log1p=False, inplace=True
    )
    adata = adata[adata.obs.pct_counts_mt < 5, :]
    adata = adata[adata.obs.n_genes_by_counts < 2500, :]

    counts = adata.X.toarray() if hasattr(adata.X, "toarray") else np.asarray(adata.X)

    # HVG on normalize_total + log1p view (reference :58-78)
    view = adata.copy()
    sc.pp.normalize_total(view, target_sum=1e4)
    sc.pp.log1p(view)
    sc.pp.highly_variable_genes(view, n_top_genes=args.n_top_genes)
    order = np.argsort(-view.var["dispersions_norm"].values)

    counts = counts[:, order]
    gene_names = np.asarray(adata.var_names)[order]

    # embeddings (reference :82-94)
    sc.pp.scale(view, max_value=10)
    sc.tl.pca(view, svd_solver="arpack")
    sc.pp.neighbors(view, n_neighbors=10, n_pcs=40)
    try:
        sc.tl.leiden(view)
        sc.tl.paga(view)
        sc.pl.paga(view, plot=False)
        sc.tl.umap(view, init_pos="paga")
    except Exception:
        sc.tl.umap(view)

    np.save(datapath + name + "_counts.npy", counts)
    np.save(datapath + name + "_genenames.npy", gene_names)
    np.save(datapath + name + "_UMAP_scanpy.npy", view.obsm["X_umap"])
    print(f"Saved {name}_counts.npy {counts.shape}, genenames, UMAP to {datapath}")


if __name__ == "__main__":
    main()
