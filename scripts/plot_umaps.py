#!/usr/bin/env python
"""Standalone batch embedding plotter (equivalent of reference
scripts/plot_umaps.py:1-424: bin paircount profiles for one chromosome or
ALL, embed with UMAP (PCA fallback), cluster with DBSCAN, and write
scatter PNGs colored by cluster / chromosome / position, plus a PCA
panel with explained-variance axis labels).

Usage:
  python scripts/plot_umaps.py <index_dir> <anchor> <chrom|ALL>
      [--bin-size N] [--step N] [--eps F] [--neighbors N] [--min-dist F]
      [--out DIR]
"""

import argparse
import os
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from panagram_tpu.index import Index  # noqa: E402
from panagram_tpu.umap_embed import _embed  # noqa: E402


def chrom_bins(index, anchor, chrom, bin_size, step):
    """Per-bin paircount profile matrix for one chromosome: rows = bins,
    columns = genomes (reference one_loc)."""
    size = int(index.genomes[anchor].seq_len(chrom))
    bitmap = index.query_bitmap(anchor, chrom, 0, size, step)
    _, paircounts = index.bitmap_to_bins(bitmap, bin_size)
    pc = paircounts.fillna(0)
    # paircount columns are already base-pair starts (bitmap_to_bins
    # emits columns = bin_id * binlen — index.py)
    starts = pc.columns.to_numpy()
    return pc.to_numpy().T, [chrom] * pc.shape[1], starts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("index_dir")
    ap.add_argument("anchor")
    ap.add_argument("chrom", help="chromosome name or ALL")
    ap.add_argument("--bin-size", type=int, default=100_000)
    ap.add_argument("--step", type=int, default=100)
    ap.add_argument("--eps", type=float, default=1.0)
    ap.add_argument("--neighbors", type=int, default=4)
    ap.add_argument("--min-dist", type=float, default=0.0)
    ap.add_argument("--out", default="umap_plots")
    args = ap.parse_args()

    from sklearn.cluster import DBSCAN
    from sklearn.decomposition import PCA

    index = Index(args.index_dir)
    chroms = (list(index.genomes[args.anchor].chrs.index)
              if args.chrom == "ALL" else [args.chrom])

    mats, chrom_list, starts = [], [], []
    for c in chroms:
        m, cl, st = chrom_bins(index, args.anchor, c, args.bin_size,
                               args.step)
        mats.append(m)
        chrom_list += cl
        starts.append(st)
    data = np.concatenate(mats, axis=0)
    starts = np.concatenate(starts)
    print(f"{data.shape[0]} bins x {data.shape[1]} genomes")

    class P:
        neighbors = args.neighbors
        dist = args.min_dist
        eps = args.eps
        samples = 1

    emb = _embed(data, P)
    if emb is None:
        sys.exit("too few bins to embed")
    clusters = DBSCAN(eps=args.eps, min_samples=1).fit_predict(emb)

    os.makedirs(args.out, exist_ok=True)
    tag = f"{args.anchor}.{args.chrom}.bins{args.bin_size}"

    def scatter(c, label, fname, cmap="Spectral"):
        fig, ax = plt.subplots(figsize=(7, 6))
        sc = ax.scatter(emb[:, 0], emb[:, 1], c=c, s=10, alpha=0.7,
                        cmap=cmap)
        fig.colorbar(sc, ax=ax, label=label)
        ax.set_xlabel("dim 1")
        ax.set_ylabel("dim 2")
        ax.set_title(f"{args.anchor} {args.chrom} bin embedding ({label})")
        path = os.path.join(args.out, fname)
        fig.savefig(path, dpi=110, bbox_inches="tight")
        plt.close(fig)
        print("wrote", path)

    scatter(clusters, "cluster", f"umap.cluster.{tag}.png")
    scatter(starts, "position (bp)", f"umap.pos.{tag}.png", cmap="viridis")
    if len(chroms) > 1:
        cidx = pd.Categorical(chrom_list, categories=chroms).codes
        scatter(cidx, "chromosome", f"umap.chrom.{tag}.png", cmap="tab20")

    # PCA panel with explained-variance labels (reference make_pca)
    n_comp = min(3, data.shape[1], len(data))
    pca = PCA(n_components=n_comp, random_state=42)
    pcs = pca.fit_transform(data)
    fig, ax = plt.subplots(figsize=(7, 6))
    sc = ax.scatter(pcs[:, 0], pcs[:, 1] if pcs.shape[1] > 1 else
                    np.zeros(len(pcs)), c=clusters, s=10, alpha=0.6,
                    cmap="rainbow")
    ax.set_xlabel(f"PC 1: {pca.explained_variance_ratio_[0]:.3f}")
    if pcs.shape[1] > 1:
        ax.set_ylabel(f"PC 2: {pca.explained_variance_ratio_[1]:.3f}")
    fig.colorbar(sc, ax=ax, label="cluster")
    path = os.path.join(args.out, f"pca.{tag}.png")
    fig.savefig(path, dpi=110, bbox_inches="tight")
    plt.close(fig)
    print("wrote", path)
    index.close()


if __name__ == "__main__":
    main()
