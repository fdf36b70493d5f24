"""GFF3 ingest: gene/annotation tables with Parent-chain name resolution.

Re-expresses the reference's GFF handling (panagram/index.py:663-791):
genes (types in gff_gene_types) keep conservation scores; all other (or
explicitly listed) feature types become plain annotations whose `name` is
resolved by walking Parent chains up to the owning gene; `transcript` rows
are dropped from the annotation table.
"""

from __future__ import annotations

import gzip
import re

import numpy as np
import pandas as pd

GFF_NAMES = ["chr", "source", "type", "start", "end", "score", "strand", "phase", "attr"]
TABIX_COLS = ["chr", "start", "end", "type", "name"]


def _open(path):
    if str(path).endswith(".gz"):
        return gzip.open(path, "rt")
    return open(path)


def read_gff(path) -> pd.DataFrame:
    rows = []
    with _open(path) as f:
        for line in f:
            if not line.strip() or line.startswith("#"):
                continue
            parts = line.rstrip("\n").split("\t")
            if len(parts) < 9:
                continue
            rows.append(parts[:9])
    df = pd.DataFrame(rows, columns=GFF_NAMES)
    if len(df):
        df["start"] = df["start"].astype(int)
        df["end"] = df["end"].astype(int)
    return df[["chr", "start", "end", "type", "attr"]]


def _attr(df: pd.DataFrame, name: str, fill: str | None = None) -> pd.Series:
    """Extract `name=value` from the attr column (reference index.py:663-667)."""
    attr = df["attr"].str.extract(f"{name}=([^;]+)", flags=re.IGNORECASE)[0]
    if fill is not None:
        return attr.fillna(df[fill])
    return attr


def split_gff(path, gene_types=("gene",), anno_types=None, name_attr="Name"):
    """Returns (genes, annos):

    genes: DataFrame chr,start,end,name (sorted by chr,start)
    annos: DataFrame chr,start,end,type,name with Parent-resolved names,
           'transcript' rows removed, duplicates dropped
    """
    df = read_gff(path)
    if not len(df):
        empty_g = pd.DataFrame(columns=["chr", "start", "end", "name"])
        empty_a = pd.DataFrame(columns=TABIX_COLS)
        return empty_g, empty_a

    df = df.sort_values(["chr", "start"]).reset_index(drop=True)
    df["id"] = _attr(df, "ID")

    gmask = df["type"].isin(list(gene_types))
    genes = df[gmask].copy().reset_index(drop=True)
    if anno_types is not None:
        annos = df[df["type"].isin(list(anno_types))].copy().reset_index(drop=True)
    else:
        annos = df[~gmask].copy().reset_index(drop=True)

    genes["name"] = _attr(genes, name_attr, "id")

    # Parent-chain resolution (reference index.py:750-768): repeatedly map
    # each annotation's Parent to its parent's Parent until reaching a root
    # (a gene or nothing), then pull gene names.
    parents = _attr(annos, "Parent")
    anno_ids = annos.reset_index().dropna(subset=["id"]).set_index("id")["index"]
    anno_ids = anno_ids[~anno_ids.index.duplicated(keep="first")]
    gene_names = genes[["id", "name"]].dropna(subset=["id"]).set_index("id")["name"]
    gene_names = gene_names[~gene_names.index.duplicated(keep="first")]
    anno_parents = parents.copy()

    p = anno_parents.isin(anno_ids.index)
    n = 0
    while p.any() and n < 100:
        idx_of_parent = anno_ids.loc[anno_parents[p]].to_numpy()
        anno_parents[p] = parents.iloc[idx_of_parent].to_numpy()
        p = anno_parents.isin(anno_ids.index)
        n += 1

    roots = anno_parents.isna()
    childs = ~roots
    in_genes = anno_parents[childs].isin(gene_names.index)
    child_idx = annos.index[childs][in_genes.to_numpy()]
    annos.loc[child_idx, "name"] = gene_names.loc[
        anno_parents[child_idx]
    ].to_numpy()
    missing = annos["name"].isna() if "name" in annos else pd.Series(True, index=annos.index)
    annos.loc[missing, "name"] = _attr(annos[missing], name_attr, "id")

    annos = annos[annos["type"] != "transcript"][TABIX_COLS].drop_duplicates()
    genes = genes[["chr", "start", "end", "name"]]
    return genes, annos
