"""2-D embeddings + clustering of per-bin paircount profiles.

Equivalent of the reference's UMAP+DBSCAN stage (reference
panagram/index.py:1131-1156): embeds each genomic bin's normalized
shared-kmer profile into 2-D and clusters with DBSCAN.  Output CSV schema is
identical (chrom,start,end,umap1,umap2,cluster).

umap-learn is not in this environment; when absent we fall back to a
deterministic PCA embedding (sklearn), which preserves the viewer's use of
the scatter (coarse structure + cluster coloring), with DBSCAN unchanged.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd

logger = logging.getLogger(__name__)

try:  # pragma: no cover - depends on environment
    import umap as _umap
except Exception:
    _umap = None

from sklearn.cluster import DBSCAN
from sklearn.decomposition import PCA


def _embed(data: np.ndarray, params) -> np.ndarray | None:
    if len(data) < 2:
        return None
    try:
        if _umap is not None:
            reducer = _umap.UMAP(
                n_neighbors=params.neighbors,
                min_dist=params.dist,
                n_components=2,
                random_state=42,
            )
            return reducer.fit_transform(data)
        n_comp = min(2, data.shape[1], len(data))
        emb = PCA(n_components=n_comp, random_state=42).fit_transform(data)
        if emb.shape[1] < 2:
            emb = np.pad(emb, ((0, 0), (0, 2 - emb.shape[1])))
        return emb
    except Exception as e:
        logger.warning(f"embedding failed: {e}")
        return None


def run_embedding(paircounts: pd.DataFrame, params, genome_name="") -> pd.DataFrame:
    """paircounts: rows indexed by (chrom, start), columns per genome.
    Returns DataFrame chrom,start,end,umap1,umap2,cluster
    (reference index.py:1131-1156)."""
    embedding = _embed(paircounts.to_numpy(), params)

    if embedding is not None:
        clusters = DBSCAN(eps=params.eps, min_samples=params.samples).fit_predict(embedding)
        out = pd.DataFrame(
            embedding, index=paircounts.index, columns=["umap1", "umap2"]
        ).reset_index()
        out["cluster"] = clusters
    else:
        logger.warning(f"{genome_name} embedding failed for at least one chromosome")
        out = pd.DataFrame(
            {"umap1": 0.0, "umap2": 0.0, "cluster": 0}, index=paircounts.index
        ).reset_index()

    out["end"] = out["start"] + params.bin_size
    return out[["chrom", "start", "end", "umap1", "umap2", "cluster"]]
