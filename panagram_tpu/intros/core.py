"""Shared introgression primitives: BED <-> bin conversions, gap/region
filters, centromere merging, filename conventions.

Functional equivalents of reference postprocess_introgressions.py:100-594
and call_introgressions.py:361-395 (bins_to_bed).
"""

from __future__ import annotations

import math
from pathlib import Path

import numpy as np
import pandas as pd

BED_COLS = ["Chromosome", "Start", "End", "Notes"]


def bed_file_is_empty(bed_file) -> bool:
    p = Path(bed_file)
    return (not p.exists()) or p.stat().st_size == 0


def read_bed_file(bed_file):
    """BED -> DataFrame[Chromosome,Start,End,Notes,Sequence] or None."""
    if bed_file_is_empty(bed_file):
        return None
    df = pd.read_csv(bed_file, sep="\t", header=None)
    df = df.iloc[:, 0:4]
    df.columns = BED_COLS
    df["Sequence"] = None
    return df


def get_intro_df_template(bin_size, chr_length):
    n_bins = math.ceil(chr_length / bin_size)
    bin_names = [i * bin_size for i in range(n_bins)]
    return pd.DataFrame(np.zeros((1, n_bins), int), columns=bin_names)


def bed_to_bins(bed_df, bin_size, chr_length):
    """BED -> per-bin 0/1 column 'introgression', rounding coordinates to the
    nearest bin (reference postprocess_introgressions.py:434-486)."""
    intro_df = get_intro_df_template(bin_size, chr_length)
    if bed_df is None or bed_df.empty:
        out = intro_df.T
        out.columns = ["introgression"]
        return out
    bed_df = bed_df.copy()
    start_bin = ((bed_df["Start"] / bin_size).round() * bin_size).astype(int)
    end_bin = ((bed_df["End"] / bin_size).round() * bin_size).astype(int)
    labels = []
    for s, e, st, en in zip(start_bin, end_bin, bed_df["Start"], bed_df["End"]):
        lab = list(range(s, e, bin_size))
        if not lab and (en - st) >= bin_size / 4:
            lab = [s]
        labels.extend(lab)
    last = intro_df.columns[-1]
    for lab in labels:
        if lab <= last:
            intro_df.loc[:, lab] = 1
    out = intro_df.T
    out.columns = ["introgression"]
    return out


def bins_to_bed(bins_df, bin_size, chr_name, comp_group):
    """Per-bin 0/1 -> merged BED rows (reference call_introgressions.py
    :361-395: adjacent introgressed bins merge; end = start + n*bin - 1)."""
    intro = bins_df[bins_df["introgression"] > 0].copy()
    if intro.empty:
        return pd.DataFrame(columns=["chr", "start", "end", "name"])
    intro["start"] = intro.index.astype(int)
    intro["end"] = intro["start"] + bin_size
    gaps = (intro["start"] - intro["end"].shift(1)).fillna(0)
    groups = gaps.cumsum()
    out = []
    for _, sub in intro.groupby(groups):
        start = int(sub["start"].iloc[0])
        n = len(sub)
        out.append((chr_name, start, start + n * bin_size - 1,
                    f"{comp_group}_intro"))
    return pd.DataFrame(out, columns=["chr", "start", "end", "name"])


def fill_gaps(row, gap_size):
    """Fill 0-gaps of length <= gap_size between introgressed runs
    (reference postprocess_introgressions.py:488-522)."""
    arr = np.asarray(row, dtype=int).copy()
    i = 0
    n = len(arr)
    while i < n:
        if arr[i] == 1:
            while i < n and arr[i] == 1:
                i += 1
            region_start = i
            while i < n and arr[i] == 0:
                i += 1
            region_end = i
            if i < n and region_end - region_start <= gap_size:
                arr[region_start:region_end] = 1
        else:
            i += 1
    return arr


def remove_small_regions(row, min_size):
    """Drop 1-runs shorter than min_size bins
    (reference postprocess_introgressions.py:525-553)."""
    arr = np.asarray(row, dtype=int).copy()
    i = 0
    n = len(arr)
    while i < n:
        if arr[i] == 1:
            start = i
            while i < n and arr[i] == 1:
                i += 1
            if i - start < min_size:
                arr[start:i] = 0
        else:
            i += 1
    return arr


def merge_centromere_regions(bed_df, chrom_seqs, bin_size):
    """Merge introgressions separated by exactly 2 bins when the gap contains
    a centromere-like run of >= 50 N's (reference
    postprocess_introgressions.py:127-180).  chrom_seqs: {chrom: sequence}."""
    if bed_df is None or bed_df.empty:
        return bed_df
    bed_df = bed_df.sort_values("Start").reset_index(drop=True)
    rows = bed_df.to_dict("records")
    merged = [rows[0]]
    for r in rows[1:]:
        prev = merged[-1]
        gap_bins = (r["Start"] - prev["End"]) / bin_size
        if gap_bins == 2 and r["Chromosome"] == prev["Chromosome"]:
            seq = chrom_seqs.get(r["Chromosome"], "")
            gap_seq = seq[int(prev["End"]) : int(r["Start"])]
            if "N" * 50 in gap_seq:
                prev["End"] = r["End"]
                continue
        merged.append(dict(r))
    out = pd.DataFrame(merged)
    out["Start"] = out["Start"].astype(int)
    out["End"] = out["End"].astype(int)
    return out[["Chromosome", "Start", "End", "Notes", "Sequence"]]


def get_bed_pieces(bed_file, accession_candidates):
    """Parse <accession>_<chromosome>_<intro_type>.bed; accession resolved
    as longest matching prefix (reference postprocess:556-594)."""
    stem = Path(bed_file).stem
    if "_" in stem:
        stem_no_intro, intro_type = stem.rsplit("_", 1)
        matches = [
            a for a in accession_candidates
            if stem_no_intro == a or stem_no_intro.startswith(f"{a}_")
        ]
        if matches:
            accession = max(matches, key=len)
            chrom = stem_no_intro[len(accession):].lstrip("_")
            if chrom:
                return chrom, accession, intro_type
    raise ValueError(
        f"Unable to parse bed file name '{stem}'. Expected "
        "'<accession>_<chromosome>_<intro_type>.bed'."
    )


def read_text_file(text_file):
    """Per-chromosome ground-truth / prediction matrix (rows = accessions,
    columns = bin starts)."""
    df = pd.read_csv(text_file, sep="\t", header=0, index_col=0).fillna(0)
    df.columns = df.columns.astype(int)
    return df


def merge_text_files(text_files):
    dfs = [read_text_file(f) for f in text_files]
    return pd.concat(dfs).groupby(level=0).max()
