"""Introgression scoring: confusion metrics vs ground truth.

Functional re-implementation of reference score_introgressions.py (541 LoC):
merge per-accession predicted BEDs into bin-space matrices, threshold,
optionally postprocess ground truth (fgap/fcen/rmbn), compute
TP/TN/FP/FN/accuracy/precision/recall/FPR per chromosome x introgression
type, write metrics_<type>.tsv, and render scored heatmaps.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd

from ..io.fasta import iter_fasta
from .core import (
    bed_to_bins,
    fill_gaps,
    get_bed_pieces,
    merge_centromere_regions,
    merge_text_files,
    read_bed_file,
    read_text_file,
    remove_small_regions,
    bins_to_bed,
)


def merge_bed_files(bed_files, index, bin_size, chr_length):
    """Per-accession BEDs -> matrix rows (accession x bin)."""
    rows = {}
    for f in bed_files:
        _, acc, _ = get_bed_pieces(f, index.genomes.keys())
        bins = bed_to_bins(read_bed_file(f), bin_size, chr_length)
        rows[acc] = bins["introgression"]
    if not rows:
        return pd.DataFrame()
    return pd.DataFrame(rows).T


def threshold_matrices(pred_df, gt_df, threshold):
    """gt thresholded at `threshold`, predictions binarized
    (reference :143-184)."""
    gt = gt_df.copy()
    gt[gt < threshold] = 0
    gt[gt != 0] = 1
    pred = pred_df.copy()
    pred[pred < 1] = 0
    pred[pred != 0] = 1
    return pred.astype(int), gt.astype(int)


def score_introgressions(pred_df, gt_df):
    """Confusion metrics (reference :176-224)."""
    shared = list(set(pred_df.index).intersection(set(gt_df.index)))
    p = pred_df.transpose()[shared]
    g = gt_df.transpose()[shared]
    total = g.size
    tp = ((p == 1) & (g == 1)).values.sum()
    tn = ((p == 0) & (g == 0)).values.sum()
    fp = ((p == 1) & (g == 0)).values.sum()
    fn = ((p == 0) & (g == 1)).values.sum()
    with np.errstate(invalid="ignore", divide="ignore"):
        acc = (tp + tn) / total if total else np.nan
        precision = tp / (tp + fp) if (tp + fp) else np.nan
        recall = tp / (tp + fn) if (tp + fn) else np.nan
        fpr = fp / (fp + tn) if (fp + tn) else np.nan
    return pd.DataFrame([{
        "True Positive": tp, "True Negative": tn,
        "False Positive": fp, "False Negative": fn,
        "Accuracy": acc, "Precision": precision,
        "Recall": recall, "FPR": fpr,
    }])


def create_scored_heatmap(pred_df, gt_df, output_file, groups=None):
    """TP/FP/TN/FN heatmap (reference :227-289), matplotlib.  Figure API
    (not pyplot): the runner scores thresholds from a thread pool and
    pyplot's global state is not thread-safe."""
    from matplotlib.colors import ListedColormap
    from matplotlib.figure import Figure

    shared = sorted(set(pred_df.index).intersection(set(gt_df.index)))
    if groups is not None:
        ordered = [n for n in groups.index if n in shared]
        shared = ordered or shared
    p = pred_df.loc[shared].to_numpy()
    g = gt_df.loc[shared].to_numpy()
    # 0=TN 1=FP 2=FN 3=TP
    code = p + 2 * g
    cmap = ListedColormap(["#f0f0f0", "#d62728", "#ff7f0e", "#2ca02c"])
    fig = Figure(figsize=(10, 0.3 * len(shared) + 1.5))
    ax = fig.subplots()
    ax.imshow(code, aspect="auto", cmap=cmap, vmin=0, vmax=3,
              interpolation="nearest")
    ax.set_yticks(range(len(shared)), shared, fontsize=7)
    ax.set_xlabel("bin")
    ax.set_title("TN grey / FP red / FN orange / TP green", fontsize=9)
    fig.savefig(output_file, bbox_inches="tight")


def rescale_prediction_row(row, original_bin_size, new_bin_size, chr_length):
    """Re-bin a prediction row to the ground truth's bin size
    (reference :82-105)."""
    bins_df = row.rename("introgression").to_frame()
    bins_df.index = bins_df.index.astype(int)
    bed_df = bins_to_bed(bins_df, original_bin_size, "nan", "nan")
    bed_df.columns = ["Chromosome", "Start", "End", "Notes"]
    bed_df["Sequence"] = None
    return bed_to_bins(bed_df if len(bed_df) else None, new_bin_size,
                       chr_length)["introgression"]


def score(index, pred_dir, gt_path, ref, output_dir, bin_size=1_000_000,
          min_bins=4, gap_bins=1, gt_threshold=0.5, comp_groups=None,
          actions=None, render_vis=False, groups=None):
    """Score all predicted BEDs (reference main(), :292-537)."""
    pred_path = Path(pred_dir)
    bed_files = ([pred_path] if pred_path.is_file()
                 else sorted(pred_path.glob("*.bed")))
    gt_path = Path(gt_path)
    output_dir = Path(output_dir)
    (output_dir / "pred").mkdir(parents=True, exist_ok=True)
    (output_dir / "gt_postprocessed").mkdir(parents=True, exist_ok=True)
    if render_vis:
        (output_dir / "heatmaps").mkdir(parents=True, exist_ok=True)

    ref_genome = index.genomes[ref]

    chrs, intro_types = set(), set()
    for f in bed_files:
        chrom, _, ityp = get_bed_pieces(f, index.genomes.keys())
        chrs.add(chrom)
        intro_types.add(ityp)

    all_metrics = {}
    for chrom in sorted(chrs):
        for intro_type in sorted(intro_types):
            if gt_path.is_file():
                gt_df = read_text_file(gt_path)
            elif intro_type in ("REF", "REFA", "merged"):
                if not comp_groups:
                    raise ValueError("--cmp required for REF/merged scoring")
                files = []
                for grp in comp_groups:
                    files += list(gt_path.glob(f"{chrom}_{grp}.txt"))
                if not files:
                    raise ValueError(f"no ground truth for {chrom}")
                gt_df = merge_text_files(files)
            else:
                files = list(gt_path.glob(f"{chrom}_{intro_type}.txt"))
                if not files:
                    raise ValueError(f"no ground truth {chrom}_{intro_type}.txt")
                gt_df = read_text_file(files[0])

            chr_length = int(ref_genome.sizes[chrom])
            sel = [f for f in bed_files
                   if f.name.endswith(f"_{chrom}_{intro_type}.bed")]
            pred_df = merge_bed_files(sel, index, bin_size, chr_length)
            if pred_df.empty:
                continue
            pred_df.to_csv(output_dir / "pred" / f"{chrom}_{intro_type}.txt",
                           sep="\t")

            pred_df, gt_df = threshold_matrices(pred_df, gt_df, gt_threshold)

            gt_bin_size = int(gt_df.columns[1]) if len(gt_df.columns) > 1 else bin_size
            eff_bin = bin_size
            if bin_size != gt_bin_size:
                pred_df = pred_df.apply(
                    rescale_prediction_row, original_bin_size=bin_size,
                    new_bin_size=gt_bin_size, chr_length=chr_length, axis=1)
                eff_bin = gt_bin_size

            if actions:
                cols = gt_df.columns
                for action in actions:
                    if action == "fgap":
                        gt_df = gt_df.apply(
                            lambda r: pd.Series(fill_gaps(r, gap_bins)),
                            axis=1)
                    elif action == "rmbn":
                        gt_df = gt_df.apply(
                            lambda r: pd.Series(
                                remove_small_regions(r, min_bins)), axis=1)
                    elif action == "fcen":
                        seqs = dict(iter_fasta(ref_genome._fasta_path))
                        def _fcen(row):
                            bins_df = row.rename("introgression").to_frame()
                            bins_df.index = cols.astype(int)
                            bed = bins_to_bed(bins_df, eff_bin, chrom, "gt")
                            bed.columns = ["Chromosome", "Start", "End", "Notes"]
                            bed["Sequence"] = None
                            merged = merge_centromere_regions(bed, seqs, eff_bin)
                            return bed_to_bins(merged, eff_bin,
                                               chr_length)["introgression"]
                        gt_df = gt_df.apply(_fcen, axis=1)
                gt_df.columns = cols
                gt_df.to_csv(
                    output_dir / "gt_postprocessed" / f"{chrom}_{intro_type}.txt",
                    sep="\t")

            metrics = score_introgressions(pred_df, gt_df)
            if render_vis:
                create_scored_heatmap(
                    pred_df, gt_df,
                    output_dir / "heatmaps" / f"{chrom}_{intro_type}.png",
                    groups=groups)

            metrics.index = [chrom]
            if intro_type in all_metrics:
                all_metrics[intro_type] = pd.concat(
                    [all_metrics[intro_type], metrics])
            else:
                all_metrics[intro_type] = metrics

    for intro_type, df in all_metrics.items():
        df.to_csv(output_dir / f"metrics_{intro_type}.tsv", sep="\t")
    return all_metrics
