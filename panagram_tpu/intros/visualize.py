"""Sweep visualization: PR curves, MCC curves, PR-AUC across thresholds.

Functional re-implementation of reference visualize_introgressions.py
(565 LoC) with matplotlib; the reportlab PDF heatmap collage is replaced by
a matplotlib montage (reportlab is not available in this environment).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
import pandas as pd


def load_sweep_metrics(output_dir, thresholds):
    """Collect metrics_<type>.tsv across <out>/<out>_<thr>/scored/."""
    output_dir = Path(output_dir)
    rows = []
    for thr in thresholds:
        scored = output_dir / f"{output_dir.name}_{thr}" / "scored"
        if not scored.is_dir():
            continue
        for f in scored.glob("metrics_*.tsv"):
            intro_type = f.stem.split("_", 1)[1]
            df = pd.read_csv(f, sep="\t", index_col=0)
            for chrom, r in df.iterrows():
                rows.append({"threshold": float(thr), "type": intro_type,
                             "chr": chrom, **r.to_dict()})
    return pd.DataFrame(rows)


def mcc(row):
    tp, tn = row["True Positive"], row["True Negative"]
    fp, fn = row["False Positive"], row["False Negative"]
    denom = np.sqrt(float((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)))
    return (tp * tn - fp * fn) / denom if denom else 0.0


def pr_auc(df):
    """Area under the precision-recall points ordered by recall
    (reference :86-171)."""
    sub = df.dropna(subset=["Precision", "Recall"]).sort_values("Recall")
    if len(sub) < 2:
        return float("nan")
    return float(np.trapezoid(sub["Precision"], sub["Recall"]))


def plot_pr_curves(metrics, output_dir):
    out = Path(output_dir) / "sweep_pr_curve.png"
    fig, ax = plt.subplots(figsize=(6, 5))
    for intro_type, sub in metrics.groupby("type"):
        agg = sub.groupby("threshold")[
            ["True Positive", "True Negative", "False Positive",
             "False Negative"]].sum()
        with np.errstate(invalid="ignore"):
            prec = agg["True Positive"] / (
                agg["True Positive"] + agg["False Positive"])
            rec = agg["True Positive"] / (
                agg["True Positive"] + agg["False Negative"])
        ax.plot(rec, prec, "o-", label=f"{intro_type} "
                f"(AUC {pr_auc(pd.DataFrame({'Precision': prec, 'Recall': rec})):.3f})")
        for t, r, p in zip(agg.index, rec, prec):
            ax.annotate(f"{t:g}", (r, p), fontsize=6)
    ax.set_xlabel("Recall")
    ax.set_ylabel("Precision")
    ax.set_xlim(0, 1.05)
    ax.set_ylim(0, 1.05)
    ax.legend(fontsize=8)
    ax.set_title("Precision-Recall across thresholds")
    fig.savefig(out, bbox_inches="tight", dpi=120)
    plt.close(fig)
    return out


def plot_per_chr_pr(metrics, output_dir):
    out = Path(output_dir) / "sweep_pr_per_chr.png"
    chrs = sorted(metrics["chr"].unique())
    fig, axes = plt.subplots(1, max(len(chrs), 1),
                             figsize=(4 * max(len(chrs), 1), 4),
                             squeeze=False)
    for ax, chrom in zip(axes[0], chrs):
        sub = metrics[metrics["chr"] == chrom]
        for intro_type, s2 in sub.groupby("type"):
            s2 = s2.sort_values("Recall")
            ax.plot(s2["Recall"], s2["Precision"], "o-", label=intro_type)
        ax.set_title(str(chrom))
        ax.set_xlabel("Recall")
        ax.set_ylabel("Precision")
        ax.legend(fontsize=7)
    fig.savefig(out, bbox_inches="tight", dpi=120)
    plt.close(fig)
    return out


def plot_mcc(metrics, output_dir):
    out = Path(output_dir) / "sweep_mcc.png"
    fig, ax = plt.subplots(figsize=(6, 4))
    for intro_type, sub in metrics.groupby("type"):
        agg = sub.groupby("threshold")[
            ["True Positive", "True Negative", "False Positive",
             "False Negative"]].sum()
        ax.plot(agg.index, [mcc(r) for _, r in agg.iterrows()], "o-",
                label=intro_type)
    ax.set_xlabel("threshold")
    ax.set_ylabel("MCC")
    ax.legend(fontsize=8)
    ax.set_title("Matthews correlation across thresholds")
    fig.savefig(out, bbox_inches="tight", dpi=120)
    plt.close(fig)
    return out


def plot_heatmap_montage(output_dir, thresholds, max_tiles=9):
    """3x3 montage of scored heatmaps across thresholds (stand-in for the
    reference's reportlab PDF collage, :389-459)."""
    output_dir = Path(output_dir)
    pngs = []
    for thr in thresholds:
        d = output_dir / f"{output_dir.name}_{thr}" / "scored" / "heatmaps"
        pngs += sorted(d.glob("*.png"))[:1]
    pngs = pngs[:max_tiles]
    if not pngs:
        return None
    cols = 3
    rows = -(-len(pngs) // cols)
    fig, axes = plt.subplots(rows, cols, figsize=(cols * 5, rows * 3),
                             squeeze=False)
    for ax in axes.flat:
        ax.axis("off")
    for ax, png in zip(axes.flat, pngs):
        ax.imshow(plt.imread(png))
        ax.set_title(png.parent.parent.parent.name, fontsize=7)
    out = output_dir / "sweep_heatmaps.png"
    fig.savefig(out, bbox_inches="tight", dpi=110)
    plt.close(fig)
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description="Sweep visualization")
    p.add_argument("-v", "--visuals", nargs="+",
                   default=["prc", "prcc", "prca", "mcc", "shtmp"])
    p.add_argument("--dir", required=True)
    p.add_argument("--thresholds", nargs="+", type=float, required=True)
    args = p.parse_args(argv)

    metrics = load_sweep_metrics(args.dir, args.thresholds)
    if metrics.empty:
        print("No sweep metrics found.")
        return
    if "prc" in args.visuals or "prca" in args.visuals:
        plot_pr_curves(metrics, args.dir)
    if "prcc" in args.visuals:
        plot_per_chr_pr(metrics, args.dir)
    if "mcc" in args.visuals:
        plot_mcc(metrics, args.dir)
    if "shtmp" in args.visuals:
        plot_heatmap_montage(args.dir, args.thresholds)
    metrics.to_csv(Path(args.dir) / "sweep_metrics.tsv", sep="\t", index=False)


if __name__ == "__main__":
    main()
