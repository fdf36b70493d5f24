"""Introgression caller.

Functional re-implementation of reference call_introgressions.py (970 LoC):
per anchor x chromosome, query the pan-kmer bitmap at a coarse step, bin to
k-mer-similarity fractions (with optional fixed-kmer removal `rmf` and
unique-kmer masking `rmu`), preprocess (per-genome trimmed-mean
normalization `gnm`, optional edge taper `edg`, mean/median smoothing
`sft`/`ssz`), threshold (2-way vs REF / 3-way vs a donor group / simple
REF-space), and emit merged BED calls plus similarity heatmaps.

The expensive per-(anchor, chromosome) work — bitmap query, binning,
preprocessing, similarity frames — is computed once and shared across ALL
thresholds; the thresholds themselves are applied as one broadcast
comparison over a [T, bins] matrix (SURVEY §2.7 P7's per-threshold process
fan-out re-expressed as an array axis).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd
from scipy.ndimage import median_filter, uniform_filter1d

from .core import bins_to_bed

SWEEP_2WAY = [round(0.1 + 0.05 * i, 2) for i in range(18)]
SWEEP_3WAY = [round(0.04 * i, 2) for i in range(18)]


def bitmap_to_bins(bitmap, binlen, omit_fixed_kmers=False,
                   omit_unique_kmers=False, ref_genome_name=None,
                   outgroup_accessions=None):
    """Binned k-mer similarity in [0, 1] (reference call_introgressions.py
    :58-113, a modified copy of Index.bitmap_to_bins)."""
    df = bitmap.set_index(bitmap.index // binlen)

    if omit_unique_kmers:
        keep_cols = list(outgroup_accessions) + [ref_genome_name]
        mask = df[keep_cols].sum(axis=1) == 0
        df.loc[mask, keep_cols] = 1

    all_bins = df.index.unique()

    if omit_fixed_kmers:
        df = df.loc[~(df == 1).all(axis=1)]

    binned = df.groupby(level=0).sum()
    binned = binned.reindex(all_bins, fill_value=1)
    binned = binned.set_index(binned.index * binlen).T
    binned = binned.div(binned.max(axis=0), axis=1)
    return binned


def row_trimmed_mean(row, trim_std):
    mean = row.mean()
    if trim_std == -1:
        return mean
    std = row.std()
    trimmed = row[(row >= mean - trim_std * std) & (row <= mean + trim_std * std)]
    return trimmed.mean()


def get_genome_similarities(genome, bitmap_step, bin_size, omit_fixed_kmers,
                            omit_unique_for, ref_genome_name,
                            outgroup_accessions, trim_std):
    """Genome-wide per-accession trimmed-mean similarity (reference
    :139-191)."""
    all_bins = []
    for chr_name in genome.sizes.keys():
        chr_size = genome.sizes[chr_name]
        chr_bitmap = genome.query(chr_name, 0, chr_size, step=bitmap_step)
        all_bins.append(bitmap_to_bins(
            chr_bitmap, bin_size, omit_fixed_kmers, omit_unique_for,
            ref_genome_name, outgroup_accessions,
        ))
    all_df = pd.concat(all_bins, axis=1)
    return all_df.apply(row_trimmed_mean, trim_std=trim_std, axis=1)


def smooth_row(row, filter_type, filter_size):
    if filter_type == "mean":
        sm = uniform_filter1d(row.values, size=filter_size)
    elif filter_type == "median":
        sm = median_filter(row.values, size=filter_size)
    else:
        return row
    return pd.Series(sm, index=row.index)


def edge_tapered_row_normalization(df, intensity=0.1):
    """Gaussian center-boost normalization (reference :212-238)."""
    n_cols = df.shape[1]
    x = np.linspace(-1, 1, n_cols)
    window = np.exp(-4 * x**2)
    center_boost = intensity * (window / window.max())
    norm = df.mul(1 + center_boost, axis=1).clip(0, 1)
    norm = norm.where(norm == 1, norm - 0.2)
    return norm.clip(0, 1)


def preprocess_binned_bitmap(binned, genome_similarities,
                             similarity_normalization_mean, smoothing_filter,
                             smoothing_filter_size, edge_normalization):
    """Preprocessing chain (reference :241-286)."""
    binned = binned.copy().round(2)
    if genome_similarities is not None:
        target = similarity_normalization_mean
        if target == -1:
            target = genome_similarities[genome_similarities != 1].max()
        delta = target - genome_similarities
        for idx in binned.index:
            row = binned.loc[idx]
            mask = row <= 0.98
            row[mask] += delta[idx]
            binned.loc[idx] = row.clip(0, 1)
    if edge_normalization:
        binned = edge_tapered_row_normalization(binned)
    if smoothing_filter:
        binned = binned.apply(smooth_row, axis=1, filter_type=smoothing_filter,
                              filter_size=smoothing_filter_size)
    return binned


def similarity_frame(binned, anchor, comp_group):
    """Threshold-INDEPENDENT similarity columns for one comparison group
    (the expensive half of reference :289-339): mean similarity of the
    anchor's own group, max of the comparison group, and (3-way) the mean
    REF similarity.  Computed once and shared by every threshold."""
    anchor_group = binned.loc[anchor, "group"]
    own = (binned[binned["group"] == anchor_group]
           .drop(columns=["group"]).drop(anchor, axis=0))
    comp = binned[binned["group"] == comp_group].drop(columns=["group"])

    sims = own.mean(axis=0).to_frame(name="anchor_sim")
    sims["comp_sim"] = comp.max(axis=0)
    if comp_group != "REF":
        ref = binned[binned["group"] == "REF"].drop(columns=["group"])
        sims["ref_sim"] = ref.mean(axis=0)
    return sims


def similarity_frame_simple(binned, anchor):
    """REF-space variant of similarity_frame (reference :342-358)."""
    sims = binned.drop(columns=["group"]).loc[anchor].to_frame(name="anchor_sim")
    sims["comp_sim"] = pd.NA
    return sims


def threshold_matrix(sims, comp_group, thresholds, simple=False):
    """ALL thresholds applied in one broadcast comparison: int [T, bins]
    (SURVEY §2.7 P7 — the reference fans a process per threshold; here the
    threshold axis is an array axis over the shared similarity frame)."""
    thr = np.asarray(thresholds, dtype=float)[:, None]
    if simple:
        return (sims["anchor_sim"].to_numpy(float)[None, :] < thr).astype(int)
    if comp_group == "REF":
        return (sims["comp_sim"].to_numpy(float)[None, :] < thr).astype(int)
    ref_sim = sims["ref_sim"].to_numpy(float)[None, :]
    comp_sim = sims["comp_sim"].to_numpy(float)[None, :]
    return ((ref_sim < 0.95) & (comp_sim >= ref_sim + thr)).astype(int)


def visualize(binned, output_file, inverse=False, title=None, groups=None):
    """Similarity heatmap (matplotlib stand-in for the reference's plotly
    px.imshow, :398-490); writes SVG/PNG by file extension.

    Built through the object-oriented Figure API, NOT pyplot: the caller
    fan-outs (anchor x chromosome thread pool, per-threshold scoring
    pool) render concurrently and pyplot's global figure registry is not
    thread-safe."""
    from matplotlib.figure import Figure

    if groups is not None:
        ordered = [n for n in groups.index if n in binned.index]
        intros = None
        if "Introgressions" in binned.index:
            intros = binned.loc["Introgressions"].copy()
        binned = binned.reindex(index=ordered)
        if intros is not None:
            binned.loc["Introgressions"] = intros

    data = binned.to_numpy(dtype=float)
    fig = Figure(figsize=(max(7, min(30, data.shape[1] / 20)),
                          max(3, 0.25 * data.shape[0] + 1.5)))
    ax = fig.subplots()
    cmap = "plasma_r" if inverse else "viridis"
    im = ax.imshow(data, aspect="auto", cmap=cmap, vmin=0, vmax=1,
                   interpolation="nearest",
                   extent=[binned.columns[0],
                           binned.columns[-1] if len(binned.columns) > 1 else 1,
                           data.shape[0] - 0.5, -0.5])
    ax.set_yticks(range(data.shape[0]), list(binned.index), fontsize=7)
    ax.set_xlabel("Position (Bp)")
    if title:
        ax.set_title(title, fontsize=10)
    fig.colorbar(im, ax=ax, label="Kmer Similarity")
    fig.savefig(output_file, bbox_inches="tight")


def run_introgression_finder(anchor, genome, ref_genome, chr_name, groups,
                             comp_groups, thresholds, bitmap_step, bin_size,
                             using_ref_space, preprocessing_args,
                             genome_similarities, ref_genome_similarities,
                             render_vis, output_dir):
    """Per anchor x chromosome finder (reference :493-656)."""
    output_dir = Path(output_dir)
    chr_size = genome.sizes[chr_name]
    chr_bitmap = genome.query(chr_name, 0, chr_size, step=bitmap_step)
    pp = dict(preprocessing_args)
    omit_fixed_kmers = pp.pop("omit_fixed_kmers")
    omit_unique_kmers = pp.pop("omit_unique_kmers")
    ref_genome_name = pp.pop("ref_genome_name")
    outgroup_accessions = pp.pop("outgroup_accessions")

    if using_ref_space:
        ref_chr_size = ref_genome.sizes[chr_name]
        ref_chr_bitmap = ref_genome.query(chr_name, 0, ref_chr_size,
                                          step=bitmap_step)
        binned = bitmap_to_bins(ref_chr_bitmap, bin_size, omit_fixed_kmers)
        binned = preprocess_binned_bitmap(binned, ref_genome_similarities, **pp)
    else:
        binned = bitmap_to_bins(chr_bitmap, bin_size, omit_fixed_kmers,
                                omit_unique_kmers, ref_genome_name,
                                outgroup_accessions)
        binned = preprocess_binned_bitmap(binned, genome_similarities, **pp)

    binned = binned.merge(groups, left_index=True, right_index=True, how="left")
    vis_bitmap = binned

    # similarity frames are threshold-independent: compute each comparison
    # group's once, then apply EVERY threshold as one broadcast comparison
    # ([T, bins] matrix) — SURVEY §2.7 P7's threshold fan-out as an array axis
    sims_by_comp = {}
    mat_by_comp = {}
    for comp_group in comp_groups:
        if using_ref_space:
            sims = similarity_frame_simple(binned, anchor)
        else:
            sims = similarity_frame(binned, anchor, comp_group)
        sims_by_comp[comp_group] = sims
        mat_by_comp[comp_group] = threshold_matrix(
            sims, comp_group, thresholds, simple=using_ref_space)

    for ti, threshold in enumerate(thresholds):
        merged = None
        threshold_dir = output_dir / f"{output_dir.name}_{threshold}"
        raw_dir = threshold_dir / "raw"
        raw_dir.mkdir(parents=True, exist_ok=True)
        if render_vis:
            (threshold_dir / "heatmaps").mkdir(parents=True, exist_ok=True)

        for comp_group in comp_groups:
            intros = sims_by_comp[comp_group].copy()
            intros["introgression"] = mat_by_comp[comp_group][ti]
            if not using_ref_space and comp_group == "REF":
                comp_group = "REFA"

            if len(comp_groups) > 1:
                merged = intros if merged is None else merged + intros

            if render_vis:
                vis_bitmap.loc["Introgressions"] = (
                    ~intros["introgression"].astype(bool)).astype(int)
                out_vis = (threshold_dir / "heatmaps" /
                           f"{anchor}_{chr_name}_{comp_group}_heatmap.svg")
                visualize(vis_bitmap.drop(columns=["group"]), out_vis,
                          inverse=True,
                          title=f"{anchor} {chr_name} Introgressions "
                                f"Called with {comp_group}",
                          groups=groups)

            bed = bins_to_bed(intros, bin_size, chr_name, comp_group)
            bed.to_csv(raw_dir / f"{anchor}_{chr_name}_{comp_group}.bed",
                       header=False, index=False, sep="\t")

        if merged is not None:
            if render_vis:
                mx = max(int(merged["introgression"].max()), 1)
                vis_bitmap.loc["Introgressions"] = (
                    1 - merged["introgression"] / mx)
                out_vis = (threshold_dir / "heatmaps" /
                           f"{anchor}_{chr_name}_merged_heatmap.svg")
                visualize(vis_bitmap.drop(columns=["group"]), out_vis,
                          inverse=True,
                          title=f"{anchor} {chr_name} Merged Introgressions",
                          groups=groups)
            bed = bins_to_bed(merged, bin_size, chr_name, "merged")
            bed.to_csv(raw_dir / f"{anchor}_{chr_name}_merged.bed",
                       header=False, index=False, sep="\t")


def call_introgressions(index, groups, anchors, comp_groups, thresholds,
                        output_dir, bitmap_step=100, bin_size=1_000_000,
                        gnm=None, trm=3.0, sft=None, ssz=5, edg=False,
                        rmf=False, rmu=None, ogrp=None, urf=False, ref=None,
                        chromosomes=None, render_vis=False, threads=1):
    """Top-level caller (reference main(), :724-966), in-process."""
    from concurrent.futures import ThreadPoolExecutor

    comp_groups = list(dict.fromkeys(comp_groups))
    if "REF" in comp_groups and comp_groups != ["REF"]:
        raise ValueError("REF must be the only comparison group (2-way mode)")

    outgroup_accessions = []
    omit_unique_for = rmu
    if omit_unique_for is not None:
        if ref is None:
            raise ValueError("--ref required with rmu")
        if len(omit_unique_for) == 1 and str(omit_unique_for[0]).lower() == "true":
            omit_unique_for = list(anchors)
        if ogrp is None:
            raise ValueError("--ogrp required with rmu")
        outgroup_accessions = groups[groups.group.isin(ogrp)].index.tolist()

    base_pp = dict(
        similarity_normalization_mean=gnm,
        smoothing_filter=sft,
        smoothing_filter_size=ssz,
        edge_normalization=edg,
        omit_fixed_kmers=rmf,
    )

    ref_genome = None
    ref_genome_similarities = None
    if urf:
        if comp_groups != ["REF"]:
            raise ValueError("urf requires cmp == [REF]")
        ref_genome = index.genomes[ref]
        if gnm:
            ref_genome_similarities = get_genome_similarities(
                ref_genome, bitmap_step, bin_size, rmf, None, None, None, trm)

    jobs = []
    for anchor in anchors:
        anchor_group = groups.loc[anchor, "group"]
        loop_comp = [g for g in comp_groups if g != anchor_group]
        if not loop_comp:
            continue

        pp = dict(base_pp)
        if omit_unique_for and anchor in omit_unique_for:
            loop_urf = False
            pp["omit_unique_kmers"] = True
            pp["ref_genome_name"] = ref
            pp["outgroup_accessions"] = outgroup_accessions
        else:
            loop_urf = urf
            pp["omit_unique_kmers"] = False
            pp["ref_genome_name"] = None
            pp["outgroup_accessions"] = None

        genome = index.genomes[anchor]
        genome_similarities = None
        if gnm and not loop_urf:
            genome_similarities = get_genome_similarities(
                genome, bitmap_step, bin_size, rmf,
                pp["omit_unique_kmers"], pp["ref_genome_name"],
                pp["outgroup_accessions"], trm)

        chrs = chromosomes or list(genome.sizes.keys())
        for chr_name in chrs:
            jobs.append((anchor, genome, ref_genome, chr_name, loop_comp,
                         pp, genome_similarities, loop_urf))

    def run_job(job):
        anchor, genome, ref_g, chr_name, loop_comp, pp, gsim, loop_urf = job
        run_introgression_finder(
            anchor, genome, ref_g, chr_name, groups, loop_comp, thresholds,
            bitmap_step, bin_size, loop_urf, pp, gsim,
            ref_genome_similarities, render_vis, Path(output_dir))

    if threads > 1:
        with ThreadPoolExecutor(max_workers=threads) as ex:
            list(ex.map(run_job, jobs))
    else:
        for job in jobs:
            run_job(job)
