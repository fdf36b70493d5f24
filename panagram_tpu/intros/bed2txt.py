"""Ground-truth BED -> per-chromosome text matrices for scoring.

Functional re-implementation of reference bed_to_txt.py:10-92: the
simulator's introgression BED is binned and duplicated to every offspring
genome, written as <chr>_<wild_type_group>.txt next to the BED.
"""

from __future__ import annotations

import argparse
from pathlib import Path

from ..index import Index
from .core import bed_to_bins, read_bed_file


def bed_to_text(gt_bed_file, index_dir, ref, wild_type, wild_type_group,
                bin_size=1_000_000):
    gt_bed_file = Path(gt_bed_file).resolve()
    bed_df = read_bed_file(gt_bed_file)
    if bed_df is None or bed_df.empty:
        print("No introgressions found in ground truth bed file.")
        return []

    index = Index(str(index_dir))
    ref_genome = index.genomes[ref]
    offspring = [g for name, g in index.genomes.items()
                 if name not in (ref, wild_type)]

    outputs = []
    for chrom in bed_df["Chromosome"].unique():
        chr_length = int(ref_genome.sizes[chrom])
        sub = bed_df[bed_df["Chromosome"] == chrom]
        bins_df = bed_to_bins(sub, bin_size, chr_length)
        for g in offspring:
            bins_df[g.name] = bins_df["introgression"]
        out = bins_df.drop(columns=["introgression"]).T
        out.index.name = "Sample"
        path = gt_bed_file.parent / f"{chrom}_{wild_type_group}.txt"
        out.to_csv(path, sep="\t")
        outputs.append(path)
    return outputs


def main(argv=None):
    p = argparse.ArgumentParser(description="BED -> scoring text matrices")
    p.add_argument("--gt_bed_file", required=True)
    p.add_argument("--index_dir", required=True)
    p.add_argument("--ref", required=True)
    p.add_argument("--wild_type", required=True)
    p.add_argument("--wild_type_group", required=True)
    p.add_argument("--bin_size", type=int, default=1_000_000)
    args = p.parse_args(argv)
    bed_to_text(args.gt_bed_file, args.index_dir, args.ref, args.wild_type,
                args.wild_type_group, args.bin_size)


if __name__ == "__main__":
    main()
