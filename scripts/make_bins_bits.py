#!/usr/bin/env python
"""Unique/universal k-mer counts per genomic bin (equivalent of reference
scripts/make_bins_bits.py): for each ~200 kbp bin of an anchor genome,
count positions whose k-mer occurs in exactly one genome (unique) and in
all genomes (universal).

Usage: python scripts/make_bins_bits.py <index_dir> <anchor> [bin_kbp]
"""

import sys

import numpy as np

sys.path.insert(0, ".")
from panagram_tpu.index import Index  # noqa: E402


def main():
    index = Index(sys.argv[1])
    anchor = sys.argv[2]
    bin_len = int(sys.argv[3]) * 1000 if len(sys.argv) > 3 else 200_000
    genome = index.genomes[anchor]
    n = index.ngenomes

    print("chr\tstart\tend\tunique\tuniversal\ttotal")
    for c in genome.chrs.index:
        size = int(genome.sizes[c])
        for start in range(0, size, bin_len):
            end = min(start + bin_len, size)
            occ = index.query_bitmap(anchor, c, start, end, 100).sum(axis=1)
            occ = occ.to_numpy()
            print(f"{c}\t{start}\t{end}\t{int((occ == 1).sum())}"
                  f"\t{int((occ == n).sum())}\t{len(occ)}")
    index.close()


if __name__ == "__main__":
    main()
