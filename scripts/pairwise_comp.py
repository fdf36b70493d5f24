#!/usr/bin/env python
"""Per-genome shared-k-mer totals (equivalent of reference
scripts/pairwise_comp.py): sampled bitmap-row column sums per anchor,
printed as name,count,percent-of-anchor.

Usage: python scripts/pairwise_comp.py <anchor> <index_dir>

For the exact genome x genome matrix use scripts/pairwise_matrix.py.
"""

import sys

sys.path.insert(0, ".")
from panagram_tpu.index import Index  # noqa: E402


def main():
    anchor, wd = sys.argv[1], sys.argv[2]
    index = Index(wd)
    genome = index.genomes[anchor]

    data = {g: 0 for g in index.genomes}
    for c in genome.chrs.index:
        end = int(genome.sizes[c])
        bitmap = index.query_bitmap(anchor, c, 0, end, 100)
        b = bitmap.sample(n=min(len(bitmap), 50000), random_state=42)
        sums = b.sum(axis=0)
        for k in data:
            data[k] += int(sums[k])

    for k in data:
        print(f"{k},{data[k]},{data[k] / data[anchor] * 100}")
    index.close()


if __name__ == "__main__":
    main()
