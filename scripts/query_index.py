#!/usr/bin/env python
"""Index query demos (equivalent of reference scripts/query_index.py):
gene/annotation/bitmap queries plus boolean k-mer pattern search.

Usage: python scripts/query_index.py <index_dir> <anchor> {gene|anno|bit|pattern} [chrom]
"""

import sys

import numpy as np

sys.path.insert(0, ".")
from panagram_tpu.index import Index  # noqa: E402


def main():
    index_dir, anchor, what = sys.argv[1:4]
    chrom = sys.argv[4] if len(sys.argv) > 4 else None
    index = Index(index_dir)
    genome = index.genomes[anchor]
    chroms = [chrom] if chrom else list(genome.chrs.index)

    for c in chroms:
        size = int(genome.sizes[c])
        if what == "gene":
            print(index.query_genes(anchor, c, 0, size))
        elif what == "anno":
            print(index.query_anno(anchor, c, 0, size))
        elif what == "bit":
            bm = index.query_bitmap(anchor, c, 0, size, 100)
            print(c, "occupancy mean:", bm.sum(axis=1).mean())
        elif what == "pattern":
            # boolean pattern query: positions whose k-mer is present in
            # genome 0 and absent from genome 1 (reference
            # scripts/query_index.py:48-50)
            kmers = index.query_bitmap(anchor, c, 0, size, 1).to_numpy()
            locs = np.flatnonzero((kmers[:, 0] == 1) & (kmers[:, 1] == 0))
            print(c, f"{len(locs)} positions match; first 10: {locs[:10]}")
        else:
            print("Specify: gene, anno, bit, pattern")
            return
    index.close()


if __name__ == "__main__":
    main()
