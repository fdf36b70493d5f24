#!/usr/bin/env python
"""Exact genome x genome shared-distinct-k-mer matrix from the pan-kmer
dictionary (the blocked popcount matmul, SURVEY §7.2 L-scale — the exact
version of what mash estimates and scripts/pairwise_comp.py samples).

Usage: python scripts/pairwise_matrix.py <index_dir>
"""

import os
import sys

sys.path.insert(0, ".")
from panagram_tpu.index import Index  # noqa: E402
from panagram_tpu.ops.dictionary import PanKmerDict  # noqa: E402


def main():
    index = Index(sys.argv[1])
    d = PanKmerDict.load(index.dict_fname)
    shared = d.pairwise_shared()
    names = list(index.genome_names)
    print("\t" + "\t".join(names))
    for i, n in enumerate(names):
        print(n + "\t" + "\t".join(str(int(x)) for x in shared[i]))
    index.close()


if __name__ == "__main__":
    main()
