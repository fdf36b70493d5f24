#!/usr/bin/env python
"""Regenerate bin-embedding CSVs for anchors (equivalent of reference
scripts/write_umaps.py / run_umaps.sh).

Usage: python scripts/write_umaps.py <index_dir> [anchor ...]
"""

import sys

sys.path.insert(0, ".")
from panagram_tpu.index import Index  # noqa: E402


def main():
    index = Index(sys.argv[1])
    anchors = sys.argv[2:] or index.anchor_genomes
    for a in anchors:
        print(f"embedding {a} ...")
        index.genomes[a].write_umaps()
    index.close()


if __name__ == "__main__":
    main()
