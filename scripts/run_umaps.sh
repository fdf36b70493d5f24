#!/bin/bash
# Batch embedding driver (equivalent of reference scripts/run_umaps.sh):
# regenerate the bin-embedding CSVs for an anchor, render per-chromosome
# and whole-genome (ALL) embedding plots, then dump the pairwise
# shared-kmer percentages for every sample.
#
# Usage: scripts/run_umaps.sh <index_dir> <anchor> [out_dir]
set -euo pipefail

index_dir=$1
anchor=$2
out_dir=${3:-$index_dir/anchor/$anchor/umaps}

here=$(dirname "$0")
mkdir -p "$out_dir"

python "$here/write_umaps.py" "$index_dir" "$anchor"

# per-chromosome plots: chromosome names are column 1 of the anchor's
# chrs.tsv (the .fai analogue the reference iterates)
tail -n +2 "$index_dir/anchor/$anchor/chrs.tsv" | cut -f1 | sort -u |
while read -r chrom; do
    echo "plotting $anchor/$chrom"
    python "$here/plot_umaps.py" "$index_dir" "$anchor" "$chrom" \
        --out "$out_dir"
done

echo "plotting $anchor/ALL"
python "$here/plot_umaps.py" "$index_dir" "$anchor" ALL --out "$out_dir"

# pairwise shared-kmer fractions per sample (reference run_umaps.sh tail)
tail -n +2 "$index_dir/samples.tsv" | cut -f1 |
while read -r name; do
    python "$here/pairwise_comp.py" "$name" "$index_dir" \
        > "$index_dir/anchor/$name/perc_shared.$name.txt" || true
done
