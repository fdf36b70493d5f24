from .codec import pack_kmers, canonical_kmers, SENTINEL, MAX_K
from .count import distinct_kmers, distinct_kmers_chunked
from .dictionary import build_dictionary, PanKmerDict
from .anchor import (
    anchor_lookup,
    masks_to_bytes,
    mask_popcount,
    occupancy_histogram,
    genome_column_sums,
)

__all__ = [
    "pack_kmers",
    "canonical_kmers",
    "SENTINEL",
    "MAX_K",
    "distinct_kmers",
    "distinct_kmers_chunked",
    "build_dictionary",
    "PanKmerDict",
    "anchor_lookup",
    "masks_to_bytes",
    "mask_popcount",
    "occupancy_histogram",
    "genome_column_sums",
]
