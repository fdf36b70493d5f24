from .bgzf import BgzfWriter, BgzfReader, load_gzi, make_virtual_offset
from .fasta import FastaFile, iter_fasta, write_fai

__all__ = [
    "BgzfWriter",
    "BgzfReader",
    "load_gzi",
    "make_virtual_offset",
    "FastaFile",
    "iter_fasta",
    "write_fai",
]
