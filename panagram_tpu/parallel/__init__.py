from .mesh import make_mesh, DICT_AXIS
from .shard import (
    GenomeShardedDict,
    ShardedBucketedDict,
    assemble_genome_shards,
    genome_sharded_anchor_chunk,
    make_halo_chunks,
    shard_dictionary,
    shard_dictionary_genomes,
    sharded_anchor_chunk,
    sharded_build_dictionary,
)

__all__ = [
    "make_mesh",
    "DICT_AXIS",
    "GenomeShardedDict",
    "ShardedBucketedDict",
    "assemble_genome_shards",
    "genome_sharded_anchor_chunk",
    "make_halo_chunks",
    "shard_dictionary",
    "shard_dictionary_genomes",
    "sharded_anchor_chunk",
    "sharded_build_dictionary",
]
