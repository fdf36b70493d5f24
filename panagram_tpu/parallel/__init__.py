from .mesh import make_mesh, DICT_AXIS
from .shard import (
    ShardedBucketedDict,
    make_halo_chunks,
    shard_dictionary,
    sharded_anchor_chunk,
    sharded_build_dictionary,
)

__all__ = [
    "make_mesh",
    "DICT_AXIS",
    "ShardedBucketedDict",
    "make_halo_chunks",
    "shard_dictionary",
    "sharded_anchor_chunk",
    "sharded_build_dictionary",
]
