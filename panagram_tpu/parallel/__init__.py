from .mesh import make_mesh, DICT_AXIS
from .shard import ShardedDict, shard_dictionary, sharded_anchor_step

__all__ = [
    "make_mesh",
    "DICT_AXIS",
    "ShardedDict",
    "shard_dictionary",
    "sharded_anchor_step",
]
