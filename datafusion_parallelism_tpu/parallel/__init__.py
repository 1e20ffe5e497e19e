from .mesh import make_mesh, PARTITION_AXIS
from .shuffle import shuffle_by_hash, partition_table, gather_shards
from .distributed import distributed_hash_join, DistJoinConfig
from .skew import key_histogram, salted_route

__all__ = [
    "make_mesh", "PARTITION_AXIS",
    "shuffle_by_hash", "partition_table", "gather_shards",
    "distributed_hash_join", "DistJoinConfig",
    "key_histogram", "salted_route",
]
