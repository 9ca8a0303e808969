from .dist import (all_gather_objects, gather_objects, get_rank,
                   get_world_size, initialize, is_main_process,
                   sync_batch_stats)
from .mesh import data_sharding, make_mesh, replicated, shard_batch

__all__ = ["all_gather_objects", "gather_objects", "get_rank",
           "get_world_size", "initialize", "is_main_process",
           "sync_batch_stats", "data_sharding", "make_mesh",
           "replicated", "shard_batch"]
