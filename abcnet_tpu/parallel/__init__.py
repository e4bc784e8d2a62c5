from .mesh import (make_mesh, shard_batch, replicate_tree, data_sharding,
                   replicated_sharding)

__all__ = ["make_mesh", "shard_batch", "replicate_tree", "data_sharding",
           "replicated_sharding"]
