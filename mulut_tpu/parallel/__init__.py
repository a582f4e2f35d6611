from .spatial import cascade_row_sharded, row_sharding, shard_image_rows
from .mesh import (
    batch_sharding,
    make_mesh,
    replicate_tree,
    replicated,
    shard_batch,
)

__all__ = [
    "cascade_row_sharded",
    "row_sharding",
    "shard_image_rows",
    "batch_sharding",
    "make_mesh",
    "replicate_tree",
    "replicated",
    "shard_batch",
]
