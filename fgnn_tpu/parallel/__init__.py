from .mesh import make_mesh, local_mesh
from .sharding import (
    shard_batch,
    shard_params,
    replicate,
    batch_sharding,
)

__all__ = [
    "make_mesh", "local_mesh", "shard_batch", "shard_params", "replicate",
    "batch_sharding",
]
