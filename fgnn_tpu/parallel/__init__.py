from .mesh import make_mesh, local_mesh
from .sharding import (
    shard_batch,
    shard_params,
    replicate,
    batch_sharding,
)
from .edge_partition import pad_edges, partitioned_typed_mp_coo

__all__ = [
    "make_mesh", "local_mesh", "shard_batch", "shard_params", "replicate",
    "batch_sharding", "pad_edges", "partitioned_typed_mp_coo",
]
