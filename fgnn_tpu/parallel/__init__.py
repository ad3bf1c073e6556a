from .mesh import make_mesh, local_mesh, parse_mesh_spec
from .sharding import (
    shard_batch,
    shard_params,
    shard_state,
    replicate,
    batch_sharding,
)
from .edge_partition import pad_edges, partitioned_typed_mp_coo
from .halo import HaloGraph, HaloPlan, build_halo_plan, halo_typed_mp_coo

__all__ = [
    "make_mesh", "local_mesh", "parse_mesh_spec", "shard_batch",
    "shard_params", "shard_state", "replicate", "batch_sharding",
    "pad_edges", "partitioned_typed_mp_coo",
    "HaloGraph", "HaloPlan", "build_halo_plan", "halo_typed_mp_coo",
]
