from .mesh import make_mesh, mesh_from_config
from .sharding import (
    batch_sharding,
    dit_param_rules,
    sequence_sharding,
    shard_params,
)

__all__ = [
    "make_mesh",
    "mesh_from_config",
    "dit_param_rules",
    "shard_params",
    "batch_sharding",
    "sequence_sharding",
]
