from .mesh import make_mesh, mesh_from_config
from .sharding import dit_param_rules, shard_params, batch_sharding

__all__ = [
    "make_mesh",
    "mesh_from_config",
    "dit_param_rules",
    "shard_params",
    "batch_sharding",
]
