from .context import make_cp_forward
from .mesh import make_hybrid_mesh, make_mesh, mesh_from_config
from .pipeline import (
    make_pp_forward,
    make_pp_train_step,
    shard_pp_params,
    stack_dit_params,
    unstack_dit_params,
)
from .sharding import (
    batch_sharding,
    dit_param_rules,
    sequence_sharding,
    shard_params,
)

__all__ = [
    "make_mesh",
    "make_hybrid_mesh",
    "make_cp_forward",
    "mesh_from_config",
    "dit_param_rules",
    "shard_params",
    "batch_sharding",
    "sequence_sharding",
    "stack_dit_params",
    "unstack_dit_params",
    "shard_pp_params",
    "make_pp_forward",
    "make_pp_train_step",
]
