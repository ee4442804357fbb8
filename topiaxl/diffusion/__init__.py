from .schedule import (
    DiffusionTables,
    get_named_beta_schedule,
    space_timesteps,
    build_tables,
    create_diffusion,
    Diffusion,
)
from . import gaussian

__all__ = [
    "DiffusionTables",
    "get_named_beta_schedule",
    "space_timesteps",
    "build_tables",
    "create_diffusion",
    "Diffusion",
    "gaussian",
]
