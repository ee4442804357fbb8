from .dit import DiT
from .vae3d import VAE3D
from .primx import PrimX, PrimXParams

__all__ = ["DiT", "VAE3D", "PrimX", "PrimXParams"]
