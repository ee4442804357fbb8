from .dit import DiT, DiTAdditivePosEmb, quantize_dit_params
from .vae3d import VAE3D
from .primx import PrimX, PrimXParams

__all__ = ["DiT", "DiTAdditivePosEmb", "quantize_dit_params", "VAE3D",
           "PrimX", "PrimXParams"]
