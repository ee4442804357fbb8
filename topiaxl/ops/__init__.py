from .grid_sample import grid_sample_3d, gather_volume_trilinear
from .attention import multi_head_attention
from .ring_attention import ring_attention

__all__ = ["grid_sample_3d", "gather_volume_trilinear",
           "multi_head_attention", "ring_attention"]
