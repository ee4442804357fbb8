from .dinov2 import DinoViT, dinov2_config
from .image import DinoV2Wrapper, ImageConditioner, DummyImageConditioner
from .text import TextConditioner

__all__ = [
    "DinoViT",
    "dinov2_config",
    "DinoV2Wrapper",
    "ImageConditioner",
    "DummyImageConditioner",
    "TextConditioner",
]
