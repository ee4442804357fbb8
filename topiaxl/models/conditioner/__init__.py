from .clip import (
    CLIPTextTower,
    CLIPVisionTower,
    convert_clip_text,
    convert_clip_vision,
)
from .dinov2 import DinoViT, dinov2_config
from .image import (
    CLIPImageEncoder,
    DinoV2Wrapper,
    DummyImageConditioner,
    ImageConditioner,
    ImageMultiViewConditioner,
)
from .text import CLIPTextEncoder, TextConditioner

__all__ = [
    "CLIPImageEncoder",
    "CLIPTextEncoder",
    "CLIPTextTower",
    "CLIPVisionTower",
    "convert_clip_text",
    "convert_clip_vision",
    "DinoViT",
    "dinov2_config",
    "DinoV2Wrapper",
    "DummyImageConditioner",
    "ImageConditioner",
    "ImageMultiViewConditioner",
    "TextConditioner",
]
