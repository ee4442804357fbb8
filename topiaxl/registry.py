"""Factory registrations: wire config ``class_name``s to constructors.

Both topiaxl names and the reference's dotted class paths are
registered, so reference-style YAML configs resolve without edits (the
reference uses reflection, dva/io.py:23-29; we use this explicit table).
"""

from __future__ import annotations

import jax.numpy as jnp

from .core.config import build, register
from .models import DiT, PrimX, VAE3D
from .models.conditioner import (
    DinoV2Wrapper,
    DummyImageConditioner,
    ImageConditioner,
    TextConditioner,
)


@register("topiaxl.DiT", "models.dit_crossattn.DiT")
def make_dit(**kw):
    if kw.pop("gradient_checkpointing", False):
        kw.setdefault("remat", True)
    kw.pop("precision", None)
    return DiT(
        seq_length=kw.get("seq_length", 2048),
        in_channels=kw.get("in_channels", 68),
        condition_channels=kw.get("condition_channels", 768),
        hidden_size=kw.get("hidden_size", 1152),
        depth=kw.get("depth", 28),
        num_heads=kw.get("num_heads", 16),
        mlp_ratio=kw.get("mlp_ratio", 4.0),
        cond_drop_prob=kw.get("cond_drop_prob", 0.0),
        attn_proj_bias=kw.get("attn_proj_bias", False),
        learn_sigma=kw.get("learn_sigma", True),
        dtype=jnp.bfloat16 if kw.get("dtype", "bf16") in ("bf16", "bfloat16")
        else jnp.float32,
        remat=(kw["remat"] if isinstance(kw.get("remat"), str)
               else bool(kw.get("remat", False))),
        scan_blocks=bool(kw.get("scan_blocks", False)),
        quant=bool(kw.get("quant", False)),
    )


@register("topiaxl.DiTAdditivePosEmb", "models.dit_crossattn.DiTAdditivePosEmb")
def make_dit_additive(**kw):
    from .models.dit import DiTAdditivePosEmb

    base = make_dit(**kw)
    return DiTAdditivePosEmb(**{
        f.name: getattr(base, f.name)
        for f in type(base).__dataclass_fields__.values()
        if f.name not in ("parent", "name")
    })


@register("topiaxl.VAE3D", "models.vae3d_dib.VAE")
def make_vae(**kw):
    kw.pop("gradient_checkpointing", None)
    return VAE3D(
        in_channels=kw.get("in_channels", 6),
        latent_channels=kw.get("latent_channels", 1),
        out_channels=kw.get("out_channels", 6),
        down_channels=tuple(kw.get("down_channels", (32, 256))),
        mid_attention=kw.get("mid_attention", True),
        up_channels=tuple(kw.get("up_channels", (256, 32))),
        layers_per_block=kw.get("layers_per_block", 2),
        dtype=jnp.bfloat16 if kw.get("dtype", "bf16") in ("bf16", "bfloat16")
        else jnp.float32,
    )


@register("topiaxl.PrimX", "models.primsdf.PrimSDF")
def make_primx(**kw):
    known = {k: kw[k] for k in (
        "num_prims", "dim_feat", "prim_shape", "init_scale", "sdf2alpha_var",
        "auto_scale_init", "init_sampling") if k in kw}
    return PrimX(**known)


@register("topiaxl.DinoV2Wrapper", "models.conditioner.image_dinov2.Dinov2Wrapper")
def make_dinov2(**kw):
    return DinoV2Wrapper(
        model_name=kw.get("model_name", "dinov2_vitb14_reg"),
        freeze=kw.get("freeze", True),
    )


@register("topiaxl.ImageConditioner", "models.conditioner.image.ImageConditioner")
def make_image_conditioner(**kw):
    enc_cfg = kw.get("encoder_config")
    encoder = build(enc_cfg) if enc_cfg else DinoV2Wrapper()
    return ImageConditioner(
        encoder=encoder,
        num_prims=kw.get("num_prims", 2048),
        dim_feat=kw.get("dim_feat", 6),
        prim_shape=kw.get("prim_shape", 8),
        sample_view=kw.get("sample_view", False),
    )


@register("topiaxl.ImageMultiViewConditioner",
          "models.conditioner.image.ImageMultiViewConditioner")
def make_image_multiview_conditioner(**kw):
    from .models.conditioner.image import ImageMultiViewConditioner

    enc_cfg = kw.get("encoder_config")
    encoder = build(enc_cfg) if enc_cfg else DinoV2Wrapper()
    return ImageMultiViewConditioner(
        encoder=encoder,
        num_prims=kw.get("num_prims", 2048),
        dim_feat=kw.get("dim_feat", 6),
        prim_shape=kw.get("prim_shape", 8),
        sample_view=kw.get("sample_view", False),
        view_counts=kw.get("view_counts", 4),
    )


@register("topiaxl.DummyImageConditioner",
          "models.conditioner.image.DummyImageConditioner")
def make_dummy_conditioner(**kw):
    return DummyImageConditioner(**kw)


@register("topiaxl.TextConditioner", "models.conditioner.text.TextConditioner")
def make_text_conditioner(**kw):
    from .models.conditioner.text import CLIPTextEncoder

    encoder = None
    if kw.get("model_name_or_path"):
        encoder = CLIPTextEncoder(
            model_name_or_path=kw["model_name_or_path"])
    return TextConditioner(encoder=encoder, dim=kw.get("dim", 768),
                           stub=bool(kw.get("stub", False)))


@register("topiaxl.CLIPImageEncoder",
          "models.conditioner.image.CLIPImageEncoder")
def make_clip_image_encoder(**kw):
    from .models.conditioner.image import CLIPImageEncoder

    return CLIPImageEncoder(
        model_name_or_path=kw.get("model_name_or_path"),
        tokens=bool(kw.get("tokens", False)),
    )


@register("topiaxl.CLIPTextEncoder",
          "models.conditioner.text.CLIPTextEncoder")
def make_clip_text_encoder(**kw):
    from .models.conditioner.text import CLIPTextEncoder

    return CLIPTextEncoder(model_name_or_path=kw.get("model_name_or_path"))
