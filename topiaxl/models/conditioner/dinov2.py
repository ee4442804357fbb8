"""DINOv2 vision transformer (flax) — frozen image encoder.

Capability parity with the reference's vendored Meta DINOv2
(models/conditioner/dinov2/models/vision_transformer.py:45-281 and
layers/*): patch embed (14x14 conv), cls + register tokens, learned
position embeddings (bicubic-interpolated for off-grid sizes),
pre-norm blocks with LayerScale, GELU MLP, final LayerNorm. The flagship
encoder is ViT-B/14 with 4 register tokens at 518^2 -> 1369 patch tokens.

TPU notes: bf16 matmuls / f32 LayerNorm; attention through
topiaxl.ops.attention (Pallas/XLA). Weights come from the released
LVD-142M checkpoints via the torch->flax converter (topiaxl/core/convert).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

import numpy as np

from ...ops.attention import multi_head_attention

Dtype = Any


def _torch_bicubic_matrix(in_size: int, out_size: int, scale_factor: float,
                          antialias: bool = False) -> np.ndarray:
    """[out, in] sampling matrix replicating torch
    ``F.interpolate(mode='bicubic', align_corners=False,
    scale_factor=...)`` for both antialias settings. The reference
    interpolates its DINOv2 pos-embed this way with
    scale_factor = (grid + interpolate_offset) / sqrt(N)
    (vision_transformer.py:187-215); the flagship vitb14_reg is built
    with interpolate_antialias=True / offset=0.0 while the non-reg
    variants default to antialias=False / offset=0.1
    (hub/backbones.py:27-28, 116-134), so parity of off-518 inputs
    hinges on these exact semantics — jax.image.resize uses out/in
    coordinate scaling, which differs when an offset folds into the
    scale_factor.

    antialias=False: src = (dst + 0.5) / scale_factor - 0.5, 4-tap cubic
    kernel a = -0.75, taps clamped+accumulated at the borders.
    antialias=True (ATen UpSampleKernel.cpp separable AA path): PIL-style
    cubic a = -0.5, kernel stretched by max(1, 1/scale_factor), windowed
    taps normalized to sum 1 (no border accumulation). Both verified
    against torch F.interpolate at several sizes in
    tests/test_conditioner.py::test_bicubic_matrix_vs_torch."""
    scale = 1.0 / scale_factor

    if antialias:
        a = -0.5

        def cub(x):
            x = abs(x)
            if x < 1.0:
                return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0
            if x < 2.0:
                return (((x - 5.0) * x + 8.0) * x - 4.0) * a
            return 0.0

        clamped = max(1.0, scale)
        support = 2.0 * clamped
        M = np.zeros((out_size, in_size), np.float64)
        for i in range(out_size):
            center = scale * (i + 0.5)
            lo = max(0, int(center - support + 0.5))
            hi = min(in_size, int(center + support + 0.5))
            ws = [cub((j - center + 0.5) / clamped) for j in range(lo, hi)]
            tw = sum(ws)
            for j, w in zip(range(lo, hi), ws):
                M[i, j] = w / tw
        return M.astype(np.float32)

    a = -0.75

    def cub(x):
        x = abs(x)
        if x <= 1.0:
            return (a + 2.0) * x**3 - (a + 3.0) * x**2 + 1.0
        if x < 2.0:
            return a * x**3 - 5.0 * a * x**2 + 8.0 * a * x - 4.0 * a
        return 0.0

    M = np.zeros((out_size, in_size), np.float64)
    for i in range(out_size):
        x = (i + 0.5) * scale - 0.5
        base = int(np.floor(x))
        t = x - base
        for k in range(-1, 3):
            w = cub(k - t)
            j = min(max(base + k, 0), in_size - 1)
            M[i, j] += w
    return M.astype(np.float32)

_CONFIGS = {
    # name -> (embed_dim, depth, num_heads, patch, num_register_tokens).
    # The hub builds _reg variants with interpolate_antialias=True /
    # interpolate_offset=0.0 and the non-reg ones with False / 0.1
    # (reference hub/backbones.py:27-28, 108-150) — derived from the
    # register-token count below.
    "dinov2_vits14": (384, 12, 6, 14, 0),
    "dinov2_vitb14": (768, 12, 12, 14, 0),
    "dinov2_vitl14": (1024, 24, 16, 14, 0),
    "dinov2_vits14_reg": (384, 12, 6, 14, 4),
    "dinov2_vitb14_reg": (768, 12, 12, 14, 4),
    "dinov2_vitl14_reg": (1024, 24, 16, 14, 4),
    # tiny variant for CPU tests / smoke runs (not a released checkpoint)
    "dinov2_tiny_test": (32, 1, 4, 7, 4),
}


def dinov2_config(name: str) -> dict:
    if name not in _CONFIGS:
        raise KeyError(f"unknown dinov2 model {name}")
    d, depth, h, p, r = _CONFIGS[name]
    return dict(embed_dim=d, depth=depth, num_heads=h, patch_size=p,
                num_register_tokens=r,
                interpolate_antialias=r > 0,
                interpolate_offset=0.0 if r > 0 else 0.1)


class _Attention(nn.Module):
    dim: int
    num_heads: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        B, N, _ = x.shape
        hd = self.dim // self.num_heads
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, self.num_heads, hd)
        out = multi_head_attention(
            qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2], scale=hd**-0.5
        )
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(
            out.reshape(B, N, self.dim))


class _Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        ls1 = self.param("ls1_gamma", nn.initializers.constant(1e-5),
                         (self.dim,))
        ls2 = self.param("ls2_gamma", nn.initializers.constant(1e-5),
                         (self.dim,))
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm1")(x)
        h = _Attention(self.dim, self.num_heads, self.dtype,
                       name="attn")(h.astype(self.dtype))
        x = x + ls1 * h.astype(jnp.float32)
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm2")(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                     name="fc1")(h.astype(self.dtype))
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(h)
        x = x + ls2 * h.astype(jnp.float32)
        return x


class DinoViT(nn.Module):
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    patch_size: int = 14
    num_register_tokens: int = 4
    mlp_ratio: float = 4.0
    pos_embed_size: int = 37  # grid side the pretrained pos_embed was saved at
    # reference vision_transformer.py:201 "small number to avoid
    # floating point error" folded into the interpolation scale; the
    # hub sets 0.0 + antialias for _reg variants (backbones.py:116-134)
    interpolate_offset: float = 0.1
    interpolate_antialias: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, img: jnp.ndarray) -> dict:
        """img: [B, H, W, 3] normalized floats -> dict of token groups
        (x_norm_clstoken [B, D], x_norm_patchtokens [B, hw, D])."""
        B, H, W, _ = img.shape
        p = self.patch_size
        gh, gw = H // p, W // p

        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p), padding="VALID",
                    dtype=jnp.float32, name="patch_embed")(img)
        x = x.reshape(B, gh * gw, self.embed_dim)

        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, self.embed_dim))
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, 1 + self.pos_embed_size**2, self.embed_dim),
        )
        pos_patch = pos[:, 1:]
        if gh != self.pos_embed_size or gw != self.pos_embed_size:
            # exact reference semantics (vision_transformer.py:187-215):
            # torch bicubic with scale_factor=(grid+offset)/sqrt(N),
            # antialias per hub variant; separable [out,in] matrices
            # applied per axis
            S = self.pos_embed_size
            Mh = jnp.asarray(_torch_bicubic_matrix(
                S, gh, (gh + self.interpolate_offset) / S,
                self.interpolate_antialias))
            Mw = jnp.asarray(_torch_bicubic_matrix(
                S, gw, (gw + self.interpolate_offset) / S,
                self.interpolate_antialias))
            grid = pos_patch.reshape(1, S, S, self.embed_dim)
            grid = jnp.einsum("hs,bswd->bhwd", Mh,
                              jnp.einsum("wt,bhtd->bhwd", Mw, grid))
            pos_patch = grid.reshape(1, gh * gw, self.embed_dim)

        x = x + pos_patch
        cls_tok = jnp.broadcast_to(cls, (B, 1, self.embed_dim)) + pos[:, :1]
        if self.num_register_tokens:
            reg = self.param(
                "register_tokens", nn.initializers.zeros,
                (1, self.num_register_tokens, self.embed_dim),
            )
            regs = jnp.broadcast_to(
                reg, (B, self.num_register_tokens, self.embed_dim))
            x = jnp.concatenate([cls_tok, regs, x], axis=1)
        else:
            x = jnp.concatenate([cls_tok, x], axis=1)

        for i in range(self.depth):
            x = _Block(self.embed_dim, self.num_heads, self.mlp_ratio,
                       self.dtype, name=f"block{i}")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")(x)

        r = self.num_register_tokens
        return {
            "x_norm_clstoken": x[:, 0],
            "x_norm_regtokens": x[:, 1:1 + r],
            "x_norm_patchtokens": x[:, 1 + r:],
        }
