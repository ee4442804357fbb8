"""3D KL-VAE over a single primitive payload — flax/TPU implementation.

Capability-parity with the reference VAE (models/vae3d_dib.py:12-453):
encodes a [B, 8,8,8, 6] payload into a [B, 4,4,4, 1] latent (x2 for the
diagonal-Gaussian parameters) and back. Config: down_channels [32, 256],
one stride-2 downsample, mid block with full-volume self-attention,
layers_per_block 2, GroupNorm(32)+SiLU, skip_scale sqrt(0.5).

TPU-first choices:
* channels-LAST (NDHWC) layout everywhere so the channel dim rides the
  128-lane axis and 3D convs lower to MXU-friendly contractions;
* bf16 conv compute with f32 GroupNorm;
* the whole 2048-prim batch decodes in ONE call (the reference loops
  per sample to dodge GPU OOM, inference.py:335-340).

Tensor convention in this file: x is [B, D, H, W, C].
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .layers import SelfAttention

Dtype = Any


def _conv(features, kernel=3, stride=1, dtype=jnp.bfloat16, name=None):
    pad = kernel // 2
    return nn.Conv(
        features, (kernel,) * 3, strides=(stride,) * 3,
        padding=((pad, pad),) * 3, dtype=dtype, name=name,
    )


class GroupNorm32(nn.Module):
    """GroupNorm in f32 (torch GroupNorm runs f32 under autocast)."""

    num_groups: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        return nn.GroupNorm(
            num_groups=self.num_groups, epsilon=self.epsilon, dtype=jnp.float32
        )(x.astype(jnp.float32))


class ResnetBlock3D(nn.Module):
    """norm-act-conv x2 + (1x1-projected) skip, optional resample
    (reference models/vae3d_dib.py:93-145)."""

    out_channels: int
    resample: str = "none"  # 'none' | 'up' | 'down'
    groups: int = 32
    skip_scale: float = 1.0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        in_channels = x.shape[-1]
        res = x
        h = GroupNorm32(min(self.groups, in_channels), name="norm1")(x)
        h = nn.silu(h)

        if self.resample == "up":
            def up2(v):
                for ax in (1, 2, 3):
                    v = jnp.repeat(v, 2, axis=ax)
                return v
            res, h = up2(res), up2(h)
        elif self.resample == "down":
            def down2(v):
                return nn.avg_pool(v, (2, 2, 2), strides=(2, 2, 2))
            res, h = down2(res), down2(h)

        h = _conv(self.out_channels, dtype=self.dtype, name="conv1")(h)
        h = GroupNorm32(min(self.groups, self.out_channels), name="norm2")(h)
        h = nn.silu(h)
        h = _conv(self.out_channels, dtype=self.dtype, name="conv2")(h)

        if in_channels != self.out_channels:
            res = nn.Conv(self.out_channels, (1, 1, 1), dtype=self.dtype,
                          name="shortcut")(res)
        return (h.astype(jnp.float32) + res.astype(jnp.float32)) * self.skip_scale


class VolumeAttention3D(nn.Module):
    """GroupNorm + full-volume self-attention + scaled residual
    (reference models/vae3d_dib.py:12-48)."""

    num_heads: int = 8
    groups: int = 32
    skip_scale: float = 1.0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        B, D, H, W, C = x.shape
        res = x
        h = GroupNorm32(min(self.groups, C))(x)
        h = h.reshape(B, D * H * W, C)
        h = SelfAttention(dim=C, num_heads=self.num_heads, qkv_bias=False,
                          proj_bias=True, dtype=self.dtype, name="attn")(
            h.astype(self.dtype))
        h = h.reshape(B, D, H, W, C)
        return (h.astype(jnp.float32) + res.astype(jnp.float32)) * self.skip_scale


class DownBlock3D(nn.Module):
    out_channels: int
    num_layers: int = 2
    downsample: bool = True
    skip_scale: float = 1.0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            x = ResnetBlock3D(self.out_channels, skip_scale=self.skip_scale,
                              dtype=self.dtype, name=f"res{i}")(x)
        if self.downsample:
            x = _conv(self.out_channels, kernel=3, stride=2, dtype=self.dtype,
                      name="down")(x)
        return x


class MidBlock3D(nn.Module):
    num_layers: int = 1
    attention: bool = True
    attention_heads: int = 8
    skip_scale: float = 1.0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        x = ResnetBlock3D(c, skip_scale=self.skip_scale, dtype=self.dtype,
                          name="res0")(x)
        for i in range(self.num_layers):
            if self.attention:
                x = VolumeAttention3D(
                    num_heads=self.attention_heads, skip_scale=self.skip_scale,
                    dtype=self.dtype, name=f"attn{i}")(x)
            x = ResnetBlock3D(c, skip_scale=self.skip_scale, dtype=self.dtype,
                              name=f"res{i + 1}")(x)
        return x


class UpBlock3D(nn.Module):
    out_channels: int
    num_layers: int = 2
    upsample: bool = True
    skip_scale: float = 1.0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            x = ResnetBlock3D(self.out_channels, skip_scale=self.skip_scale,
                              dtype=self.dtype, name=f"res{i}")(x)
        if self.upsample:
            x = nn.ConvTranspose(
                self.out_channels, (2, 2, 2), strides=(2, 2, 2),
                padding="VALID", dtype=self.dtype, name="up")(x)
        return x


class Encoder3D(nn.Module):
    """(reference models/vae3d_dib.py:270-327)"""

    out_channels: int
    down_channels: Sequence[int] = (32, 256)
    mid_attention: bool = True
    layers_per_block: int = 2
    skip_scale: float = float(np.sqrt(0.5))
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = _conv(self.down_channels[0], dtype=self.dtype, name="conv_in")(x)
        for i, ch in enumerate(self.down_channels):
            x = DownBlock3D(
                ch, num_layers=self.layers_per_block,
                downsample=(i != len(self.down_channels) - 1),
                skip_scale=self.skip_scale, dtype=self.dtype,
                name=f"down{i}")(x)
        x = MidBlock3D(attention=self.mid_attention, skip_scale=self.skip_scale,
                       dtype=self.dtype, name="mid")(x)
        x = GroupNorm32(min(32, self.down_channels[-1]))(x)
        x = nn.silu(x)
        x = _conv(self.out_channels, dtype=self.dtype, name="conv_out")(x)
        return x


class Decoder3D(nn.Module):
    """(reference models/vae3d_dib.py:330-387)"""

    out_channels: int
    up_channels: Sequence[int] = (256, 32)
    mid_attention: bool = True
    layers_per_block: int = 2
    skip_scale: float = float(np.sqrt(0.5))
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = _conv(self.up_channels[0], dtype=self.dtype, name="conv_in")(x)
        x = MidBlock3D(attention=self.mid_attention, skip_scale=self.skip_scale,
                       dtype=self.dtype, name="mid")(x)
        for i, ch in enumerate(self.up_channels):
            x = UpBlock3D(
                ch, num_layers=self.layers_per_block,
                upsample=(i != len(self.up_channels) - 1),
                skip_scale=self.skip_scale, dtype=self.dtype,
                name=f"up{i}")(x)
        x = GroupNorm32(min(32, self.up_channels[-1]))(x)
        x = nn.silu(x)
        # reference uses ConvTranspose3d(k=3, s=1, p=1) here
        # (vae3d_dib.py:367) == conv with spatially flipped kernel; we keep a
        # ConvTranspose so checkpoint conversion is a pure layout transpose.
        x = nn.ConvTranspose(
            self.out_channels, (3, 3, 3), strides=(1, 1, 1),
            padding=((1, 1),) * 3, dtype=self.dtype, name="conv_out")(x)
        return x


class DiagonalGaussian:
    """Posterior helper (reference models/vae3d_dib.py:50-90), channels-last."""

    def __init__(self, parameters: jnp.ndarray):
        self.parameters = parameters
        mean, logvar = jnp.split(parameters, 2, axis=-1)
        self.mean = mean
        self.logvar = jnp.clip(logvar, -30.0, 20.0)
        self.std = jnp.exp(0.5 * self.logvar)
        self.var = jnp.exp(self.logvar)

    def sample(self, key: jax.Array) -> jnp.ndarray:
        return self.mean + self.std * jax.random.normal(
            key, self.mean.shape, dtype=self.mean.dtype)

    def kl(self) -> jnp.ndarray:
        return 0.5 * jnp.mean(
            self.mean**2 + self.var - 1.0 - self.logvar,
            axis=tuple(range(1, self.mean.ndim)),
        )

    def nll(self, sample) -> jnp.ndarray:
        logtwopi = float(np.log(2.0 * np.pi))
        return 0.5 * jnp.sum(
            logtwopi + self.logvar + (sample - self.mean) ** 2 / self.var,
            axis=tuple(range(1, self.mean.ndim)),
        )

    def mode(self) -> jnp.ndarray:
        return self.mean


class VAE3D(nn.Module):
    """KL-VAE (reference models/vae3d_dib.py:390-453). Channels-last."""

    in_channels: int = 6
    latent_channels: int = 1
    out_channels: int = 6
    down_channels: Sequence[int] = (32, 256)
    mid_attention: bool = True
    up_channels: Sequence[int] = (256, 32)
    layers_per_block: int = 2
    skip_scale: float = float(np.sqrt(0.5))
    dtype: Dtype = jnp.bfloat16

    def setup(self):
        self.encoder = Encoder3D(
            out_channels=2 * self.latent_channels,
            down_channels=tuple(self.down_channels),
            mid_attention=self.mid_attention,
            layers_per_block=self.layers_per_block,
            skip_scale=self.skip_scale, dtype=self.dtype,
        )
        self.decoder = Decoder3D(
            out_channels=self.out_channels,
            up_channels=tuple(self.up_channels),
            mid_attention=self.mid_attention,
            layers_per_block=self.layers_per_block,
            skip_scale=self.skip_scale, dtype=self.dtype,
        )
        self.quant_conv = nn.Conv(
            2 * self.latent_channels, (1, 1, 1), dtype=jnp.float32)
        self.post_quant_conv = nn.Conv(
            self.latent_channels, (1, 1, 1), dtype=jnp.float32)

    def encode(self, x: jnp.ndarray) -> DiagonalGaussian:
        h = self.encoder(x)
        h = self.quant_conv(h.astype(jnp.float32))
        return DiagonalGaussian(h)

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        h = self.post_quant_conv(z.astype(jnp.float32))
        return self.decoder(h).astype(jnp.float32)

    def __call__(self, x: jnp.ndarray, key: jax.Array | None = None,
                 sample: bool = True):
        p = self.encode(x)
        z = p.sample(key) if sample else p.mode()
        return self.decode(z), p
