"""U^2-Net salient-object matting in flax (Qin et al. 2020).

The reference mattes input photos with rembg, whose default session runs
U^2-Net ONNX weights (reference inference.py:10,298,306-311). This is
the same architecture TPU-native: nested U-structure of RSU blocks,
NHWC, inference-only. BatchNorm is FOLDED into the preceding conv at
conversion time (topiaxl.core.convert.convert_u2net) — eval-mode BN is
an affine map, so folding is exact and saves a multiply-add pass per
conv on the accelerator.

Two published configs: ``u2net`` (full, ~44M params — rembg's default)
and ``u2netp`` (small, ~1.1M — rembg's "u2netp" session). Input is the
rembg convention: 320x320, ImageNet-normalized; output is the d0
saliency map in [0, 1], min-max rescaled to an alpha by the caller
(topiaxl.ops.matting.remove_background_u2net).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# (rsu_height, in_ch, mid_ch, out_ch, dilated) per encoder/decoder stage
_FULL = {
    "enc": [(7, 3, 32, 64), (6, 64, 32, 128), (5, 128, 64, 256),
            (4, 256, 128, 512), (0, 512, 256, 512), (0, 512, 256, 512)],
    "dec": [(0, 1024, 256, 512), (4, 1024, 128, 256), (5, 512, 64, 128),
            (6, 256, 32, 64), (7, 128, 16, 64)],
    "side_ch": [64, 64, 128, 256, 512, 512],  # d1..d6 input channels
}
_SMALL = {
    "enc": [(7, 3, 16, 64), (6, 64, 16, 64), (5, 64, 16, 64),
            (4, 64, 16, 64), (0, 64, 16, 64), (0, 64, 16, 64)],
    "dec": [(0, 128, 16, 64), (4, 128, 16, 64), (5, 128, 16, 64),
            (6, 128, 16, 64), (7, 128, 16, 64)],
    "side_ch": [64, 64, 64, 64, 64, 64],
}
CONFIGS = {"u2net": _FULL, "u2netp": _SMALL}


class REBNCONV(nn.Module):
    """conv3x3(dilated) + (folded-BN bias) + relu."""

    out_ch: int
    dirate: int = 1

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out_ch, (3, 3), padding=self.dirate,
                    kernel_dilation=(self.dirate, self.dirate),
                    name="conv")(x)
        return nn.relu(x)


def _pool(x):
    # MaxPool2d(2, stride 2, ceil_mode=True); inputs are 320-divisible
    # so ceil never pads, but guard odd sizes identically to torch
    h, w = x.shape[1], x.shape[2]
    if h % 2 or w % 2:
        x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)),
                    constant_values=-jnp.inf)
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def _up_to(x, like):
    B, H, W, C = x.shape
    th, tw = like.shape[1], like.shape[2]
    if (H, W) == (th, tw):
        return x
    # F.interpolate(mode='bilinear', align_corners=False) semantics
    return jax.image.resize(x, (B, th, tw, C), method="bilinear")


class RSU(nn.Module):
    """Residual U-block of the given height (RSU-7..RSU-4)."""

    height: int
    mid_ch: int
    out_ch: int

    @nn.compact
    def __call__(self, x):
        L = self.height
        hxin = REBNCONV(self.out_ch, name="rebnconvin")(x)
        # encoder: L-1 convs with pooling between, then a dilated bottom
        hs = [REBNCONV(self.mid_ch, name="rebnconv1")(hxin)]
        h = hs[0]
        for i in range(2, L):
            h = _pool(h)
            h = REBNCONV(self.mid_ch, name=f"rebnconv{i}")(h)
            hs.append(h)
        top = REBNCONV(self.mid_ch, dirate=2, name=f"rebnconv{L}")(h)
        # decoder
        d = REBNCONV(self.mid_ch if L > 2 else self.out_ch,
                     name=f"rebnconv{L - 1}d")(
            jnp.concatenate([top, hs[-1]], axis=-1))
        for i in range(L - 2, 0, -1):
            d = _up_to(d, hs[i - 1])
            ch = self.out_ch if i == 1 else self.mid_ch
            d = REBNCONV(ch, name=f"rebnconv{i}d")(
                jnp.concatenate([d, hs[i - 1]], axis=-1))
        return d + hxin


class RSU4F(nn.Module):
    """Dilation-only RSU (no pooling): dilations 1,2,4,8 then 4,2,1."""

    mid_ch: int
    out_ch: int

    @nn.compact
    def __call__(self, x):
        hxin = REBNCONV(self.out_ch, name="rebnconvin")(x)
        h1 = REBNCONV(self.mid_ch, dirate=1, name="rebnconv1")(hxin)
        h2 = REBNCONV(self.mid_ch, dirate=2, name="rebnconv2")(h1)
        h3 = REBNCONV(self.mid_ch, dirate=4, name="rebnconv3")(h2)
        h4 = REBNCONV(self.mid_ch, dirate=8, name="rebnconv4")(h3)
        d3 = REBNCONV(self.mid_ch, dirate=4, name="rebnconv3d")(
            jnp.concatenate([h4, h3], axis=-1))
        d2 = REBNCONV(self.mid_ch, dirate=2, name="rebnconv2d")(
            jnp.concatenate([d3, h2], axis=-1))
        d1 = REBNCONV(self.out_ch, dirate=1, name="rebnconv1d")(
            jnp.concatenate([d2, h1], axis=-1))
        return d1 + hxin


def _stage(height, mid, out, name):
    if height == 0:
        return RSU4F(mid, out, name=name)
    return RSU(height, mid, out, name=name)


class U2Net(nn.Module):
    """Full U^2-Net; returns the fused d0 saliency map [B, H, W, 1] in
    [0, 1] (sigmoid applied), input [B, H, W, 3] ImageNet-normalized."""

    arch: str = "u2net"

    @nn.compact
    def __call__(self, x):
        cfg = CONFIGS[self.arch]
        enc = cfg["enc"]
        # encoder stages with pooling between
        hx = x
        encs = []
        for i, (L, _, mid, out) in enumerate(enc):
            hx = _stage(L, mid, out, f"stage{i + 1}")(hx)
            encs.append(hx)
            if i < len(enc) - 1:
                hx = _pool(hx)
        # NOTE: torch pools AFTER stage5 then runs stage6 at the coarser
        # size; the loop above matches (pool between every pair).
        hx6 = encs[-1]
        # decoder
        d = hx6
        decs = []
        for i, (L, _, mid, out) in enumerate(cfg["dec"]):
            skip = encs[len(enc) - 2 - i]
            d = _up_to(d, skip)
            d = _stage(L, mid, out, f"stage{5 - i}d")(
                jnp.concatenate([d, skip], axis=-1))
            decs.append(d)
        hx5d, hx4d, hx3d, hx2d, hx1d = decs

        def side(h, idx):
            s = nn.Conv(1, (3, 3), padding=1, name=f"side{idx}")(h)
            return _up_to(s, hx1d)

        d1 = side(hx1d, 1)
        d2 = side(hx2d, 2)
        d3 = side(hx3d, 3)
        d4 = side(hx4d, 4)
        d5 = side(hx5d, 5)
        d6 = side(hx6, 6)
        d0 = nn.Conv(1, (1, 1), name="outconv")(
            jnp.concatenate([d1, d2, d3, d4, d5, d6], axis=-1))
        return nn.sigmoid(d0)
