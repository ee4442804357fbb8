"""Antialiased bicubic image resize with torch/torchvision semantics.

Preprocessing parity matters: the reference conditions on DINOv2 tokens
of a torchvision ``Resize(518, BICUBIC)`` image
(models/conditioner/image_dinov2.py:19-22), which antialiases on
downscale. ``jax.image.resize`` has no antialias, so we build the exact
separable cubic (a = -0.75) sampling matrices — kernel support scaled by
the downscale ratio, weights normalized — and apply them as two matmuls
(an MXU-friendly formulation).
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


def _cubic(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    ax = np.abs(x)
    ax2 = ax * ax
    ax3 = ax2 * ax
    w = np.where(
        ax <= 1,
        (a + 2) * ax3 - (a + 3) * ax2 + 1,
        np.where(ax < 2, a * ax3 - 5 * a * ax2 + 8 * a * ax - 4 * a, 0.0),
    )
    return w


@lru_cache(maxsize=64)
def _resize_matrix(in_size: int, out_size: int, antialias: bool = True) -> np.ndarray:
    """[out, in] row-stochastic cubic interpolation matrix
    (align_corners=False; antialias widens the kernel by the scale factor
    on downscale and uses the PIL-style a=-0.5 cubic, matching torch
    F.interpolate(..., mode='bicubic', antialias=True) bit-for-bit;
    antialias=False uses torch's plain bicubic a=-0.75)."""
    scale = in_size / out_size
    a = -0.5 if antialias else -0.75
    support_scale = max(scale, 1.0) if antialias else 1.0
    support = 2.0 * support_scale
    out = np.zeros((out_size, in_size), np.float64)
    for i in range(out_size):
        center = (i + 0.5) * scale - 0.5
        lo = int(np.floor(center - support))
        hi = int(np.ceil(center + support)) + 1
        idx = np.arange(lo, hi)
        w = _cubic((idx - center) / support_scale, a=a)
        # torch/PIL drop out-of-range taps and renormalize over the rest
        inb = (idx >= 0) & (idx < in_size)
        w = w * inb
        s = w.sum()
        if s != 0:
            w = w / s
        np.add.at(out[i], np.clip(idx, 0, in_size - 1), w)
    return out.astype(np.float32)


def resize_bicubic(img: jnp.ndarray, out_h: int, out_w: int,
                   antialias: bool = True) -> jnp.ndarray:
    """img: [..., H, W, C] -> [..., out_h, out_w, C]."""
    H, W = img.shape[-3], img.shape[-2]
    mh = jnp.asarray(_resize_matrix(H, out_h, antialias))
    mw = jnp.asarray(_resize_matrix(W, out_w, antialias))
    x = jnp.einsum("oh,...hwc->...owc", mh, img.astype(jnp.float32))
    x = jnp.einsum("ow,...hwc->...hoc", mw, x)
    return x
