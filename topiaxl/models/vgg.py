"""VGG19 feature extractor + masked perceptual loss (flax).

Parity with the reference's VGGLossMasked (dva/vgg.py:16-90): five
feature slices of a frozen VGG19 (conv stacks up to relu1_2, relu2_2,
relu3_4, relu4_4, relu5_4), weighted masked L1 between feature maps.
Used by the legacy image-space training path. Weights convert from a
torchvision VGG19 ``features`` state_dict via ``convert_vgg19``
(no hub download in this sandbox — pass a local file).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

# torchvision vgg19.features conv layer indices per slice
_SLICES = [(0, 2), (2, 7), (7, 16), (16, 25), (25, 34)]
_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
        512, 512, 512, 512, "M", 512, 512, 512, 512]


class VGG19Features(nn.Module):
    """Returns the 5 feature slices of VGG19 for input [B, H, W, 3] in
    [0, 1] (caller normalizes like the reference does)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> list[jnp.ndarray]:
        outs = []
        li = 0
        slice_ends = [e for (_, e) in _SLICES]
        for item in _CFG:
            if item == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                li += 1
            else:
                x = nn.Conv(item, (3, 3), padding=((1, 1), (1, 1)),
                            dtype=self.dtype, name=f"conv{li}")(x)
                x = nn.relu(x)
                li += 2
            if li in slice_ends:
                outs.append(x)
        return outs


def convert_vgg19(sd) -> dict:
    """torchvision vgg19().features state_dict -> flax params."""
    p = {}
    li = 0
    for item in _CFG:
        if item == "M":
            li += 1
            continue
        w = np.asarray(sd[f"{li}.weight"], np.float32)  # [out,in,kh,kw]
        b = np.asarray(sd[f"{li}.bias"], np.float32)
        p[f"conv{li}"] = {"kernel": w.transpose(2, 3, 1, 0), "bias": b}
        li += 2
    return {"params": p}


def vgg_loss_masked(
    features_fn,
    x: jnp.ndarray,
    y: jnp.ndarray,
    mask: jnp.ndarray,
    weights: Sequence[float] = (1.0, 1.0, 1.0, 1.0, 1.0),
) -> jnp.ndarray:
    """Masked weighted L1 over VGG feature slices
    (reference dva/vgg.py:52-90). x, y: [B, H, W, 3]; mask: [B, H, W, 1].
    """
    fx = features_fn(x * mask)
    fy = features_fn(y * mask)
    total = 0.0
    for w, a, b in zip(weights, fx, fy):
        total = total + w * jnp.mean(jnp.abs(a - b))
    return total
