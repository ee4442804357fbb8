"""PyTorch checkpoint -> topiaxl parameter conversion.

The released 3DTopia-XL weights are torch state_dicts (fp16 on HF hub;
DiT under key 'ema', VAE under 'model_state_dict' — reference
inference.py:257-262; DINOv2 from torch hub). These mappers rebuild our
flax pytrees from them. Layout rules (validated numerically in
tests/test_convert.py against torch layers):

* Linear  [out, in]            -> Dense kernel [in, out] (transpose)
* Conv3d  [out, in, kd,kh,kw]  -> Conv kernel [kd,kh,kw, in, out]
* ConvTranspose3d [in, out, k...] -> ConvTranspose kernel
  [k..., in, out] with SPATIALLY FLIPPED taps (torch convT correlates
  with the flipped kernel relative to lax.conv_transpose)
* GroupNorm/LayerNorm weight/bias -> scale/bias unchanged
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().float().numpy()
    return np.asarray(t, np.float32)


def linear(sd: Mapping, prefix: str) -> dict:
    out = {"kernel": _np(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def conv3d(sd: Mapping, prefix: str) -> dict:
    w = _np(sd[f"{prefix}.weight"])  # [out, in, kd, kh, kw]
    out = {"kernel": w.transpose(2, 3, 4, 1, 0)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def conv_transpose3d(sd: Mapping, prefix: str) -> dict:
    w = _np(sd[f"{prefix}.weight"])  # [in, out, kd, kh, kw]
    w = w[:, :, ::-1, ::-1, ::-1].transpose(2, 3, 4, 0, 1)
    out = {"kernel": np.ascontiguousarray(w)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def norm_affine(sd: Mapping, prefix: str) -> dict:
    return {
        "scale": _np(sd[f"{prefix}.weight"]),
        "bias": _np(sd[f"{prefix}.bias"]),
    }


# ---------------------------------------------------------------------------
# DiT (reference models/dit_crossattn.py param names)
# ---------------------------------------------------------------------------

def convert_dit(sd: Mapping, depth: int = 28) -> dict:
    """torch DiT state_dict (the 'ema' payload) -> flax params dict."""
    p: Dict = {}
    p["x_embedder"] = linear(sd, "x_embedder")
    p["t_embedder"] = {
        "fc1": linear(sd, "t_embedder.mlp.0"),
        "fc2": linear(sd, "t_embedder.mlp.2"),
    }
    if "null_cond_embedding" in sd:
        p["null_cond_embedding"] = _np(sd["null_cond_embedding"])
    for i in range(depth):
        b = f"blocks.{i}"
        p[f"blocks_{i}"] = {
            "adaLN_modulation": linear(sd, f"{b}.adaLN_modulation.1"),
            "crossattn": {
                "to_q": linear(sd, f"{b}.crossattn.to_q"),
                "to_k": linear(sd, f"{b}.crossattn.to_k"),
                "to_v": linear(sd, f"{b}.crossattn.to_v"),
                "proj": linear(sd, f"{b}.crossattn.proj"),
            },
            "attn": {
                "qkv": linear(sd, f"{b}.attn.qkv"),
                "proj": linear(sd, f"{b}.attn.proj"),
            },
            "mlp": {
                "fc1": linear(sd, f"{b}.mlp.fc1"),
                "fc2": linear(sd, f"{b}.mlp.fc2"),
            },
        }
    p["final_layer"] = {
        "adaLN_modulation": linear(sd, "final_layer.adaLN_modulation.1"),
        "linear": linear(sd, "final_layer.linear"),
    }
    return {"params": p}


# ---------------------------------------------------------------------------
# VAE3D (reference models/vae3d_dib.py param names)
# ---------------------------------------------------------------------------

def _resblock(sd, prefix) -> dict:
    out = {
        "norm1": {"GroupNorm_0": norm_affine(sd, f"{prefix}.norm1")},
        "conv1": conv3d(sd, f"{prefix}.conv1"),
        "norm2": {"GroupNorm_0": norm_affine(sd, f"{prefix}.norm2")},
        "conv2": conv3d(sd, f"{prefix}.conv2"),
    }
    if f"{prefix}.shortcut.weight" in sd:
        out["shortcut"] = conv3d(sd, f"{prefix}.shortcut")
    return out


def _attnblock(sd, prefix) -> dict:
    return {
        "GroupNorm32_0": {"GroupNorm_0": norm_affine(sd, f"{prefix}.norm")},
        "attn": {
            "qkv": linear(sd, f"{prefix}.attn.qkv"),
            "proj": linear(sd, f"{prefix}.attn.proj"),
        },
    }


def _midblock(sd, prefix, num_layers=1) -> dict:
    out = {"res0": _resblock(sd, f"{prefix}.nets.0")}
    for i in range(num_layers):
        out[f"res{i + 1}"] = _resblock(sd, f"{prefix}.nets.{i + 1}")
        if f"{prefix}.attns.{i}.norm.weight" in sd:
            out[f"attn{i}"] = _attnblock(sd, f"{prefix}.attns.{i}")
    return out


def convert_vae(sd: Mapping, down_channels=(32, 256), up_channels=(256, 32),
                layers_per_block: int = 2) -> dict:
    enc: Dict = {"conv_in": conv3d(sd, "encoder.conv_in")}
    for i in range(len(down_channels)):
        blk = {}
        for j in range(layers_per_block):
            blk[f"res{j}"] = _resblock(sd, f"encoder.down_blocks.{i}.nets.{j}")
        if f"encoder.down_blocks.{i}.downsample.weight" in sd:
            blk["down"] = conv3d(sd, f"encoder.down_blocks.{i}.downsample")
        enc[f"down{i}"] = blk
    enc["mid"] = _midblock(sd, "encoder.mid_block")
    enc["GroupNorm32_0"] = {"GroupNorm_0": norm_affine(sd, "encoder.norm_out")}
    enc["conv_out"] = conv3d(sd, "encoder.conv_out")

    dec: Dict = {"conv_in": conv3d(sd, "decoder.conv_in")}
    dec["mid"] = _midblock(sd, "decoder.mid_block")
    for i in range(len(up_channels)):
        blk = {}
        for j in range(layers_per_block):
            blk[f"res{j}"] = _resblock(sd, f"decoder.up_blocks.{i}.nets.{j}")
        if f"decoder.up_blocks.{i}.upsample.weight" in sd:
            blk["up"] = conv_transpose3d(sd, f"decoder.up_blocks.{i}.upsample")
        dec[f"up{i}"] = blk
    dec["GroupNorm32_0"] = {"GroupNorm_0": norm_affine(sd, "decoder.norm_out")}
    dec["conv_out"] = conv_transpose3d(sd, "decoder.conv_out")

    return {"params": {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": conv3d(sd, "quant_conv"),
        "post_quant_conv": conv3d(sd, "post_quant_conv"),
    }}


# ---------------------------------------------------------------------------
# DINOv2 (Meta checkpoint names)
# ---------------------------------------------------------------------------

def convert_dinov2(sd: Mapping, depth: int = 12) -> dict:
    p: Dict = {}
    w = _np(sd["patch_embed.proj.weight"])  # [D, 3, p, p] 2D conv
    p["patch_embed"] = {
        "kernel": w.transpose(2, 3, 1, 0),
        "bias": _np(sd["patch_embed.proj.bias"]),
    }
    p["cls_token"] = _np(sd["cls_token"])
    p["pos_embed"] = _np(sd["pos_embed"])
    if "register_tokens" in sd:
        p["register_tokens"] = _np(sd["register_tokens"])
    for i in range(depth):
        b = f"blocks.{i}"
        p[f"block{i}"] = {
            "norm1": norm_affine(sd, f"{b}.norm1"),
            "norm2": norm_affine(sd, f"{b}.norm2"),
            "attn": {
                "qkv": linear(sd, f"{b}.attn.qkv"),
                "proj": linear(sd, f"{b}.attn.proj"),
            },
            "fc1": linear(sd, f"{b}.mlp.fc1"),
            "fc2": linear(sd, f"{b}.mlp.fc2"),
            "ls1_gamma": _np(sd[f"{b}.ls1.gamma"]),
            "ls2_gamma": _np(sd[f"{b}.ls2.gamma"]),
        }
    p["norm"] = norm_affine(sd, "norm")
    return {"params": p}


def conv2d_bn_folded(sd: Mapping, conv: str, bn: str,
                     eps: float = 1e-5) -> dict:
    """torch Conv2d + eval-mode BatchNorm2d -> one flax Conv.

    Eval BN is affine: y = (x - mean) / sqrt(var + eps) * gamma + beta.
    Folding: W' = W * s[out], b' = (b - mean) * s + beta with
    s = gamma / sqrt(var + eps). Exact (fp roundoff only)."""
    w = _np(sd[f"{conv}.weight"])  # [out, in, kh, kw]
    b = _np(sd[f"{conv}.bias"]) if f"{conv}.bias" in sd else 0.0
    gamma = _np(sd[f"{bn}.weight"])
    beta = _np(sd[f"{bn}.bias"])
    mean = _np(sd[f"{bn}.running_mean"])
    var = _np(sd[f"{bn}.running_var"])
    s = gamma / np.sqrt(var + eps)
    return {
        "kernel": (w * s[:, None, None, None]).transpose(2, 3, 1, 0),
        "bias": (b - mean) * s + beta,
    }


def conv2d(sd: Mapping, prefix: str) -> dict:
    w = _np(sd[f"{prefix}.weight"])  # [out, in, kh, kw]
    out = {"kernel": w.transpose(2, 3, 1, 0)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def convert_u2net(sd: Mapping) -> dict:
    """torch U^2-Net state_dict (official u2net/u2netp layout, the
    weights rembg ships) -> flax params with BN folded into each conv.

    Works for both arches: module names are discovered from the keys
    (stage*.rebnconv*.conv_s1 + side1..6 + outconv)."""
    p: Dict = {}
    for key in sd:
        if not key.endswith(".conv_s1.weight"):
            continue
        mod = key[: -len(".conv_s1.weight")]  # e.g. stage1.rebnconv4d
        parts = mod.split(".")
        node = p
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = {
            "conv": conv2d_bn_folded(sd, f"{mod}.conv_s1", f"{mod}.bn_s1")
        }
    for i in range(1, 7):
        p[f"side{i}"] = conv2d(sd, f"side{i}")
    p["outconv"] = conv2d(sd, "outconv")
    return {"params": p}


def load_torch_checkpoint(path: str, key: str | None = None) -> dict:
    """Load a torch .pt/.pth checkpoint on CPU, optionally unwrapping a
    top-level key ('ema' for DiT, 'model_state_dict' for VAE)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if key is not None:
        sd = sd[key]
    return sd
