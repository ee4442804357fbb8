"""CLIP text/vision towers — flax implementation + torch converter.

The reference conditions through open_clip CLIP encoders for its
(unreleased) text-conditioned model and an alternative image path
(models/conditioner/text.py:24-38, image.py:239-290). open_clip is not
available here and the zero-egress sandbox can't download weights, so
this module implements the towers natively in flax with a converter
from transformers CLIPTextModel / CLIPVisionModel state_dicts —
forward parity is pinned in tests/test_model_parity.py against
randomly-initialized transformers models, so released weights load
correctly whenever a user supplies them locally.

Architecture (standard CLIP): token/patch + position embeddings,
pre-LN transformer layers (LN -> attn -> residual, LN -> MLP with
quick_gelu -> residual), final LN. The text tower uses causal
attention and pools at the EOS token; the vision tower prepends a
class embedding, applies a pre-layernorm, and pools the class token
through a post-layernorm.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class _ClipAttention(nn.Module):
    dim: int
    num_heads: int
    causal: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, N, _ = x.shape
        hd = self.dim // self.num_heads
        q = nn.Dense(self.dim, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(self.dim, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(self.dim, dtype=self.dtype, name="v_proj")(x)
        q = q.reshape(B, N, self.num_heads, hd)
        k = k.reshape(B, N, self.num_heads, hd)
        v = v.reshape(B, N, self.num_heads, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * hd**-0.5
        if self.causal:
            mask = jnp.tril(jnp.ones((N, N), bool))
            logits = jnp.where(mask[None, None], logits, -1e30)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(x.dtype), v)
        out = out.reshape(B, N, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="out_proj")(out)


class _ClipLayer(nn.Module):
    dim: int
    num_heads: int
    mlp_dim: int
    causal: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(epsilon=1e-5, name="layer_norm1")(x)
        x = x + _ClipAttention(self.dim, self.num_heads, self.causal,
                               self.dtype, name="self_attn")(h)
        h = nn.LayerNorm(epsilon=1e-5, name="layer_norm2")(x)
        h = nn.Dense(self.mlp_dim, dtype=self.dtype, name="fc1")(h)
        h = quick_gelu(h)
        h = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(h)
        return x + h


class CLIPTextTower(nn.Module):
    """Text encoder; __call__(input_ids [B, N]) -> dict with
    last_hidden_state [B, N, D] and pooled [B, D] (EOS position)."""

    vocab_size: int = 49408
    hidden_size: int = 512
    num_layers: int = 12
    num_heads: int = 8
    mlp_dim: int = 2048
    max_positions: int = 77
    eos_token_id: int = 49407
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray):
        B, N = input_ids.shape
        tok = nn.Embed(self.vocab_size, self.hidden_size,
                       name="token_embedding")(input_ids)
        pos = self.param("position_embedding",
                         nn.initializers.normal(0.01),
                         (self.max_positions, self.hidden_size))
        x = tok + pos[None, :N]
        for i in range(self.num_layers):
            x = _ClipLayer(self.hidden_size, self.num_heads, self.mlp_dim,
                           causal=True, dtype=self.dtype,
                           name=f"layer{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="final_layer_norm")(x)
        # pooled = hidden state at the EOS token (transformers semantics:
        # first position equal to eos_token_id)
        is_eos = (input_ids == self.eos_token_id)
        has_eos = is_eos.any(axis=1)
        eos_pos = jnp.where(has_eos, jnp.argmax(is_eos, axis=1),
                            jnp.argmax(input_ids, axis=1))
        pooled = x[jnp.arange(B), eos_pos]
        return {"last_hidden_state": x, "pooled": pooled}


class CLIPVisionTower(nn.Module):
    """Vision encoder; __call__(pixels [B, H, W, 3]) -> dict with
    last_hidden_state [B, 1+P, D] and pooled [B, D] (post-LN class
    token)."""

    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_dim: int = 3072
    patch_size: int = 32
    image_size: int = 224
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pixels: jnp.ndarray):
        B, H, W, _ = pixels.shape
        p = self.patch_size
        x = nn.Conv(self.hidden_size, (p, p), strides=(p, p),
                    padding="VALID", use_bias=False, dtype=self.dtype,
                    name="patch_embedding")(pixels)
        x = x.reshape(B, -1, self.hidden_size)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (self.hidden_size,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls[None, None], (B, 1, self.hidden_size)), x],
            axis=1)
        npos = 1 + (self.image_size // p) ** 2
        pos = self.param("position_embedding",
                         nn.initializers.normal(0.01),
                         (npos, self.hidden_size))
        x = x + pos[None, : x.shape[1]]
        x = nn.LayerNorm(epsilon=1e-5, name="pre_layrnorm")(x)
        for i in range(self.num_layers):
            x = _ClipLayer(self.hidden_size, self.num_heads, self.mlp_dim,
                           causal=False, dtype=self.dtype,
                           name=f"layer{i}")(x)
        pooled = nn.LayerNorm(epsilon=1e-5, name="post_layernorm")(x[:, 0])
        return {"last_hidden_state": x, "pooled": pooled}


# ---------------------------------------------------------------------------
# torch state_dict -> flax params
# ---------------------------------------------------------------------------

def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().float().numpy()
    return np.asarray(t, np.float32)


def _lin(sd, p):
    out = {"kernel": _np(sd[f"{p}.weight"]).T}
    if f"{p}.bias" in sd:
        out["bias"] = _np(sd[f"{p}.bias"])
    return out


def _ln(sd, p):
    return {"scale": _np(sd[f"{p}.weight"]), "bias": _np(sd[f"{p}.bias"])}


def _layers(sd, prefix, n):
    out = {}
    for i in range(n):
        b = f"{prefix}.layers.{i}"
        out[f"layer{i}"] = {
            "layer_norm1": _ln(sd, f"{b}.layer_norm1"),
            "layer_norm2": _ln(sd, f"{b}.layer_norm2"),
            "self_attn": {
                "q_proj": _lin(sd, f"{b}.self_attn.q_proj"),
                "k_proj": _lin(sd, f"{b}.self_attn.k_proj"),
                "v_proj": _lin(sd, f"{b}.self_attn.v_proj"),
                "out_proj": _lin(sd, f"{b}.self_attn.out_proj"),
            },
            "fc1": _lin(sd, f"{b}.mlp.fc1"),
            "fc2": _lin(sd, f"{b}.mlp.fc2"),
        }
    return out


def convert_clip_text(sd, num_layers: int = 12) -> dict:
    """transformers CLIPTextModel state_dict -> CLIPTextTower params."""
    t = "text_model"
    p = {
        "token_embedding": {
            "embedding": _np(sd[f"{t}.embeddings.token_embedding.weight"])},
        "position_embedding": _np(
            sd[f"{t}.embeddings.position_embedding.weight"]),
        "final_layer_norm": _ln(sd, f"{t}.final_layer_norm"),
    }
    p.update(_layers(sd, f"{t}.encoder", num_layers))
    return {"params": p}


def convert_clip_vision(sd, num_layers: int = 12) -> dict:
    """transformers CLIPVisionModel state_dict -> CLIPVisionTower params."""
    v = "vision_model"
    w = _np(sd[f"{v}.embeddings.patch_embedding.weight"])  # [D, 3, p, p]
    p = {
        "patch_embedding": {"kernel": w.transpose(2, 3, 1, 0)},
        "class_embedding": _np(sd[f"{v}.embeddings.class_embedding"]),
        "position_embedding": _np(
            sd[f"{v}.embeddings.position_embedding.weight"]),
        "pre_layrnorm": _ln(sd, f"{v}.pre_layrnorm"),
        "post_layernorm": _ln(sd, f"{v}.post_layernorm"),
    }
    p.update(_layers(sd, f"{v}.encoder", num_layers))
    return {"params": p}
