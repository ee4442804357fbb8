"""Shared neural-net building blocks (flax.linen).

Counterparts of the reference's models/utils.py:19-101 (modulate,
TimestepEmbedder, Mlp) and models/attention.py:20-114 (self/cross
attention), laid out for TPU: bf16 matmuls on the MXU with f32
LayerNorm/softmax/residual arithmetic (instead of the reference's fp16
autocast regions).
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import multi_head_attention
from ..ops.int8 import QuantDense

Dtype = Any


def _dense(quant: bool):
    """The matmul layer class: W8A8 QuantDense when serving int8."""
    return QuantDense if quant else nn.Dense


def modulate(x: jnp.ndarray, shift: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """adaLN modulation: x * (1 + scale) + shift, broadcast over tokens
    (reference models/utils.py:19-20)."""
    return x * (1 + scale[:, None, :]) + shift[:, None, :]


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: int = 10000) -> jnp.ndarray:
    """Sinusoidal timestep embedding, cos-then-sin ordering
    (reference models/utils.py:40-59)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class TimestepEmbedder(nn.Module):
    """freq(256) -> Dense -> SiLU -> Dense (reference models/utils.py:27-64).

    Tiny op; runs in f32.
    """

    hidden_size: int
    frequency_embedding_size: int = 256

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        x = timestep_embedding(t, self.frequency_embedding_size)
        x = nn.Dense(self.hidden_size, name="fc1",
                     kernel_init=nn.initializers.normal(0.02))(x)
        x = nn.silu(x)
        x = nn.Dense(self.hidden_size, name="fc2",
                     kernel_init=nn.initializers.normal(0.02))(x)
        return x


class Mlp(nn.Module):
    """ViT MLP with tanh-approximated GELU (reference models/utils.py:66-101)."""

    hidden_features: int
    out_features: int
    dtype: Dtype = jnp.bfloat16
    quant: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from jax.ad_checkpoint import checkpoint_name

        dense = _dense(self.quant)
        x = dense(self.hidden_features, dtype=self.dtype, name="fc1",
                  kernel_init=nn.initializers.xavier_uniform())(x)
        # named for the 'flash_mlp' remat policy: saving the fc1
        # pre-activation lets the backward skip the widest matmul's
        # recompute while costing [*, 4*hidden] bf16 per block
        x = checkpoint_name(x, "mlp_fc1")
        x = nn.gelu(x, approximate=True)
        x = dense(self.out_features, dtype=self.dtype, name="fc2",
                  kernel_init=nn.initializers.xavier_uniform())(x)
        return x


class SelfAttention(nn.Module):
    """Fused-QKV self attention (reference models/attention.py:20-59)."""

    dim: int
    num_heads: int
    qkv_bias: bool = True
    proj_bias: bool = True
    dtype: Dtype = jnp.bfloat16
    backend: str = "auto"
    quant: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, N, _ = x.shape
        dense = _dense(self.quant)
        head_dim = self.dim // self.num_heads
        qkv = dense(self.dim * 3, use_bias=self.qkv_bias, dtype=self.dtype,
                    name="qkv", kernel_init=nn.initializers.xavier_uniform())(x)
        qkv = qkv.reshape(B, N, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        out = multi_head_attention(q, k, v, scale=head_dim**-0.5,
                                   backend=self.backend)
        out = out.reshape(B, N, self.dim)
        return dense(self.dim, use_bias=self.proj_bias, dtype=self.dtype,
                     name="proj", kernel_init=nn.initializers.xavier_uniform())(out)


class CrossAttention(nn.Module):
    """Cross attention with separate q/k/v projections
    (reference models/attention.py:62-114).

    NOTE: reproduces the reference's effective double scaling — q is
    pre-scaled by head_dim**-0.5 on top of the attention's own
    head_dim**-0.5 (models/attention.py:105 + xformers default) — because
    the released checkpoints were trained with it.
    """

    dim: int
    num_heads: int
    qkv_bias: bool = True
    proj_bias: bool = True
    dtype: Dtype = jnp.bfloat16
    backend: str = "auto"
    quant: bool = False

    def setup(self):
        init = nn.initializers.xavier_uniform()
        # per-step matmuls (to_q, proj) take the int8 path; to_k/to_v run
        # ONCE per asset (precomputed K/V) so they stay float — no perf
        # win, no quality cost
        dense = _dense(self.quant)
        self.to_q = dense(self.dim, use_bias=self.qkv_bias, dtype=self.dtype,
                          kernel_init=init)
        self.to_k = nn.Dense(self.dim, use_bias=self.qkv_bias, dtype=self.dtype,
                             kernel_init=init)
        self.to_v = nn.Dense(self.dim, use_bias=self.qkv_bias, dtype=self.dtype,
                             kernel_init=init)
        self.proj = dense(self.dim, use_bias=self.proj_bias, dtype=self.dtype,
                          kernel_init=init)

    def kv(self, ctx: jnp.ndarray):
        """Project the conditioning sequence to per-head K/V.

        The conditioning tokens are constant across diffusion steps, so
        callers compute this ONCE per sample and reuse it for every
        denoise step (a TPU-side saving the reference doesn't exploit).
        """
        B, M, _ = ctx.shape
        head_dim = self.dim // self.num_heads
        k = self.to_k(ctx).reshape(B, M, self.num_heads, head_dim)
        v = self.to_v(ctx).reshape(B, M, self.num_heads, head_dim)
        return k, v

    def uniform_out(self, v: jnp.ndarray) -> jnp.ndarray:
        """Attention output when ALL kv tokens are identical (CFG null
        branch: the null embedding broadcast over the sequence). Softmax
        over equal logits is exactly uniform, so the attention output is
        v itself for every query — the whole attend() collapses to
        proj(v), independent of x. v: [B, 1, H, Dh] -> [B, 1, dim]."""
        B = v.shape[0]
        return self.proj(v.reshape(B, 1, self.dim))

    def attend(self, x: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
        B, N, _ = x.shape
        head_dim = self.dim // self.num_heads
        q = self.to_q(x).reshape(B, N, self.num_heads, head_dim)
        # under a context-parallel ring backend only the self-attn tokens
        # are sharded; cond K/V are replicated, so cross-attn is plain
        # local attention of the local q shard against the full K/V
        backend = "auto" if self.backend.startswith("ring:") else self.backend
        out = multi_head_attention(q, k, v, scale=float(head_dim) ** -1.0,
                                   backend=backend)
        out = out.reshape(B, N, self.dim)
        return self.proj(out)

    def __call__(self, x: jnp.ndarray, ctx: jnp.ndarray) -> jnp.ndarray:
        k, v = self.kv(ctx)
        return self.attend(x, k, v)


class LayerNormF32(nn.Module):
    """Affine-free LayerNorm computed in f32 (torch LN under autocast runs
    f32; reference blocks use elementwise_affine=False, eps=1e-6).

    ``out_dtype`` controls the emitted dtype: the normalization math is
    always f32, but emitting the model dtype (bf16) directly lets XLA
    fuse LN+modulate+cast without an f32 round-trip through HBM —
    the residual stream then stays bf16 end to end, matching the
    reference's fp16-autocast stream (dit_crossattn.py:197)."""

    epsilon: float = 1e-6
    out_dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x32 = x.astype(jnp.float32)
        mean = x32.mean(axis=-1, keepdims=True)
        var = x32.var(axis=-1, keepdims=True)
        out = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon)
        return out if self.out_dtype is None else out.astype(self.out_dtype)
