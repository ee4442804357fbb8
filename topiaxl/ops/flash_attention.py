"""Fused FlashAttention-style TPU kernel (Pallas).

Replaces xformers ``memory_efficient_attention`` on the DiT hot path
(reference models/attention.py:54,109). Online-softmax tiling: each
program owns one (batch, head, q-block) and streams K/V blocks through
VMEM, keeping running max/denominator — logits never materialize in HBM.
Tuned for the flagship shapes (self: 2048 x 2048, cross: 2048 x 1370,
head_dim 72 padded to the 128-lane width).

Numerics: logits and the softmax state are f32 regardless of input
dtype (like the XLA path in ops/attention.py); output keeps the input
dtype. Backward falls back to recomputed XLA attention via custom_vjp —
fine for training at these sequence lengths, while the forward (the
25-step inference loop) gets the fused kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, kv_len: int,
                  block_k: int):
    # refs: q [1, BQ, D], k/v [1, SKp, D], o [1, BQ, D]; leading dim is
    # the folded (batch*head) index. Matmul INPUTS stay in the stored
    # dtype (bf16) with f32 accumulation — casting them to f32 first
    # would run the MXU at the decomposed-f32 rate (~3-6x slower); the
    # softmax state (m, l, acc) is f32 as usual.
    q = q_ref[0, :, :]                                  # [BQ, D] bf16
    bq, d = q.shape
    skp = k_ref.shape[1]
    nk = skp // block_k

    def body(i, carry):
        acc, m, l = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :]
        v = v_ref[0, pl.ds(i * block_k, block_k), :]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                       # [BQ, BK] f32
        col = i * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (bq, block_k), 1)
        logits = jnp.where(col < kv_len, logits, _NEG_INF)

        m_new = jnp.maximum(m, jnp.max(logits, axis=1, keepdims=True))
        p = jnp.exp(logits - m_new)                     # [BQ, BK] f32
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc_new, m_new, l_new

    acc0 = jnp.zeros((bq, d), jnp.float32)
    m0 = jnp.full((bq, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, nk, body, (acc0, m0, l0))
    out = acc / jnp.maximum(l, 1e-30)
    o_ref[0, :, :] = out.astype(o_ref.dtype)


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _flash_forward(q, k, v, scale, block_q=512, block_k=2048, interpret=None):
    # defaults tuned on v5e at flagship shapes (2x2048x16x72): a single
    # K/V block (no inner loop) + 512-row q blocks measured 1.7 ms vs
    # 34 ms for (256, 512)
    B, Sq, H, D = q.shape
    Sk = k.shape[1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # TPU lowering requires the sublane dim of each block be a multiple
    # of 8 (or the full array dim). block_k only needs 8-alignment, NOT a
    # power of two: the flagship cross-attn KV (1370 tokens) pads to 1376
    # instead of 2048 — 33% less MXU work
    block_q = min(block_q, -(-Sq // 8) * 8)
    block_k = min(block_k, -(-Sk // 8) * 8)

    sq_p = -(-Sq // block_q) * block_q
    sk_p = -(-Sk // block_k) * block_k
    d_p = max(128, -(-D // 128) * 128)

    # fold (batch, head) into one leading dim: TPU block shapes constrain
    # only the LAST TWO dims, so refs become [1, seq, d]
    def fold(x, s_p):
        x = _pad_to(_pad_to(x, s_p, 1), d_p, 3)
        return x.transpose(0, 2, 1, 3).reshape(B * H, s_p, d_p)

    qp = fold(q, sq_p)
    kp = fold(k, sk_p)
    vp = fold(v, sk_p)

    grid = (B * H, sq_p // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, kv_len=Sk,
                          block_k=block_k),
        out_shape=jax.ShapeDtypeStruct((B * H, sq_p, d_p), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d_p), lambda bh, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_p, d_p), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_p, d_p), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d_p), lambda bh, i: (bh, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qp, kp, vp)
    out = out.reshape(B, H, sq_p, d_p).transpose(0, 2, 1, 3)
    return out[:, :Sq, :, :D]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(q, k, v, scale: float):
    """q [B,Sq,H,D], k/v [B,Sk,H,D] -> [B,Sq,H,D]."""
    return _flash_forward(q, k, v, scale)


def _fwd(q, k, v, scale):
    return _flash_forward(q, k, v, scale), (q, k, v)


def _bwd(scale, res, g):
    # recompute-based backward through the XLA formulation
    from .attention import _xla_attention

    q, k, v = res
    _, vjp = jax.vjp(lambda q, k, v: _xla_attention(q, k, v, scale), q, k, v)
    return vjp(g)


flash_attention.defvjp(_fwd, _bwd)
