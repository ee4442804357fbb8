"""Ring attention: context-parallel attention over a mesh axis.

The DiT's 2048-token sequence fits one chip, but SURVEY.md §5 requires
the attention to be mesh-aware so a context-parallel axis can be added
when prim counts grow. This is that primitive: inside ``shard_map``
with queries/keys/values sharded over tokens on ``axis_name``, each
device attends its local queries against the K/V ring — K/V blocks
rotate by ``lax.ppermute`` while partial softmax states merge online
(the FlashAttention accumulation across devices instead of across VMEM
blocks). Memory per device is O(N/P); the K/V transfer for step i+1
overlaps the attention compute of step i (XLA schedules the ppermute
async on ICI).

No reference counterpart (the reference is single-GPU xformers,
models/attention.py); numerics-equivalence vs dense attention is tested
on the virtual CPU mesh (tests/test_ring_attention.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _block_attend(q, k, v, scale):
    """Partial softmax state of q against one K/V block.

    q: [B, Nq, H, D]; k/v: [B, Nk, H, D] ->
    (m [B, Nq, H, 1], l [B, Nq, H, 1], acc [B, Nq, H, D]) in f32.
    """
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k,
        preferred_element_type=jnp.float32) * scale
    m = jnp.max(logits, axis=-1, keepdims=True)          # [B, H, Nq, 1]
    p = jnp.exp(logits - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    acc = jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    # move to [B, Nq, H, 1] so the state broadcasts over D
    m = m.transpose(0, 2, 1, 3)
    l = l.transpose(0, 2, 1, 3)
    return m, l, acc


def ring_attention(q, k, v, scale: float, axis_name: str | None = None):
    """[B, n_local, H, D] tokens-sharded attention over ``axis_name``.

    Call inside ``shard_map`` with q/k/v sharded on the token dim over
    ``axis_name``. With ``axis_name=None`` (or outside shard_map) this
    is plain dense attention — the degenerate single-device case.
    Output dtype follows q.
    """
    if axis_name is None:
        m, l, acc = _block_attend(q, k, v, scale)
        return (acc / jnp.maximum(l, 1e-30)).astype(q.dtype)

    P = jax.lax.axis_size(axis_name)
    perm = [(i, (i + 1) % P) for i in range(P)]

    m0, l0, acc0 = _block_attend(q, k, v, scale)

    def body(i, carry):
        m, l, acc, kb, vb = carry
        # rotate the K/V block around the ring, then merge its partial
        # state into the running softmax
        kb = jax.lax.ppermute(kb, axis_name, perm)
        vb = jax.lax.ppermute(vb, axis_name, perm)
        mb, lb, ab = _block_attend(q, kb, vb, scale)
        m_new = jnp.maximum(m, mb)
        a1 = jnp.exp(m - m_new)
        a2 = jnp.exp(mb - m_new)
        l = l * a1 + lb * a2
        acc = acc * a1 + ab * a2
        return m_new, l, acc, kb, vb

    m, l, acc, _, _ = jax.lax.fori_loop(0, P - 1, body,
                                        (m0, l0, acc0, k, v))
    return (acc / jnp.maximum(l, 1e-30)).astype(q.dtype)
