"""Fused FlashAttention-style TPU kernel (Pallas).

Replaces xformers ``memory_efficient_attention`` on the DiT hot path
(reference models/attention.py:54,109). Online-softmax tiling: each
program owns one (batch, head, q-block) and streams K/V blocks through
VMEM, keeping running max/denominator — logits never materialize in HBM.
Tuned for the flagship shapes (self: 2048 x 2048, cross: 2048 x 1370,
head_dim 72 padded to the 128-lane width).

Numerics: logits and the softmax state are f32 regardless of input
dtype (like the XLA path in ops/attention.py); output keeps the input
dtype. The backward is the fused FlashAttention-2 two-pass form (a dq
kernel blocked over queries and a dk/dv kernel blocked over keys),
rebuilding the softmax from the forward's saved logsumexp — the
attention matrix never materializes in HBM in either direction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref=None, *,
                  kv_len: int, block_k: int):
    # refs: q [1, BQ, D], k/v [1, SKp, D], o [1, BQ, D]; leading dim is
    # the folded (batch*head) index. Matmul INPUTS stay in the stored
    # dtype (bf16) with f32 accumulation — casting them to f32 first
    # would run the MXU at the decomposed-f32 rate (~3-6x slower); the
    # softmax state (m, l, acc) is f32 as usual.
    #
    # VPU economy (measured ~5% of the layer stack): the softmax scale is
    # folded into q by the host wrapper (saves a [BQ, BK] multiply per
    # block), KV padding is masked by a broadcast [1, BK] bias add
    # instead of a full-size iota/compare/select, and the single-KV-block
    # case (the flagship shapes) skips the running-max rescale chain.
    bq, d = q_ref.shape[1], q_ref.shape[2]
    skp = k_ref.shape[1]
    nk = skp // block_k
    padded = skp != kv_len

    def logits_for(i):
        k = k_ref[0, pl.ds(i * block_k, block_k), :]
        logits = jax.lax.dot_general(
            q_ref[0, :, :], k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                               # [BQ, BK] f32
        if padded:
            col = i * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (1, block_k), 1)
            logits = logits + jnp.where(col < kv_len, 0.0, _NEG_INF)
        return logits

    if nk == 1:
        # single-KV-block fast path, software-pipelined: the q block is
        # processed in row chunks with chunk i+1's logits matmul (MXU)
        # issued before chunk i's softmax (VPU) + p@v, so Mosaic can
        # overlap the units (measured: self 14.1->13.1 ms, cross
        # 11.6->9.7 ms per 28-layer stack; bit-identical output)
        sub = max(1, bq // 256)
        while sub > 1 and (bq % sub or (bq // sub) % 8):
            sub -= 1
        c = bq // sub
        v = v_ref[0, :, :]

        def chunk_logits(i):
            qc = q_ref[0, pl.ds(i * c, c), :]
            logits = jax.lax.dot_general(
                qc, k_ref[0, :, :], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if padded:
                col = jax.lax.broadcasted_iota(jnp.int32, (1, skp), 1)
                logits = logits + jnp.where(col < kv_len, 0.0, _NEG_INF)
            return logits

        lg = chunk_logits(0)
        for i in range(sub):
            lg_next = chunk_logits(i + 1) if i + 1 < sub else None
            m = jnp.max(lg, axis=1, keepdims=True)
            p = jnp.exp(lg - m)
            l = jnp.sum(p, axis=1, keepdims=True)
            acc = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[0, pl.ds(i * c, c), :] = (
                acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
            if lse_ref is not None:
                lse_ref[0, pl.ds(i * c, c), :] = (
                    m + jnp.log(jnp.maximum(l, 1e-30)))
            lg = lg_next
        return

    def body(i, carry):
        acc, m, l = carry
        logits = logits_for(i)
        v = v_ref[0, pl.ds(i * block_k, block_k), :]
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
    if lse_ref is not None:
        # logsumexp of the scaled logits — the backward kernels rebuild
        # p = exp(logits - lse) from it without rerunning the softmax
        # chain. (stored with a singleton lane dim: TPU block shapes
        # constrain the last two dims, so [BH, S] cannot be q-blocked.)
        # Only emitted under jax.grad — the inference forward skips the
        # extra output (measured ~1% of the step).
        lse_ref[0, :, :] = m + jnp.log(jnp.maximum(l, 1e-30))


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _fold_sizes(q, k, block_q, block_k):
    B, Sq, H, D = q.shape
    Sk = k.shape[1]
    # TPU lowering requires the sublane dim of each block be a multiple
    # of 8 (or the full array dim). block_k only needs 8-alignment, NOT a
    # power of two: the flagship cross-attn KV (1370 tokens) pads to 1376
    # instead of 2048 — 33% less MXU work
    block_q = min(block_q, -(-Sq // 8) * 8)
    block_k = min(block_k, -(-Sk // 8) * 8)
    sq_p = -(-Sq // block_q) * block_q
    sk_p = -(-Sk // block_k) * block_k
    # head_dim stays UNPADDED in HBM (8-aligned only): Mosaic pads the
    # lane dim to 128 internally at identical MXU cost (measured,
    # benchmarks/exp_flash_dpad.py: bit-identical numerics, ~3% faster
    # fwd+bwd from the dropped pad/copy traffic)
    d_p = -(-D // 8) * 8
    return block_q, block_k, sq_p, sk_p, d_p


def _fold(x, s_p, d_p):
    # fold (batch, head) into one leading dim: TPU block shapes constrain
    # only the LAST TWO dims, so refs become [1, seq, d]
    B, S, H, D = x.shape
    x = _pad_to(_pad_to(x, s_p, 1), d_p, 3)
    return x.transpose(0, 2, 1, 3).reshape(B * H, s_p, d_p)


def _unfold(x, B, H, Sq, D):
    return x.reshape(B, H, x.shape[1], x.shape[2]).transpose(0, 2, 1, 3)[
        :, :Sq, :, :D]


def _flash_forward(q, k, v, scale, block_q=1024, block_k=2048,
                   interpret=None, return_lse=False):
    # defaults tuned on v5e at flagship shapes (2x2048x16x72): a single
    # K/V block (no inner loop) + 1024-row q blocks; 2048-row q blocks
    # exceed the 16 MB scoped-VMEM limit (f32 logits alone are 16 MB)
    B, Sq, H, D = q.shape
    Sk = k.shape[1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    block_q, block_k, sq_p, sk_p, d_p = _fold_sizes(q, k, block_q, block_k)

    # fold the softmax scale into q once ([B,S,H,D] elementwise) instead
    # of scaling the [BQ, BK] logits every block inside the kernel; the
    # bf16 re-rounding of q*scale is within 1 ulp of the f32-scaled path
    qp = _fold(q * jnp.asarray(scale, q.dtype), sq_p, d_p)
    kp = _fold(k, sk_p, d_p)
    vp = _fold(v, sk_p, d_p)

    grid = (B * H, sq_p // block_q)
    in_specs = [
        pl.BlockSpec((1, block_q, d_p), lambda bh, i: (bh, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, sk_p, d_p), lambda bh, i: (bh, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, sk_p, d_p), lambda bh, i: (bh, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    o_spec = pl.BlockSpec((1, block_q, d_p), lambda bh, i: (bh, i, 0),
                          memory_space=pltpu.VMEM)
    kern = functools.partial(_flash_kernel, kv_len=Sk,
                             block_k=block_k)
    if return_lse:
        out, lse = pl.pallas_call(
            kern,
            out_shape=[
                jax.ShapeDtypeStruct((B * H, sq_p, d_p), q.dtype),
                jax.ShapeDtypeStruct((B * H, sq_p, 1), jnp.float32),
            ],
            grid=grid,
            in_specs=in_specs,
            out_specs=[
                o_spec,
                pl.BlockSpec((1, block_q, 1), lambda bh, i: (bh, i, 0),
                             memory_space=pltpu.VMEM),
            ],
            interpret=interpret,
        )(qp, kp, vp)
        return _unfold(out, B, H, Sq, D), lse  # lse folded [B*H, sq_p, 1]
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B * H, sq_p, d_p), q.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=o_spec,
        interpret=interpret,
    )(qp, kp, vp)
    return _unfold(out, B, H, Sq, D)


def _flash_bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                         dq_ref, *, scale: float, kv_len: int,
                         block_k: int):
    """dq for one q block: loop over k/v blocks
    (FlashAttention-2 backward, dq pass).

    ``q`` arrives pre-scaled (q * scale, matching the forward), so the
    logits need no per-block multiply; dq w.r.t. the ORIGINAL q then
    picks up one final * scale."""
    bq, d = q_ref.shape[1], q_ref.shape[2]
    skp = k_ref.shape[1]
    nk = skp // block_k

    if nk == 1:
        # single-KV-block fast path (the flagship shapes), software-
        # pipelined like the forward: process the q block in row chunks
        # and issue chunk i+1's two MXU matmuls (logits, dp) before
        # chunk i's VPU softmax-recompute + dq matmul, so Mosaic can
        # overlap the units. KV padding is masked by a broadcast bias
        # add instead of an iota/compare/select.
        k = k_ref[0]
        v = v_ref[0]
        sub = max(1, bq // 256)
        while sub > 1 and (bq % sub or (bq // sub) % 8):
            sub -= 1
        c = bq // sub
        if skp != kv_len:
            col = jax.lax.broadcasted_iota(jnp.int32, (1, skp), 1)
            bias = jnp.where(col < kv_len, 0.0, _NEG_INF)
        else:
            bias = None

        def chunk_mm(i):
            qc = q_ref[0, pl.ds(i * c, c), :]
            dc = do_ref[0, pl.ds(i * c, c), :]
            logits = jax.lax.dot_general(
                qc, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)          # [c, SKp]
            dp = jax.lax.dot_general(
                dc, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)          # [c, SKp]
            return logits, dp

        cur = chunk_mm(0)
        for i in range(sub):
            nxt = chunk_mm(i + 1) if i + 1 < sub else None
            logits, dp = cur
            lg = logits if bias is None else logits + bias
            p = jnp.exp(lg - lse_ref[0, pl.ds(i * c, c), :])
            ds = (p * (dp - delta_ref[0, pl.ds(i * c, c), :])).astype(
                q_ref.dtype)
            acc = jax.lax.dot_general(
                ds, k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dq_ref[0, pl.ds(i * c, c), :] = (acc * scale).astype(
                dq_ref.dtype)
            cur = nxt
        return

    q = q_ref[0]                                    # [BQ, D] bf16
    do = do_ref[0]                                  # [BQ, D]
    lse = lse_ref[0]                                # [BQ, 1] f32
    delta = delta_ref[0]                            # [BQ, 1] f32

    def body(i, acc):
        k = k_ref[0, pl.ds(i * block_k, block_k), :]
        v = v_ref[0, pl.ds(i * block_k, block_k), :]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [BQ, BK]
        col = i * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (bq, block_k), 1)
        p = jnp.where(col < kv_len, jnp.exp(logits - lse), 0.0)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [BQ, BK]
        ds = (p * (dp - delta)).astype(q.dtype)
        return acc + jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    acc = jax.lax.fori_loop(0, nk, body, jnp.zeros((bq, d), jnp.float32))
    dq_ref[0] = (acc * scale).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                          dk_ref, dv_ref, *, q_len: int,
                          block_q: int):
    """dk/dv for one k/v block: loop over q blocks
    (FlashAttention-2 backward, dkv pass).

    ``q`` arrives pre-scaled (q * scale, matching the forward):
    dk = scale * (dsᵀ·q_orig) = dsᵀ·(q_orig * scale), so no final scale
    multiply is needed on dk either."""
    k = k_ref[0]                                    # [BK, D]
    v = v_ref[0]
    bk, d = k.shape
    sqp = q_ref.shape[1]
    nq = sqp // block_q

    if nq <= 16:
        # unrolled software-pipelined path (flagship: 2048/256 = 8
        # chunks): chunk i+1's logits/dp matmuls are issued before chunk
        # i's softmax-recompute (VPU) + dk/dv accumulation matmuls, so
        # the MXU never waits on the VPU. The q-row padding mask is a
        # broadcast [c,1] bias add (padded q/do rows are zero-filled, but
        # exp(0-lse=0)=1 would pollute dv, so the mask stays).
        def chunk_mm(i):
            qc = q_ref[0, pl.ds(i * block_q, block_q), :]
            dc = do_ref[0, pl.ds(i * block_q, block_q), :]
            logits = jax.lax.dot_general(
                qc, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)          # [c, BK]
            dp = jax.lax.dot_general(
                dc, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            return logits, dp

        dk_acc = jnp.zeros((bk, d), jnp.float32)
        dv_acc = jnp.zeros((bk, d), jnp.float32)
        cur = chunk_mm(0)
        for i in range(nq):
            nxt = chunk_mm(i + 1) if i + 1 < nq else None
            logits, dp = cur
            lse_c = lse_ref[0, pl.ds(i * block_q, block_q), :]
            if sqp != q_len:
                row = i * block_q + jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, 1), 0)
                lg = logits + jnp.where(row < q_len, 0.0, _NEG_INF)
            else:
                lg = logits
            p = jnp.exp(lg - lse_c)
            qc = q_ref[0, pl.ds(i * block_q, block_q), :]
            dc = do_ref[0, pl.ds(i * block_q, block_q), :]
            dv_acc = dv_acc + jax.lax.dot_general(
                p.astype(dc.dtype), dc, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # [BK, D]
            ds = (p * (dp - delta_ref[0, pl.ds(i * block_q, block_q), :])
                  ).astype(qc.dtype)
            dk_acc = dk_acc + jax.lax.dot_general(
                ds, qc, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            cur = nxt
        dk_ref[0] = dk_acc.astype(dk_ref.dtype)
        dv_ref[0] = dv_acc.astype(dv_ref.dtype)
        return

    def body(i, carry):
        dk_acc, dv_acc = carry
        q = q_ref[0, pl.ds(i * block_q, block_q), :]
        do = do_ref[0, pl.ds(i * block_q, block_q), :]
        lse = lse_ref[0, pl.ds(i * block_q, block_q), :]
        delta = delta_ref[0, pl.ds(i * block_q, block_q), :]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [BQ, BK]
        row = i * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, bk), 0)
        p = jnp.where(row < q_len, jnp.exp(logits - lse), 0.0)
        p_t = p.astype(q.dtype)
        dv_acc = dv_acc + jax.lax.dot_general(
            p_t, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # [BK, D]
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = (p * (dp - delta)).astype(q.dtype)
        dk_acc = dk_acc + jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dk_acc, dv_acc

    z = jnp.zeros((bk, d), jnp.float32)
    dk_acc, dv_acc = jax.lax.fori_loop(0, nq, body, (z, z))
    dk_ref[0] = dk_acc.astype(dk_ref.dtype)
    dv_ref[0] = dv_acc.astype(dv_ref.dtype)


def _flash_backward(q, k, v, out, lse, do, scale,
                    block_q=512, block_k=2048, dkv_block_q=256,
                    dkv_block_k=1024, interpret=None):
    # blocks tuned on v5e at flagship shapes: a single K/V block in the
    # dq pass ((512, 2048) measured 30.8/22.7 ms for the self/cross
    # fwd+bwd 28-layer stacks vs 32.9/25.8 ms at (512, 512)). The dkv
    # pass has its own, smaller blocks: its f32 intermediates are
    # [dkv_block_q, dkv_block_k] and its accumulator carries
    # 2x[dkv_block_k, d]f32 — at (512, 2048) the kernel's scoped VMEM
    # stack hits 16.45M (B=2) / 17.30M (B=8) against the 16M limit once
    # XLA stages operands in VMEM (observed in the donated train step);
    # (256, 1024) keeps the stack ~7M with no measurable slowdown (the
    # pass is MXU-bound).
    B, Sq, H, D = q.shape
    Sk = k.shape[1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    block_q, block_k, sq_p, sk_p, d_p = _fold_sizes(q, k, block_q, block_k)
    # The saved lse was folded with the FORWARD's block_q (1024), which
    # can differ from this pass's (512) for 512 < Sq < 1024: the
    # forward's sq_p would be ceil8(Sq) while ours would round up to
    # 1024, making the second lse/delta block read past the array. The
    # forward's padded length is authoritative — it is lse.shape[1].
    assert lse.shape[1] >= Sq and lse.shape[1] % 8 == 0, (
        f"lse length {lse.shape[1]} inconsistent with Sq={Sq}")
    sq_p = lse.shape[1]
    block_q = min(block_q, sq_p)
    if sq_p % block_q:
        block_q = sq_p  # single q block (shapes below flagship)
    dkv_block_q = min(dkv_block_q, sq_p)
    if sq_p % dkv_block_q:
        dkv_block_q = block_q  # _fold_sizes guarantees this divides sq_p
    dkv_block_k = min(dkv_block_k, sk_p)
    if sk_p % dkv_block_k:
        dkv_block_k = block_k  # _fold_sizes guarantees this divides sk_p

    qp = _fold(q * jnp.asarray(scale, q.dtype), sq_p, d_p)
    kp = _fold(k, sk_p, d_p)
    vp = _fold(v, sk_p, d_p)
    dop = _fold(do, sq_p, d_p)
    op = _fold(out, sq_p, d_p)
    # delta = rowsum(do * o) — padded dims are zero, so fold-then-sum is
    # exact; tiny elementwise op, leave it to XLA
    delta = jnp.sum(dop.astype(jnp.float32) * op.astype(jnp.float32),
                    axis=-1, keepdims=True)               # [BH, sq_p, 1]
    lse = lse.astype(jnp.float32)                         # [BH, sq_p, 1]

    BH = B * H
    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, scale=scale, kv_len=Sk,
                          block_k=block_k),
        out_shape=jax.ShapeDtypeStruct((BH, sq_p, d_p), q.dtype),
        grid=(BH, sq_p // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d_p), lambda bh, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_p, d_p), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_p, d_p), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d_p), lambda bh, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda bh, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda bh, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d_p), lambda bh, i: (bh, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qp, kp, vp, dop, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, q_len=Sq,
                          block_q=dkv_block_q),
        out_shape=[
            jax.ShapeDtypeStruct((BH, sk_p, d_p), k.dtype),
            jax.ShapeDtypeStruct((BH, sk_p, d_p), v.dtype),
        ],
        grid=(BH, sk_p // dkv_block_k),
        in_specs=[
            pl.BlockSpec((1, sq_p, d_p), lambda bh, j: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dkv_block_k, d_p), lambda bh, j: (bh, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dkv_block_k, d_p), lambda bh, j: (bh, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sq_p, d_p), lambda bh, j: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sq_p, 1), lambda bh, j: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sq_p, 1), lambda bh, j: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, dkv_block_k, d_p), lambda bh, j: (bh, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dkv_block_k, d_p), lambda bh, j: (bh, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        interpret=interpret,
    )(qp, kp, vp, dop, lse, delta)

    return (_unfold(dq, B, H, Sq, D), _unfold(dk, B, H, Sk, D),
            _unfold(dv, B, H, Sk, D))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(q, k, v, scale: float):
    """q [B,Sq,H,D], k/v [B,Sk,H,D] -> [B,Sq,H,D]."""
    return _flash_forward(q, k, v, scale)


def _fwd(q, k, v, scale):
    out, lse = _flash_forward(q, k, v, scale, return_lse=True)
    # named so remat policies can SAVE the kernel's outputs instead of
    # re-running the whole flash forward in the backward (models/dit.py
    # remat="dots" adds save_only_these_names on these)
    out = checkpoint_name(out, "flash_out")
    lse = checkpoint_name(lse, "flash_lse")
    return out, (q, k, v, out, lse)


def _bwd(scale, res, g):
    # fused FlashAttention-2 backward (dq + dkv Pallas passes); the
    # softmax is rebuilt from the forward's logsumexp, never materialized
    q, k, v, out, lse = res
    dq, dk, dv = _flash_backward(q, k, v, out, lse, g.astype(q.dtype),
                                 scale)
    return dq, dk, dv


flash_attention.defvjp(_fwd, _bwd)
