"""Fused FlashAttention-style TPU kernel (Pallas), transposed orientation.

Replaces xformers ``memory_efficient_attention`` on the DiT hot path
(reference models/attention.py:54,109). Online-softmax tiling: each
program owns one (batch, head, q-block) and streams K/V blocks through
VMEM, keeping running max/denominator — logits never materialize in HBM.
Tuned for the flagship shapes (self: 2048 x 2048, cross: 2048 x 1370,
head_dim 72).

Head-dim layout (measured, benchmarks/exp_dot_forms2.py): the MXU
rounds a matmul's CONTRACTION dim and output LANE dim up to 128, while
the sublane dim rounds to 8 only. head_dim 72 on the contraction (the
qk and dp matmuls) therefore pays the 128-lane tax in any layout — but
every matmul whose OUTPUT carries head_dim (pv, dq, dk, dv) avoids it
by computing the TRANSPOSED result with D=72 on sublanes (140-171 TF/s
vs 93-101 for the lane-padded forms). The kernels therefore work in a
transposed orientation throughout:

  * logits are built as ``logits^T = k . q^T``  ([Sk, Sq]), so the
    softmax state (m, l, lse, delta) is a natural ``[1, Sq]`` lane
    vector and rescales broadcast over sublanes for free;
  * v is fed pre-transposed ``[D, Sk]`` and the output leaves the
    kernel as ``out^T [D, Sq]``; same for dq/dk/dv in the backward.

head_dim also stays UNPADDED in HBM (8-aligned only): Mosaic pads the
lane dim to 128 internally at identical MXU cost (measured,
benchmarks/exp_flash_dpad.py — bit-identical numerics, and unpadded
72-lane contractions are ~17% faster than explicitly padded ones).

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

# Pipelining chunk targets are tuned INDEPENDENTLY per kernel: the
# forward sweep (benchmarks/exp_flash_sweep2.py) only measures the
# forward, so retuning it must not silently retune the backward dq
# kernel (whose pipelining/VMEM tradeoff differs at its block_q).
_FWD_CHUNK_TARGET = 512
_BWD_DQ_CHUNK_TARGET = 512


def _chunks(bq: int, target: int = 512) -> int:
    """Split a q block into `sub` chunks for software pipelining.

    Chunk starts index the kernel outputs on the LANE axis, so every
    chunk boundary must be 128-aligned (the chunk length must be a
    multiple of 128) unless there is a single chunk."""
    sub = max(1, bq // target)
    while sub > 1 and (bq % sub or (bq // sub) % 128):
        sub -= 1
    return sub


def _flash_kernel(q_ref, k_ref, vt_ref, o_ref, lse_ref=None, *,
                  kv_len: int, block_k: int):
    # refs: q [1, BQ, D], k [1, SKp, D], vt [1, D, SKp], o [1, D, BQ];
    # leading dim is the folded (batch*head) index. Matmul INPUTS stay
    # in the stored dtype (bf16) with f32 accumulation — casting them to
    # f32 first would run the MXU at the decomposed-f32 rate (~3-6x
    # slower); the softmax state (m, l, acc) is f32 as usual.
    #
    # VPU economy (measured ~5% of the layer stack): the softmax scale
    # is folded into q by the host wrapper (saves a [SK, BQ] multiply
    # per block), KV padding is masked by a broadcast [BK, 1] bias add
    # instead of a full-size iota/compare/select, and the single-KV-
    # block case (the flagship shapes) skips the running-max rescale
    # chain.
    bq = q_ref.shape[1]
    d = vt_ref.shape[1]
    skp = k_ref.shape[1]
    nk = skp // block_k
    padded = skp != kv_len

    if nk == 1:
        # single-KV-block fast path, software-pipelined: the q block is
        # processed in column chunks with chunk i+1's logits matmul
        # (MXU) issued before chunk i's softmax (VPU) + v^T.p, so
        # Mosaic can overlap the units
        sub = _chunks(bq, target=_FWD_CHUNK_TARGET)
        c = bq // sub
        k = k_ref[0]                                    # [SKp, D]
        vt = vt_ref[0]                                  # [D, SKp]
        if padded:
            row = jax.lax.broadcasted_iota(jnp.int32, (skp, 1), 0)
            bias = jnp.where(row < kv_len, 0.0, _NEG_INF)
        else:
            bias = None

        def chunk_logits(i):
            qc = q_ref[0, pl.ds(i * c, c), :]           # [c, D]
            lg = jax.lax.dot_general(
                k, qc, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)     # [SKp, c]
            return lg if bias is None else lg + bias

        lg = chunk_logits(0)
        for i in range(sub):
            lg_next = chunk_logits(i + 1) if i + 1 < sub else None
            m = jnp.max(lg, axis=0, keepdims=True)      # [1, c]
            p = jnp.exp(lg - m)                         # [SKp, c]
            l = jnp.sum(p, axis=0, keepdims=True)       # [1, c]
            acc = jax.lax.dot_general(
                vt, p.astype(vt.dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)     # [D, c]
            o_ref[0, :, pl.ds(i * c, c)] = (
                acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
            if lse_ref is not None:
                lse_ref[0, :, pl.ds(i * c, c)] = (
                    m + jnp.log(jnp.maximum(l, 1e-30)))
            lg = lg_next
        return

    def body(j, carry):
        acc, m, l = carry
        k = k_ref[0, pl.ds(j * block_k, block_k), :]    # [BK, D]
        lg = jax.lax.dot_general(
            k, q_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)         # [BK, BQ]
        if padded:
            row = j * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_k, 1), 0)
            lg = lg + jnp.where(row < kv_len, 0.0, _NEG_INF)
        vt = vt_ref[0, :, pl.ds(j * block_k, block_k)]  # [D, BK]
        m_new = jnp.maximum(m, jnp.max(lg, axis=0, keepdims=True))
        p = jnp.exp(lg - m_new)                         # [BK, BQ] f32
        alpha = jnp.exp(m - m_new)                      # [1, BQ]
        l_new = l * alpha + jnp.sum(p, axis=0, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            vt, p.astype(vt.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)         # [D, BQ]
        return acc_new, m_new, l_new

    acc0 = jnp.zeros((d, bq), jnp.float32)
    m0 = jnp.full((1, bq), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((1, bq), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, nk, body, (acc0, m0, l0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
    if lse_ref is not None:
        # logsumexp of the scaled logits — the backward kernels rebuild
        # p = exp(logits - lse) from it without rerunning the softmax
        # chain. Only emitted under jax.grad — the inference forward
        # skips the extra output (measured ~1% of the step).
        lse_ref[0] = m + jnp.log(jnp.maximum(l, 1e-30))


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
    # of 8 (or the full array dim). block_k only needs 8-alignment when
    # there is a single KV block, NOT a power of two: the flagship
    # cross-attn KV (1370 tokens) pads to 1376 instead of 2048 — 33%
    # less MXU work. With MULTIPLE KV blocks the kernels lane-slice the
    # transposed operands at block_k offsets, so block_k must then be
    # 128-aligned (the defaults are).
    block_q = min(block_q, -(-Sq // 8) * 8)
    block_k = min(block_k, -(-Sk // 8) * 8)
    sq_p = -(-Sq // block_q) * block_q
    sk_p = -(-Sk // block_k) * block_k
    if sk_p > block_k and block_k % 128:
        block_k = sk_p  # single block; preserves lane alignment
    # head_dim stays UNPADDED in HBM (8-aligned only): Mosaic pads the
    # lane dim to 128 internally at identical MXU cost (measured,
    # benchmarks/exp_flash_dpad.py)
    d_p = -(-D // 8) * 8
    return block_q, block_k, sq_p, sk_p, d_p


def _fold(x, s_p, d_p):
    # fold (batch, head) into one leading dim: TPU block shapes constrain
    # only the LAST TWO dims, so refs become [1, seq, d]
    B, S, H, D = x.shape
    x = _pad_to(_pad_to(x, s_p, 1), d_p, 3)
    return x.transpose(0, 2, 1, 3).reshape(B * H, s_p, d_p)


def _fold_t(x, s_p, d_p):
    # transposed fold: [B, S, H, D] -> [B*H, d, seq] (D on sublanes)
    B, S, H, D = x.shape
    x = _pad_to(_pad_to(x, s_p, 1), d_p, 3)
    return x.transpose(0, 2, 3, 1).reshape(B * H, d_p, s_p)


def _unfold_t(x, B, H, Sq, D):
    # [B*H, d, s] -> [B, Sq, H, D]
    return x.reshape(B, H, x.shape[1], x.shape[2]).transpose(0, 3, 1, 2)[
        :, :Sq, :, :D]


def _flash_forward(q, k, v, scale, block_q=2048, block_k=2048,
                   interpret=None, return_lse=False):
    # defaults tuned on v5e at flagship shapes (2x2048x16x72,
    # benchmarks/exp_flash_sweep2.py): a single K/V block (no inner
    # loop) and a single 2048-row q block processed in 512-column
    # pipelined chunks — per-chunk f32 logits are [SKp, 512] (4 MB), so
    # the full-q block fits scoped VMEM easily; measured ~2x faster
    # than (block_q=1024, chunk=256) in the serving chain.
    # VMEM headroom budget at these defaults: lg + lg_next + p are
    # ~3x [2048, 512] f32 = 12 MB live, plus double-buffered bf16
    # operands — close to the 16 MB scoped limit. A chunk-target or
    # head-dim bump must re-check this (drop block_q to 1024 if the
    # estimated footprint 3*4*SKp*chunk + 2*2*(SKp*d_p + d_p*bq)
    # approaches 16 MB).
    B, Sq, H, D = q.shape
    Sk = k.shape[1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    block_q, block_k, sq_p, sk_p, d_p = _fold_sizes(q, k, block_q, block_k)

    # fold the softmax scale into q once ([B,S,H,D] elementwise) instead
    # of scaling the [SK, BQ] logits every block inside the kernel; the
    # bf16 re-rounding of q*scale is within 1 ulp of the f32-scaled path
    qp = _fold(q * jnp.asarray(scale, q.dtype), sq_p, d_p)
    kp = _fold(k, sk_p, d_p)
    vtp = _fold_t(v, sk_p, d_p)

    grid = (B * H, sq_p // block_q)
    in_specs = [
        pl.BlockSpec((1, block_q, d_p), lambda bh, i: (bh, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, sk_p, d_p), lambda bh, i: (bh, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d_p, sk_p), lambda bh, i: (bh, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    o_spec = pl.BlockSpec((1, d_p, block_q), lambda bh, i: (bh, 0, i),
                          memory_space=pltpu.VMEM)
    kern = functools.partial(_flash_kernel, kv_len=Sk, block_k=block_k)
    if return_lse:
        out, lse = pl.pallas_call(
            kern,
            out_shape=[
                jax.ShapeDtypeStruct((B * H, d_p, sq_p), q.dtype),
                jax.ShapeDtypeStruct((B * H, 1, sq_p), jnp.float32),
            ],
            grid=grid,
            in_specs=in_specs,
            out_specs=[
                o_spec,
                pl.BlockSpec((1, 1, block_q), lambda bh, i: (bh, 0, i),
                             memory_space=pltpu.VMEM),
            ],
            interpret=interpret,
        )(qp, kp, vtp)
        return _unfold_t(out, B, H, Sq, D), lse  # lse folded [B*H,1,sq_p]
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B * H, d_p, sq_p), q.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=o_spec,
        interpret=interpret,
    )(qp, kp, vtp)
    return _unfold_t(out, B, H, Sq, D)


def _flash_bwd_dq_kernel(q_ref, k_ref, kt_ref, v_ref, do_ref, lse_ref,
                         delta_ref, dq_ref, *, scale: float, kv_len: int,
                         block_k: int):
    """dq for one q block: loop over k/v blocks
    (FlashAttention-2 backward, dq pass).

    ``q`` arrives pre-scaled (q * scale, matching the forward), so the
    logits need no per-block multiply; dq w.r.t. the ORIGINAL q then
    picks up one final * scale. All products are built transposed:
    logits^T/dp^T are [SK, c] with the q index on lanes, and dq leaves
    as dq^T [D, BQ] (D on sublanes — no 128-lane padding tax)."""
    bq = q_ref.shape[1]
    skp = k_ref.shape[1]
    nk = skp // block_k

    if nk == 1:
        # single-KV-block fast path (the flagship shapes), software-
        # pipelined like the forward: process the q block in column
        # chunks and issue chunk i+1's two MXU matmuls (logits^T, dp^T)
        # before chunk i's softmax-recompute (VPU) + dq^T matmul, so
        # Mosaic can overlap the units.
        k = k_ref[0]                                    # [SKp, D]
        kt = kt_ref[0]                                  # [D, SKp]
        v = v_ref[0]                                    # [SKp, D]
        sub = _chunks(bq, target=_BWD_DQ_CHUNK_TARGET)
        c = bq // sub
        if skp != kv_len:
            row = jax.lax.broadcasted_iota(jnp.int32, (skp, 1), 0)
            bias = jnp.where(row < kv_len, 0.0, _NEG_INF)
        else:
            bias = None

        def chunk_mm(i):
            qc = q_ref[0, pl.ds(i * c, c), :]           # [c, D]
            dc = do_ref[0, pl.ds(i * c, c), :]          # [c, D]
            lg = jax.lax.dot_general(
                k, qc, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)     # [SKp, c]
            dp = jax.lax.dot_general(
                v, dc, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)     # [SKp, c]
            return lg, dp

        cur = chunk_mm(0)
        for i in range(sub):
            nxt = chunk_mm(i + 1) if i + 1 < sub else None
            lg, dp = cur
            if bias is not None:
                lg = lg + bias
            p = jnp.exp(lg - lse_ref[0, :, pl.ds(i * c, c)])
            ds = (p * (dp - delta_ref[0, :, pl.ds(i * c, c)])).astype(
                kt.dtype)                               # [SKp, c]
            acc = jax.lax.dot_general(
                kt, ds, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)     # [D, c]
            dq_ref[0, :, pl.ds(i * c, c)] = (acc * scale).astype(
                dq_ref.dtype)
            cur = nxt
        return

    q = q_ref[0]                                        # [BQ, D] bf16
    do = do_ref[0]                                      # [BQ, D]
    lse = lse_ref[0]                                    # [1, BQ] f32
    delta = delta_ref[0]                                # [1, BQ] f32
    d = kt_ref.shape[1]

    def body(j, acc):
        k = k_ref[0, pl.ds(j * block_k, block_k), :]    # [BK, D]
        v = v_ref[0, pl.ds(j * block_k, block_k), :]
        kt = kt_ref[0, :, pl.ds(j * block_k, block_k)]  # [D, BK]
        lg = jax.lax.dot_general(
            k, q, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)         # [BK, BQ]
        row = j * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_k, 1), 0)
        p = jnp.where(row < kv_len, jnp.exp(lg - lse), 0.0)
        dp = jax.lax.dot_general(
            v, do, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)         # [BK, BQ]
        ds = (p * (dp - delta)).astype(q.dtype)
        return acc + jax.lax.dot_general(
            kt, ds, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)         # [D, BQ]
    acc = jax.lax.fori_loop(0, nk, body, jnp.zeros((d, bq), jnp.float32))
    dq_ref[0] = (acc * scale).astype(dq_ref.dtype)


def _flash_bwd_fused_kernel(q_ref, qt_ref, k_ref, kt_ref, v_ref, do_ref,
                            dot_ref, ot_ref, lse_ref,
                            dq_ref, dk_ref, dv_ref, *,
                            scale: float, q_len: int, kv_len: int,
                            block_q: int):
    """Single-pass backward: dq + dk + dv in ONE kernel (one program per
    (batch, head), single KV block resident in VMEM).

    The two-pass FlashAttention-2 form computes the logits and dp
    matmuls TWICE (once in the dq pass, once in the dkv pass) — and at
    head_dim 72 those are exactly the matmuls that pay the 128-lane MXU
    contraction tax (see module docstring). When the whole KV block fits
    VMEM (the flagship shapes: self 2048, cross 1376), a single sweep
    over q chunks computes lg/dp once and feeds all three gradients:
    5 matmuls instead of 7, with the two eliminated ones the taxed kind
    (~35% of backward MXU work), plus one HBM read of q/k/v/do instead
    of two. Chunks are software-pipelined like the two-pass kernels:
    chunk i+1's lg/dp (MXU) issue before chunk i's softmax recompute
    (VPU) + the three gradient matmuls.

    delta = rowsum(do * o) is computed per chunk from the transposed
    do/o operands (a [D, c] multiply + sublane sum on the VPU) instead
    of a separate XLA pass over the full [B, Sq, H, D] arrays — with
    ~224 flash backwards per train step the host-side delta pass and
    its extra fold were ~1% of the step."""
    k = k_ref[0]                                        # [SKp, D]
    kt = kt_ref[0]                                      # [D, SKp]
    v = v_ref[0]
    skp = k.shape[0]
    d = qt_ref.shape[1]
    sqp = q_ref.shape[1]
    nq = sqp // block_q
    if skp != kv_len:
        row = jax.lax.broadcasted_iota(jnp.int32, (skp, 1), 0)
        kbias = jnp.where(row < kv_len, 0.0, _NEG_INF)
    else:
        kbias = None

    def chunk_mm(i):
        qc = q_ref[0, pl.ds(i * block_q, block_q), :]   # [c, D]
        dc = do_ref[0, pl.ds(i * block_q, block_q), :]
        lg = jax.lax.dot_general(
            k, qc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)         # [SKp, c]
        dp = jax.lax.dot_general(
            v, dc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)         # [SKp, c]
        return lg, dp

    def step(i, cur, dk_acc, dv_acc):
        lg, dp = cur
        if kbias is not None:
            # padded KV rows: p -> 0 so they pollute neither dv nor (via
            # ds) dk/dq; padded dk/dv columns are sliced off at unfold
            lg = lg + kbias
        lse_c = lse_ref[0, :, pl.ds(i * block_q, block_q)]   # [1, c]
        if sqp != q_len:
            # padded q/do columns are zero-filled, but exp(0 - lse=0)=1
            # would pollute dv, so they are masked to exp(-inf)
            col = i * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (1, block_q), 1)
            lg = lg + jnp.where(col < q_len, 0.0, _NEG_INF)
        p = jnp.exp(lg - lse_c)                         # [SKp, c]
        dot_c = dot_ref[0, :, pl.ds(i * block_q, block_q)]   # [D, c]
        ot_c = ot_ref[0, :, pl.ds(i * block_q, block_q)]     # [D, c]
        qt_c = qt_ref[0, :, pl.ds(i * block_q, block_q)]     # [D, c]
        delta_c = jnp.sum(
            dot_c.astype(jnp.float32) * ot_c.astype(jnp.float32),
            axis=0, keepdims=True)                      # [1, c]
        dv_acc = dv_acc + jax.lax.dot_general(
            dot_c, p.astype(dot_c.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)         # [D, SKp]
        ds = (p * (dp - delta_c)).astype(qt_c.dtype)    # [SKp, c]
        dk_acc = dk_acc + jax.lax.dot_general(
            qt_c, ds, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)         # [D, SKp]
        dq_c = jax.lax.dot_general(
            kt, ds, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)         # [D, c]
        dq_ref[0, :, pl.ds(i * block_q, block_q)] = (
            dq_c * scale).astype(dq_ref.dtype)
        return dk_acc, dv_acc

    dk_acc = jnp.zeros((d, skp), jnp.float32)
    dv_acc = jnp.zeros((d, skp), jnp.float32)
    if nq <= 16:
        cur = chunk_mm(0)
        for i in range(nq):
            nxt = chunk_mm(i + 1) if i + 1 < nq else None
            dk_acc, dv_acc = step(i, cur, dk_acc, dv_acc)
            cur = nxt
    else:
        def body(i, carry):
            dk_acc, dv_acc = carry
            return step(i, chunk_mm(i), dk_acc, dv_acc)
        dk_acc, dv_acc = jax.lax.fori_loop(0, nq, body, (dk_acc, dv_acc))
    dk_ref[0] = dk_acc.astype(dk_ref.dtype)
    dv_ref[0] = dv_acc.astype(dv_ref.dtype)


def _flash_bwd_dkv_kernel(q_ref, qt_ref, k_ref, v_ref, do_ref, dot_ref,
                          lse_ref, delta_ref, dk_ref, dv_ref, *,
                          q_len: int, block_q: int):
    """dk/dv for one k/v block: loop over q blocks
    (FlashAttention-2 backward, dkv pass).

    ``q`` arrives pre-scaled (q * scale, matching the forward):
    dk = scale * (ds^T.q_orig) = ds^T.(q_orig * scale), so no final
    scale multiply is needed on dk either. dk/dv leave transposed
    [D, BK] (D on sublanes); the q/do operands are fed in BOTH layouts
    (lane-D for the logits/dp contractions, sublane-D for the dk/dv
    products) — the extra HBM traffic is ~72*Sq*2B per program, far
    below the MXU time it saves."""
    k = k_ref[0]                                        # [BK, D]
    v = v_ref[0]
    bk = k.shape[0]
    d = qt_ref.shape[1]
    sqp = q_ref.shape[1]
    nq = sqp // block_q

    def chunk_mm(i):
        qc = q_ref[0, pl.ds(i * block_q, block_q), :]   # [c, D]
        dc = do_ref[0, pl.ds(i * block_q, block_q), :]
        lg = jax.lax.dot_general(
            k, qc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)         # [BK, c]
        dp = jax.lax.dot_general(
            v, dc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)         # [BK, c]
        return lg, dp

    def step(i, cur, dk_acc, dv_acc):
        lg, dp = cur
        lse_c = lse_ref[0, :, pl.ds(i * block_q, block_q)]   # [1, c]
        if sqp != q_len:
            # padded q/do columns are zero-filled, but exp(0 - lse=0)=1
            # would pollute dv, so they are masked to exp(-inf)
            col = i * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (1, block_q), 1)
            lg = lg + jnp.where(col < q_len, 0.0, _NEG_INF)
        p = jnp.exp(lg - lse_c)                         # [BK, c]
        dot_c = dot_ref[0, :, pl.ds(i * block_q, block_q)]   # [D, c]
        qt_c = qt_ref[0, :, pl.ds(i * block_q, block_q)]     # [D, c]
        dv_acc = dv_acc + jax.lax.dot_general(
            dot_c, p.astype(dot_c.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)         # [D, BK]
        ds = (p * (dp - delta_ref[0, :, pl.ds(i * block_q, block_q)])
              ).astype(qt_c.dtype)                      # [BK, c]
        dk_acc = dk_acc + jax.lax.dot_general(
            qt_c, ds, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)         # [D, BK]
        return dk_acc, dv_acc

    if nq <= 16:
        # unrolled software-pipelined path (flagship: 2048/256 = 8
        # chunks): chunk i+1's logits/dp matmuls are issued before chunk
        # i's softmax-recompute (VPU) + dk/dv accumulation matmuls, so
        # the MXU never waits on the VPU.
        dk_acc = jnp.zeros((d, bk), jnp.float32)
        dv_acc = jnp.zeros((d, bk), jnp.float32)
        cur = chunk_mm(0)
        for i in range(nq):
            nxt = chunk_mm(i + 1) if i + 1 < nq else None
            dk_acc, dv_acc = step(i, cur, dk_acc, dv_acc)
            cur = nxt
        dk_ref[0] = dk_acc.astype(dk_ref.dtype)
        dv_ref[0] = dv_acc.astype(dv_ref.dtype)
        return

    def body(i, carry):
        dk_acc, dv_acc = carry
        return step(i, chunk_mm(i), dk_acc, dv_acc)

    z = jnp.zeros((d, bk), jnp.float32)
    dk_acc, dv_acc = jax.lax.fori_loop(0, nq, body, (z, z))
    dk_ref[0] = dk_acc.astype(dk_ref.dtype)
    dv_ref[0] = dv_acc.astype(dv_ref.dtype)


def _select_fused_chunk(sq_p, sk_p, block_k, d_p, dkv_q_seed):
    """lg/dp chunk for the single-pass fused backward, or None to take
    the two-pass kernels. Invariants (unit-tested in
    tests/test_attention.py::test_fused_chunk_selection_invariants):
    a returned chunk always divides sq_p, is 128-aligned OR equal to an
    sq_p <= 128 (the fused kernel lane-slices transposed [d, sq_p]
    operands at i*chunk offsets, which must be 128-aligned on TPU), and
    fits the scoped-VMEM budget (two pipelined [sk_p, chunk] f32 lg/dp
    pairs + p/ds transients ~= 5.5 * 4 * sk_p * chunk bytes)."""
    if sk_p != block_k or sk_p > 2048 or 12 * sq_p * d_p > 6_000_000:
        return None  # multi-KV-block or q-side operands exceed VMEM
    chunk = min(dkv_q_seed, sq_p)
    while chunk > 128 and 5.5 * 4 * sk_p * chunk > 11_000_000:
        chunk //= 2
    if sq_p % chunk == 0 and chunk % 128 == 0 \
            and 5.5 * 4 * sk_p * chunk <= 11_000_000:
        return chunk
    # ladder landed on a non-divisor / non-multiple: largest 128-aligned
    # divisor of sq_p under the seed that fits the budget
    start = (min(chunk, sq_p) // 128) * 128
    chunk = next((c for c in range(start, 127, -128)
                  if sq_p % c == 0 and 5.5 * 4 * sk_p * c <= 11_000_000),
                 None)
    if chunk is None and sq_p <= 128 \
            and 5.5 * 4 * sk_p * sq_p <= 11_000_000:
        chunk = sq_p  # sub-lane seq: single chunk, no offset slicing
    return chunk


def _flash_backward(q, k, v, out, lse, do, scale,
                    block_q=512, block_k=2048, dkv_block_q=256,
                    dkv_block_k=1024, interpret=None):
    # blocks tuned on v5e at flagship shapes: a single K/V block in the
    # dq pass. The dkv pass has its own, smaller blocks: its f32
    # intermediates are [dkv_block_k, dkv_block_q] and its accumulator
    # carries 2x[d, dkv_block_k]f32 — at (512, 2048) the kernel's scoped
    # VMEM stack exceeded the 16M limit once XLA staged operands in VMEM
    # (observed in the donated train step); (256, 1024) keeps the stack
    # small with no measurable slowdown (the pass is MXU-bound).
    B, Sq, H, D = q.shape
    Sk = k.shape[1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    block_q, block_k, sq_p, sk_p, d_p = _fold_sizes(q, k, block_q, block_k)
    # The saved lse was folded with the FORWARD's block_q (default
    # 2048), which can differ from this pass's for Sq below it: the
    # forward's padded length is authoritative — it is lse.shape[2].
    assert lse.shape[2] >= Sq and lse.shape[2] % 8 == 0, (
        f"lse length {lse.shape[2]} inconsistent with Sq={Sq}")
    sq_p = lse.shape[2]
    block_q = min(block_q, sq_p)
    if sq_p % block_q:
        block_q = sq_p  # single q block (shapes below flagship)
    # seed for the fused-path chunk ladder below: the CALLER's dkv
    # block (capped at sq_p), captured before the two-pass mutation —
    # seeding from the mutated value (sq_p when 256 doesn't divide it)
    # made the ladder land on non-128-multiples like 240 at sq_p=1920
    dkv_q_seed = min(dkv_block_q, sq_p)
    dkv_block_q = min(dkv_block_q, sq_p)
    if sq_p % dkv_block_q or (dkv_block_q % 128 and dkv_block_q != sq_p):
        dkv_block_q = sq_p  # single chunk; preserves lane alignment
    dkv_block_k = min(dkv_block_k, sk_p)
    if sk_p % dkv_block_k:
        dkv_block_k = block_k  # _fold_sizes guarantees this divides sk_p

    qs = q * jnp.asarray(scale, q.dtype)
    qp = _fold(qs, sq_p, d_p)
    qtp = _fold_t(qs, sq_p, d_p)
    kp = _fold(k, sk_p, d_p)
    ktp = _fold_t(k, sk_p, d_p)
    vp = _fold(v, sk_p, d_p)
    dop = _fold(do, sq_p, d_p)
    dotp = _fold_t(do, sq_p, d_p)
    lse = lse.astype(jnp.float32)                       # [BH, 1, sq_p]

    BH = B * H
    # fused-path eligibility (ADVICE r3 #1/#2): beyond the whole-KV
    # requirement, (a) the q-side operands (q, qt, do, dot, ot + the dq
    # output, ~12 bytes/element) live whole per program, so long-query
    # shapes must take the two-pass kernels (which block q at
    # dq_block_q); (b) the lg/dp chunk must divide sq_p AND fit the
    # scoped-VMEM budget — when the power-of-two ladder lands on a
    # non-divisor, fall back to the largest 128-multiple divisor that
    # fits instead of chunk=sq_p (sq_p=1920/sk_p=2048 would otherwise
    # put a ~31 MB pipelined pair in VMEM).
    fused_chunk = _select_fused_chunk(sq_p, sk_p, block_k, d_p, dkv_q_seed)
    if fused_chunk is not None:
        # single-pass fused backward (one program per batch*head, the
        # whole KV block in VMEM): computes lg/dp once for dq AND dk/dv.
        # VMEM at the ceiling shapes (sk_p=sq_p=2048, chunk 256): two
        # pipelined [2048, 256] f32 lg/dp pairs (8 MB) + 2x[d, 2048] f32
        # accumulators (1.2 MB) + bf16 operands (~2 MB) — inside the
        # 16 MB scoped budget; larger KV falls back to the two-pass form
        # (whose dq pass accumulates across KV blocks in f32).
        # chunk size picked against a scoped-VMEM budget: the pipelined
        # kernel holds two (lg, dp) f32 pairs of [sk_p, chunk] plus p/ds
        # transients (~5.5 * 4 * sk_p * chunk bytes with rounding slop) on
        # top of ~4.5 MB of operands/accumulators/DMA buffers; chunk 256
        # at sk_p 2048 measured 16.43 MB against the 16 MB limit, so the
        # budget drops it to 128 there while cross-attn (sk_p 1376)
        # keeps 256 (selection above, shared with the eligibility gate)
        chunk = fused_chunk
        otp = _fold_t(out, sq_p, d_p)   # delta is computed in-kernel
        dqt, dkt, dvt = pl.pallas_call(
            functools.partial(_flash_bwd_fused_kernel, scale=scale,
                              q_len=Sq, kv_len=Sk, block_q=chunk),
            out_shape=[
                jax.ShapeDtypeStruct((BH, d_p, sq_p), q.dtype),
                jax.ShapeDtypeStruct((BH, d_p, sk_p), k.dtype),
                jax.ShapeDtypeStruct((BH, d_p, sk_p), v.dtype),
            ],
            grid=(BH,),
            in_specs=[
                pl.BlockSpec((1, sq_p, d_p), lambda bh: (bh, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d_p, sq_p), lambda bh: (bh, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, sk_p, d_p), lambda bh: (bh, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d_p, sk_p), lambda bh: (bh, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, sk_p, d_p), lambda bh: (bh, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, sq_p, d_p), lambda bh: (bh, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d_p, sq_p), lambda bh: (bh, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d_p, sq_p), lambda bh: (bh, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, sq_p), lambda bh: (bh, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, d_p, sq_p), lambda bh: (bh, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d_p, sk_p), lambda bh: (bh, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d_p, sk_p), lambda bh: (bh, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            interpret=interpret,
        )(qp, qtp, kp, ktp, vp, dop, dotp, otp, lse)
        return (_unfold_t(dqt, B, H, Sq, D), _unfold_t(dkt, B, H, Sk, D),
                _unfold_t(dvt, B, H, Sk, D))

    # delta = rowsum(do * o), stored as a [1, sq] lane vector like lse —
    # padded dims are zero, so fold-then-sum is exact; tiny elementwise
    # op, left to XLA (two-pass only: the fused kernel computes it
    # per chunk from the transposed operands)
    op = _fold(out, sq_p, d_p)
    delta = jnp.sum(dop.astype(jnp.float32) * op.astype(jnp.float32),
                    axis=-1)[:, None, :]                # [BH, 1, sq_p]

    dqt = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, scale=scale, kv_len=Sk,
                          block_k=block_k),
        out_shape=jax.ShapeDtypeStruct((BH, d_p, sq_p), q.dtype),
        grid=(BH, sq_p // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d_p), lambda bh, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_p, d_p), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_p, sk_p), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_p, d_p), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d_p), lambda bh, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), lambda bh, i: (bh, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), lambda bh, i: (bh, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, d_p, block_q), lambda bh, i: (bh, 0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qp, kp, ktp, vp, dop, lse, delta)

    dkt, dvt = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, q_len=Sq,
                          block_q=dkv_block_q),
        out_shape=[
            jax.ShapeDtypeStruct((BH, d_p, sk_p), k.dtype),
            jax.ShapeDtypeStruct((BH, d_p, sk_p), v.dtype),
        ],
        grid=(BH, sk_p // dkv_block_k),
        in_specs=[
            pl.BlockSpec((1, sq_p, d_p), lambda bh, j: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_p, sq_p), lambda bh, j: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dkv_block_k, d_p), lambda bh, j: (bh, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dkv_block_k, d_p), lambda bh, j: (bh, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sq_p, d_p), lambda bh, j: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_p, sq_p), lambda bh, j: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sq_p), lambda bh, j: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sq_p), lambda bh, j: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, d_p, dkv_block_k), lambda bh, j: (bh, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_p, dkv_block_k), lambda bh, j: (bh, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        interpret=interpret,
    )(qp, qtp, kp, vp, dop, dotp, lse, delta)

    return (_unfold_t(dqt, B, H, Sq, D), _unfold_t(dkt, B, H, Sk, D),
            _unfold_t(dvt, B, H, Sk, D))


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
