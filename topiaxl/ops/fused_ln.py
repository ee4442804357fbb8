"""Fused LayerNorm + adaLN modulation (Pallas TPU kernel).

The DiT runs LayerNorm(affine-free, f32 stats) -> modulate
(x*(1+scale)+shift) before every sublayer — 3x per block, 84x per
flagship forward (reference models/dit_crossattn.py:51-58 +
models/utils.py:19-20). Left to XLA these are several HBM round-trips
over the [B, N, D] stream (measured 6.3 ms of a 52 ms step); fused in
one kernel the stream is read once and written once (~2 ms at v5e HBM
bandwidth).

Numerics: stats AND the modulation arithmetic are f32 on every backend;
the output is cast once to the requested dtype (the bf16 residual
stream). The off-TPU fallback performs the identical f32 chain in plain
jnp (keeping CPU tests exact and fast — interpret-mode Pallas is slow),
so kernel and fallback agree to the final rounding. The backward is the
analytic LN+modulate VJP in plain XLA (the elementwise chain fuses fine
there; only the forward is on the 84x hot path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln_mod_kernel(x_ref, sh_ref, sc_ref, o_ref, *, eps: float):
    x = x_ref[0].astype(jnp.float32)                 # [bn, D]
    mu = jnp.mean(x, axis=1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    sc = sc_ref[0].astype(jnp.float32)               # [1, D]
    sh = sh_ref[0].astype(jnp.float32)
    o_ref[0] = (y * (1.0 + sc) + sh).astype(o_ref.dtype)


def _ln(x, eps):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(axis=-1, keepdims=True)
    var = x32.var(axis=-1, keepdims=True)
    return (x32 - mu) * jax.lax.rsqrt(var + eps)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _ln_modulate(x, shift, scale, eps, out_dtype, block_n, interpret):
    B, N, D = x.shape
    on_tpu = jax.default_backend() == "tpu"
    if not ((on_tpu or interpret) and D % 128 == 0 and N % 8 == 0):
        # same chain as the kernel: LN stats and modulate both in f32,
        # one cast at the end
        y = _ln(x, eps)
        s = scale.astype(jnp.float32)[:, None, :]
        sh = shift.astype(jnp.float32)[:, None, :]
        return (y * (1.0 + s) + sh).astype(out_dtype)

    bn = min(block_n, N)
    while N % bn:
        bn //= 2
    kern = functools.partial(_ln_mod_kernel, eps=eps)
    # shift/scale get a singleton token dim so their block's trailing two
    # dims are (1, D) with 1 == the array dim (TPU block-shape rule)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, N, D), out_dtype),
        grid=(B, N // bn),
        in_specs=[
            pl.BlockSpec((1, bn, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bn, D), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, shift[:, None, :], scale[:, None, :])


def _fwd(x, shift, scale, eps, out_dtype, block_n, interpret):
    return _ln_modulate(x, shift, scale, eps, out_dtype, block_n,
                        interpret), (x, shift, scale)


def _bwd(eps, out_dtype, block_n, interpret, res, g):
    x, shift, scale = res
    y = _ln(x, eps)                                   # [B, N, D] f32
    g32 = g.astype(jnp.float32)
    d_shift = g32.sum(axis=1).astype(shift.dtype)
    d_scale = (g32 * y).sum(axis=1).astype(scale.dtype)
    dy = g32 * (1.0 + scale.astype(jnp.float32))[:, None, :]
    # affine-free LN backward: dx = inv * (dy - mean(dy) - y*mean(dy*y))
    x32 = x.astype(jnp.float32)
    var = x32.var(axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    dx = inv * (dy - dy.mean(axis=-1, keepdims=True)
                - y * (dy * y).mean(axis=-1, keepdims=True))
    return dx.astype(x.dtype), d_shift, d_scale


_ln_modulate.defvjp(_fwd, _bwd)


def _ln_mod_res_kernel(x_ref, d_ref, g_ref, sh_ref, sc_ref, xo_ref, o_ref,
                       *, eps: float):
    x = x_ref[0].astype(jnp.float32)                 # [bn, D]
    delta = d_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)                 # [1, D]
    xn = x + g * delta
    xo_ref[0] = xn.astype(xo_ref.dtype)
    mu = jnp.mean(xn, axis=1, keepdims=True)
    xc = xn - mu
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    sc = sc_ref[0].astype(jnp.float32)
    sh = sh_ref[0].astype(jnp.float32)
    o_ref[0] = (y * (1.0 + sc) + sh).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _ln_modulate_res(x, delta, gate, shift, scale, eps, out_dtype, block_n,
                     interpret):
    B, N, D = x.shape
    on_tpu = jax.default_backend() == "tpu"
    if not ((on_tpu or interpret) and D % 128 == 0 and N % 8 == 0):
        xn32 = x.astype(jnp.float32) + (gate.astype(jnp.float32)[:, None, :]
                                        * delta.astype(jnp.float32))
        y = _ln(xn32, eps)
        s = scale.astype(jnp.float32)[:, None, :]
        sh = shift.astype(jnp.float32)[:, None, :]
        return (xn32.astype(x.dtype),
                (y * (1.0 + s) + sh).astype(out_dtype))

    bn = min(block_n, N)
    while N % bn:
        bn //= 2
    kern = functools.partial(_ln_mod_res_kernel, eps=eps)
    row = pl.BlockSpec((1, 1, D), lambda b, i: (b, 0, 0),
                       memory_space=pltpu.VMEM)
    blk = pl.BlockSpec((1, bn, D), lambda b, i: (b, i, 0),
                       memory_space=pltpu.VMEM)
    xn, h = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((B, N, D), x.dtype),
                   jax.ShapeDtypeStruct((B, N, D), out_dtype)],
        grid=(B, N // bn),
        in_specs=[blk, blk, row, row, row],
        out_specs=[blk, blk],
        interpret=interpret,
    )(x, delta, gate[:, None, :], shift[:, None, :], scale[:, None, :])
    return xn, h


def _res_fwd(x, delta, gate, shift, scale, eps, out_dtype, block_n,
             interpret):
    out = _ln_modulate_res(x, delta, gate, shift, scale, eps, out_dtype,
                           block_n, interpret)
    return out, (x, delta, gate, shift, scale)


def _res_bwd(eps, out_dtype, block_n, interpret, res, gs):
    x, delta, gate, shift, scale = res
    g_xn, g_h = gs
    xn = x.astype(jnp.float32) + (gate.astype(jnp.float32)[:, None, :]
                                  * delta.astype(jnp.float32))
    y = _ln(xn, eps)
    gh32 = g_h.astype(jnp.float32)
    d_shift = gh32.sum(axis=1).astype(shift.dtype)
    d_scale = (gh32 * y).sum(axis=1).astype(scale.dtype)
    dy = gh32 * (1.0 + scale.astype(jnp.float32))[:, None, :]
    var = xn.var(axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    dxn = inv * (dy - dy.mean(axis=-1, keepdims=True)
                 - y * (dy * y).mean(axis=-1, keepdims=True))
    dxn = dxn + g_xn.astype(jnp.float32)
    d_x = dxn.astype(x.dtype)
    d_delta = (dxn * gate.astype(jnp.float32)[:, None, :]).astype(delta.dtype)
    d_gate = (dxn * delta.astype(jnp.float32)).sum(axis=1).astype(gate.dtype)
    return d_x, d_delta, d_gate, d_shift, d_scale


_ln_modulate_res.defvjp(_res_fwd, _res_bwd)


def ln_modulate_residual(x, delta, gate, shift, scale, eps: float = 1e-6,
                         out_dtype=None, block_n: int = 256,
                         interpret: bool = False):
    """Fused residual-gate-add + LN + adaLN modulate:
    ``x_new = x + gate[:, None, :] * delta`` followed by
    ``h = modulate(LN(x_new), shift, scale)``, returning ``(x_new, h)``
    in ONE stream pass — the DiT sublayer boundary
    (reference dit_crossattn.py:55-57) without re-reading the residual
    stream between the gate-add and the next sublayer's LN. All
    arithmetic f32, one cast per output (same numerics contract as
    ``ln_modulate``)."""
    return _ln_modulate_res(x, delta, gate, shift, scale, eps,
                            jnp.dtype(out_dtype or x.dtype), block_n,
                            interpret)


def ln_modulate(x: jnp.ndarray, shift: jnp.ndarray, scale: jnp.ndarray,
                eps: float = 1e-6, out_dtype=None, block_n: int = 256,
                interpret: bool = False) -> jnp.ndarray:
    """x [B, N, D], shift/scale [B, D] -> [B, N, D] in ``out_dtype``
    (default: x.dtype). The whole LN->modulate chain runs in f32 with a
    single final cast, i.e. within one rounding of
    ``modulate(LayerNormF32(out_dtype=...)(x), shift, scale)`` (exactly
    equal when out_dtype is f32). ``interpret=True`` forces the Pallas
    kernel in interpret mode so CPU tests exercise the kernel path.
    """
    return _ln_modulate(x, shift, scale, eps,
                        jnp.dtype(out_dtype or x.dtype), block_n,
                        interpret)
