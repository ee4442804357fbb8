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
