"""Int8 (W8A8) matmul path for serving.

The v5e MXU runs int8 x int8 -> int32 at ~2x the bf16 rate; the DiT
denoise step is matmul-bound (benchmarks/microbench_dit.py: dense
matmuls ~20 ms of a 47 ms step), so quantizing the block matmuls buys
real end-to-end latency. Scheme (standard LLM practice, no reference
counterpart — the reference serves fp16):

* weights: static per-output-channel symmetric int8
  (``quantize_weight``), done once at load time;
* activations: dynamic per-token symmetric int8, computed inline —
  the abs-max reduction and rescale are VPU work fused around the dot.

Accuracy instrumentation lives in tests/test_int8.py (SNR vs the f32
matmul; quantized-vs-bf16 DiT forward deviation).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def quantize_weight(w: jnp.ndarray):
    """[in, out] float -> (int8 [in, out], f32 scale [out])."""
    w32 = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(w32), axis=0) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(w32 / scale[None, :]), -127, 127).astype(jnp.int8)
    return q, scale


def int8_matmul(x: jnp.ndarray, w_q: jnp.ndarray, w_scale: jnp.ndarray,
                out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """[..., in] @ int8 [in, out] with dynamic per-token activation quant."""
    x32 = x.astype(jnp.float32)
    s = jnp.max(jnp.abs(x32), axis=-1, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    xq = jnp.clip(jnp.round(x32 / s), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, w_q, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * s * w_scale).astype(out_dtype)


class QuantDense(nn.Module):
    """Drop-in Dense running W8A8. Parameters are the QUANTIZED form
    (``kernel_q`` int8 + ``kernel_scale`` f32 + optional ``bias``);
    produce them from a float checkpoint with ``quantize_params_like``.
    """

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.bfloat16
    # accepted-and-ignored so call sites can swap nn.Dense <-> QuantDense
    # without branching (real weights come pre-quantized from a float
    # checkpoint; the int8 init above only serves tests)
    kernel_init: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_f = x.shape[-1]
        # initializers exist so .init() builds the tree (random weights
        # for tests); real params come from quantize_params_like
        w_q = self.param(
            "kernel_q",
            lambda key, shape: jnp.round(
                jax.nn.initializers.xavier_uniform()(key, shape, jnp.float32)
                * 127.0 * 3.0
            ).clip(-127, 127).astype(jnp.int8),
            (in_f, self.features),
        )
        w_scale = self.param(
            "kernel_scale",
            lambda key, shape: jnp.full(shape, 1.0 / (127.0 * 3.0),
                                        jnp.float32) / jnp.sqrt(
                jnp.asarray(in_f, jnp.float32)),
            (self.features,),
        )
        out = int8_matmul(x, w_q, w_scale, out_dtype=self.dtype)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,),
                           jnp.float32)
            out = out + b.astype(self.dtype)
        return out


def quantize_params_like(params, quant_template) -> Any:
    """Map a float param tree onto a QuantDense-shaped template tree.

    Wherever the template has {kernel_q, kernel_scale}, the float tree's
    matching {kernel} is quantized; everything else passes through (and
    is cast to the template leaf's dtype). Works on nested dicts (flax
    FrozenDict-compatible plain dicts).
    """

    def rec(src, tpl):
        if isinstance(tpl, dict):
            if "kernel_q" in tpl:
                q, s = quantize_weight(src["kernel"])
                out = {"kernel_q": q, "kernel_scale": s}
                if "bias" in tpl:
                    out["bias"] = jnp.asarray(
                        src["bias"], tpl["bias"].dtype
                        if hasattr(tpl["bias"], "dtype") else jnp.float32)
                return out
            return {k: rec(src[k], v) for k, v in tpl.items()}
        return jnp.asarray(src, tpl.dtype if hasattr(tpl, "dtype")
                           else None)

    return rec(params, quant_template)
