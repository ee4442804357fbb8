"""Attention backend micro-benchmark at flagship shapes.

Compares the XLA einsum path vs the Pallas flash kernel on the DiT's
self-attention (2x2048x2048, 16 heads, d=72) and cross-attention
(2x2048x1370) shapes. Informs the default attn_backend.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(f, q, k, v, n=30):
    # chain the output into the next query so every iteration MUST
    # execute (block_until_ready under-syncs through the tunnel)
    o = f(q, k, v)
    jax.device_get(o[0, 0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(n):
        q = q + 0.0 * f(q, k, v)
    jax.device_get(q[0, 0, 0, 0])
    return (time.perf_counter() - t0) / n * 1e3


def main():
    from topiaxl.ops.attention import _xla_attention
    from topiaxl.ops.flash_attention import _flash_forward

    results = {}
    for name, sq, sk in [("self", 2048, 2048), ("cross", 2048, 1370)]:
        key = jax.random.PRNGKey(0)
        q = jax.random.normal(key, (2, sq, 16, 72), jnp.bfloat16)
        k = jax.random.normal(key, (2, sk, 16, 72), jnp.bfloat16)
        v = jax.random.normal(key, (2, sk, 16, 72), jnp.bfloat16)
        scale = 72**-0.5

        xla = jax.jit(lambda q, k, v: _xla_attention(q, k, v, scale))
        fl = jax.jit(lambda q, k, v: _flash_forward(q, k, v, scale))
        results[f"{name}_xla_ms"] = round(timeit(xla, q, k, v), 3)
        results[f"{name}_flash_ms"] = round(timeit(fl, q, k, v), 3)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
