"""Does XLA hit the v5e int8 MXU rate? (int8 x int8 -> int32 dot vs bf16).

Also times the full W8A8 pattern (dynamic per-token activation quant +
int8 dot + rescale) at the DiT block matmul shapes.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(f, *args, n=30, label=""):
    out = f(*args)
    float(jnp.sum(out).astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    float(jnp.sum(out).astype(jnp.float32))
    dt = (time.perf_counter() - t0) / n
    print(f"{label:40s} {dt*1e3:8.3f} ms")
    return dt


key = jax.random.PRNGKey(0)
M, K, N = 4096, 4608, 4608
flop = 2 * M * K * N

a8 = jax.random.randint(key, (M, K), -127, 127, jnp.int8)
b8 = jax.random.randint(key, (K, N), -127, 127, jnp.int8)
ab = jax.random.normal(key, (M, K), jnp.bfloat16)
bb = jax.random.normal(key, (K, N), jnp.bfloat16)


@jax.jit
def dot_i8(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)


@jax.jit
def dot_bf16(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


@jax.jit
def w8a8(x, wq, ws):
    # dynamic per-token activation quant + int8 dot + rescale
    s = jnp.max(jnp.abs(x), axis=-1, keepdims=True).astype(jnp.float32) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * s * ws[None, :]).astype(jnp.bfloat16)


ws = jnp.ones((N,), jnp.float32)
d1 = timeit(dot_i8, a8, b8, label=f"int8 dot {M}x{K}x{N}")
print(f"  -> {flop/d1/1e12:.1f} TOP/s")
d2 = timeit(dot_bf16, ab, bb, label=f"bf16 dot {M}x{K}x{N}")
print(f"  -> {flop/d2/1e12:.1f} TF/s")
d3 = timeit(w8a8, ab, b8, ws, label="W8A8 incl. dynamic act quant")
print(f"  -> {flop/d3/1e12:.1f} eff TF/s")
