"""Raw MXU rate inside a Pallas kernel: int8 vs bf16 dot_general.

One kernel invocation loops L dots over resident VMEM operands, so the
measurement is pure in-kernel compute (no dispatch/HBM effects).
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, K, N = 512, 1024, 1024
L = 256


def loop_kernel(a_ref, b_ref, o_ref, *, acc_dtype):
    a = a_ref[...]
    b = b_ref[...]

    def body(i, acc):
        d = jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=acc_dtype)
        return acc + d * acc_dtype(i % 3 - 1)

    o_ref[...] = jax.lax.fori_loop(
        0, L, body, jnp.zeros((M, N), acc_dtype))


def run(a, b, acc_dtype, label):
    f = jax.jit(lambda a, b: pl.pallas_call(
        functools.partial(loop_kernel, acc_dtype=acc_dtype),
        out_shape=jax.ShapeDtypeStruct((M, N), acc_dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=jax.default_backend() != "tpu",
    )(a, b))
    out = f(a, b)
    float(jnp.sum(out).astype(jnp.float32))
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(a, b)
    float(jnp.sum(out).astype(jnp.float32))
    dt = (time.perf_counter() - t0) / n
    rate = 2 * M * N * K * L / dt / 1e12
    print(f"{label:28s} {dt*1e3:8.2f} ms  -> {rate:6.1f} T/s")


key = jax.random.PRNGKey(0)
run(jax.random.normal(key, (M, K), jnp.bfloat16),
    jax.random.normal(key, (K, N), jnp.bfloat16),
    jnp.float32, f"bf16 {M}x{K}x{N} x{L}")
run(jax.random.randint(key, (M, K), -127, 127, jnp.int8),
    jax.random.randint(key, (K, N), -127, 127, jnp.int8),
    jnp.int32, f"int8 {M}x{K}x{N} x{L}")
