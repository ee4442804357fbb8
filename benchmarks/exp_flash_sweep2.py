"""In-chain sweep of the transposed flash forward's (block_q, chunk)
on the real chip at flagship shapes. Times a 20-deep scan chain (one
dispatch) so tunnel latency cancels out.

Run on TPU: python benchmarks/exp_flash_sweep2.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import topiaxl.ops.flash_attention as fa


def time_chain(f, q, k, v, n=20, reps=3):
    @jax.jit
    def chain(q, k, v):
        def body(q, _):
            o = f(q, k, v)
            return (q + 0.001 * o).astype(q.dtype), None
        return jax.lax.scan(body, q, None, length=n)[0]

    out = chain(q, k, v)
    float(out.sum().astype(jnp.float32))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = chain(q, k, v)
        float(out.sum().astype(jnp.float32))
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3


def main():
    key = jax.random.PRNGKey(0)
    for name, sq, sk in [("self", 2048, 2048), ("cross", 2048, 1370)]:
        q = jax.random.normal(key, (2, sq, 16, 72), jnp.bfloat16)
        k = jax.random.normal(key, (2, sk, 16, 72), jnp.bfloat16)
        v = jax.random.normal(key, (2, sk, 16, 72), jnp.bfloat16)
        scale = 72 ** -0.5
        print(f"== {name} ({sq}x{sk}) ==")
        orig_chunks = fa._chunks
        try:
            for block_q in (256, 512, 1024, 2048):
                for target in (128, 256, 512):
                    fa._chunks = functools.partial(
                        orig_chunks.__wrapped__
                        if hasattr(orig_chunks, '__wrapped__')
                        else orig_chunks, target=target)
                    f = functools.partial(fa._flash_forward, scale=scale,
                                          block_q=block_q)
                    try:
                        ms = time_chain(lambda q, k, v: f(q, k, v), q, k, v)
                        print(f"  bq={block_q:5d} chunk={target:4d}  "
                              f"{ms:7.3f} ms")
                    except Exception as e:
                        print(f"  bq={block_q:5d} chunk={target:4d}  FAIL "
                              f"{type(e).__name__}: {str(e)[:80]}")
        finally:
            # an interrupt mid-sweep must not leave the module global
            # patched for the rest of the process
            fa._chunks = orig_chunks


if __name__ == "__main__":
    main()
