"""Experiment: flash kernels with blocks at the native head dim (72,
8-aligned) instead of padding to 128 in HBM. Mosaic pads the lane dim
internally at no MXU cost, so the explicit _pad_to copy is pure HBM
traffic — this measures fwd and fwd+bwd both ways at flagship shapes.

Run on the TPU: python benchmarks/exp_flash_dpad.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from topiaxl.ops import flash_attention as fa


def timeit_scan(step, x0, n=50, reps=3):
    @jax.jit
    def chain(c):
        return jax.lax.scan(lambda c, _: (step(c), None), c,
                            None, length=n)[0]

    c = chain(x0)
    float(jnp.sum(c).astype(jnp.float32))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        c = chain(x0)
        float(jnp.sum(c).astype(jnp.float32))
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def run(tag):
    key = jax.random.PRNGKey(0)
    B, H, D = 2, 16, 72
    q = jax.random.normal(key, (B, 2048, H, D), jnp.bfloat16)
    kv = jax.random.normal(key, (B, 2048, H, D), jnp.bfloat16)
    ck = jax.random.normal(key, (B, 1370, H, D), jnp.bfloat16)
    sc = D ** -0.5

    def fwd_self(c):
        return c + fa.flash_attention(c, kv, kv, sc) * 1e-2

    def fwd_cross(c):
        return c + fa.flash_attention(c, ck, ck, sc) * 1e-2

    def g_self(c):
        f = lambda x: jnp.sum(fa.flash_attention(x, kv, kv, sc)
                              .astype(jnp.float32) ** 2)
        return c + jax.grad(f)(c) * 1e-3

    def g_cross(c):
        f = lambda x: jnp.sum(fa.flash_attention(x, ck, ck, sc)
                              .astype(jnp.float32) ** 2)
        return c + jax.grad(f)(c) * 1e-3

    for name, fn in [("fwd self", fwd_self), ("fwd cross", fwd_cross),
                     ("fwd+bwd self", g_self), ("fwd+bwd cross", g_cross)]:
        t = timeit_scan(fn, q, n=30)
        print(f"[{tag}] {name:14s} {t*1e3:8.3f} ms", flush=True)


def main():
    run("d_p=128")
    orig = fa._fold_sizes

    def fold72(q, k, block_q, block_k):
        bq, bk, sq_p, sk_p, _ = orig(q, k, block_q, block_k)
        d_p = -(-q.shape[3] // 8) * 8
        return bq, bk, sq_p, sk_p, d_p

    fa._fold_sizes = fold72
    run("d_p=72 ")
    # numerics check
    key = jax.random.PRNGKey(1)
    q = jax.random.normal(key, (1, 512, 4, 72), jnp.bfloat16)
    k = jax.random.normal(key, (1, 640, 4, 72), jnp.bfloat16)
    f72 = jax.jit(lambda a, b: fa.flash_attention(a, b, b, 0.1))(q, k)
    fa._fold_sizes = orig
    f128 = jax.jit(lambda a, b: fa.flash_attention(a, b, b, 0.11 - 0.01))(q, k)
    import numpy as np
    np.testing.assert_allclose(np.asarray(f72, np.float32),
                               np.asarray(f128, np.float32), atol=1e-2)
    print("numerics ok (d_p=72 == d_p=128)")


if __name__ == "__main__":
    main()
