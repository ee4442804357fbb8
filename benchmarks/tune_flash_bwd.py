"""Backward flash kernel block tuning (run on real TPU)."""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import topiaxl.ops.flash_attention as fa

B, N, M, H, Dh = 2, 2048, 1370, 16, 72
key = jax.random.PRNGKey(0)
q = jax.random.normal(key, (B, N, H, Dh), jnp.bfloat16)
ks = jax.random.normal(key, (B, N, H, Dh), jnp.bfloat16)
vs = jax.random.normal(key, (B, N, H, Dh), jnp.bfloat16)
kc = jax.random.normal(key, (B, M, H, Dh), jnp.bfloat16)
vc = jax.random.normal(key, (B, M, H, Dh), jnp.bfloat16)
L = 28


def timeit(f, *args, n=20, label=""):
    out = f(*args)
    float(jnp.sum(out[0]).astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    float(jnp.sum(out[0]).astype(jnp.float32))
    dt = (time.perf_counter() - t0) / n
    print(f"{label:44s} {dt*1e3:8.2f} ms")
    return dt


def grad_stack(kk, vv, sc):
    def loss(q):
        o = q
        for _ in range(L):
            o = fa.flash_attention(o, kk, vv, sc)
        return jnp.sum(o.astype(jnp.float32) ** 2)
    return jax.jit(jax.grad(loss))


def run(bq, bk, dkv_bq, dkv_bk):
    orig = fa._flash_backward
    fa._flash_backward = functools.partial(
        orig, block_q=bq, block_k=bk,
        dkv_block_q=dkv_bq, dkv_block_k=dkv_bk)
    label = f"dq=({bq},{bk}) dkv=({dkv_bq},{dkv_bk})"
    try:
        g_self = grad_stack(ks, vs, Dh ** -0.5)
        timeit(lambda q: (g_self(q),), q,
               label=f"self fwd+bwd x{L} {label}")
        g_cross = grad_stack(kc, vc, float(Dh) ** -1.0)
        timeit(lambda q: (g_cross(q),), q,
               label=f"cross fwd+bwd x{L} {label}")
    finally:
        fa._flash_backward = orig


# the dq and dkv passes have independent blockings (flash_attention.py:
# dkv is VMEM-budgeted tighter); sweep both
for bq, bk, dkv_bq, dkv_bk in (
    (512, 512, 512, 512),
    (512, 2048, 256, 1024),   # shipped defaults
    (512, 2048, 256, 2048),   # dkv single KV block (OOMs in-context at B>=4)
    (512, 2048, 512, 1024),
):
    run(bq, bk, dkv_bq, dkv_bk)
