"""Component timing of one CFG'd flagship DiT step on the real chip."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from topiaxl.ops.flash_attention import flash_attention

B, N, M, H, Dh, D = 2, 2048, 1376, 16, 72, 1152
FF = 4 * D
key = jax.random.PRNGKey(0)
q = jax.random.normal(key, (B, N, H, Dh), jnp.bfloat16)
kk = jax.random.normal(key, (B, N, H, Dh), jnp.bfloat16)
vv = jax.random.normal(key, (B, N, H, Dh), jnp.bfloat16)
kc = jax.random.normal(key, (B, M, H, Dh), jnp.bfloat16)
vc = jax.random.normal(key, (B, M, H, Dh), jnp.bfloat16)
x = jax.random.normal(key, (B, N, D), jnp.bfloat16)
w_qkv = jax.random.normal(key, (D, 3 * D), jnp.bfloat16) * 0.02
w_proj = jax.random.normal(key, (D, D), jnp.bfloat16) * 0.02
w_fc1 = jax.random.normal(key, (D, FF), jnp.bfloat16) * 0.02
w_fc2 = jax.random.normal(key, (FF, D), jnp.bfloat16) * 0.02
t_emb = jax.random.normal(key, (B, 9 * D), jnp.float32)

L = 28


def timeit(f, *args, n=30, label=""):
    out = f(*args)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out).astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out).astype(jnp.float32))
    dt = (time.perf_counter() - t0) / n
    print(f"{label:28s} {dt*1e3:8.2f} ms")
    return dt


@jax.jit
def self_attn_stack(q, kk, vv):
    o = q
    for _ in range(L):
        o = flash_attention(o, kk, vv, Dh ** -0.5)
    return o


@jax.jit
def cross_attn_stack(q, kc, vc):
    o = q
    for _ in range(L):
        o = flash_attention(o, kc, vc, float(Dh) ** -1.0)
    return o


@jax.jit
def dense_stack(x, w_qkv, w_proj, w_fc1, w_fc2):
    h = x
    for _ in range(L):
        qkv = h @ w_qkv                       # fused qkv
        h = qkv[:, :, :D] @ w_proj            # self proj
        cq = h @ w_proj                       # cross q
        h = cq @ w_proj                       # cross proj
        f = h @ w_fc1
        h = jax.nn.gelu(f, approximate=True) @ w_fc2
    return h


@jax.jit
def ln_mod_stack(x, t_emb):
    h = x
    for _ in range(L):
        for j in range(3):
            x32 = h.astype(jnp.float32)
            mu = x32.mean(-1, keepdims=True)
            var = x32.var(-1, keepdims=True)
            nrm = ((x32 - mu) * jax.lax.rsqrt(var + 1e-6)).astype(jnp.bfloat16)
            s = t_emb[:, j * D:(j + 1) * D].astype(jnp.bfloat16)
            h = h + nrm * (1 + s[:, None, :]) + s[:, None, :]
    return h


timeit(self_attn_stack, q, kk, vv, label=f"self-attn x{L}")
timeit(cross_attn_stack, q, kc, vc, label=f"cross-attn x{L}")
timeit(dense_stack, x, w_qkv, w_proj, w_fc1, w_fc2, label=f"dense matmuls x{L}")
timeit(ln_mod_stack, x, t_emb, label=f"LN+modulate x{L}x3")
