"""Component rooflines for the B=8 train step (run on real TPU).

All loops run INSIDE one jit (lax.scan) — a host-side step loop through
the tunneled backend measures per-dispatch RPC latency (~2-25 ms/call),
not compute (same reason bench.py times the whole DDIM chain as one
compiled scan).
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

PEAK = 197e12  # v5e bf16


def timeit_scan(body, init, n=50, label="", flops=0):
    """Time n in-jit iterations of body via lax.scan; returns s/iter."""

    @jax.jit
    def run(x):
        return jax.lax.scan(lambda c, _: (body(c), None), x,
                            None, length=n)[0]

    out = run(init)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(init)
    jax.block_until_ready(out)
    float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0:1].sum())
    dt = (time.perf_counter() - t0) / n
    extra = f"  {flops/dt/1e12:6.1f} TF/s ({flops/dt/PEAK*100:3.0f}%)" \
        if flops else ""
    print(f"{label:44s} {dt*1e3:8.3f} ms{extra}")
    return dt


def main():
    key = jax.random.PRNGKey(0)
    M, D = 8 * 2048, 1152

    ws = [jax.random.normal(jax.random.PRNGKey(i), (D, D), jnp.bfloat16)
          for i in range(8)]

    def mm_chain(x):
        for w in ws:
            x = x @ w
        return x

    x0 = jax.random.normal(key, (M, D), jnp.bfloat16)
    timeit_scan(mm_chain, x0, label="8x [16384,1152]@[1152,1152] bf16",
                flops=8 * 2 * M * D * D)

    w2 = jax.random.normal(key, (D, 4 * D), jnp.bfloat16)
    w3 = jax.random.normal(key, (4 * D, D), jnp.bfloat16)
    timeit_scan(lambda x: jax.nn.gelu(x @ w2) @ w3, x0,
                label="mlp [16384,1152]x4608",
                flops=2 * 2 * M * D * 4 * D)

    # optimizer+EMA at flagship size
    import optax

    from topiaxl.pipelines.train import make_optimizer

    nleaf = 145_000_000
    params = {f"p{i}": jnp.zeros((nleaf,), jnp.bfloat16) for i in range(4)}
    grads = {f"p{i}": jnp.full((nleaf,), 1e-4, jnp.bfloat16)
             for i in range(4)}
    opt = make_optimizer()
    ostate = opt.init(params)
    ema = jax.tree.map(lambda a: a + 0, params)

    def update(carry):
        params, ostate, ema = carry
        updates, ostate = opt.update(grads, ostate, params)
        params = optax.apply_updates(params, updates)
        ema = jax.tree.map(lambda e, p: e * 0.9999 + p * 1e-4, ema, params)
        return params, ostate, ema

    timeit_scan(update, (params, ostate, ema), n=20,
                label="adamw+clip+EMA update, 580M params")

    # flash kernels at train shapes
    from topiaxl.ops.flash_attention import flash_attention

    B, S, H, Dh = 8, 2048, 16, 72
    q = jax.random.normal(key, (B, S, H, Dh), jnp.bfloat16)
    k = jax.random.normal(key, (B, S, H, Dh), jnp.bfloat16)
    v = jax.random.normal(key, (B, S, H, Dh), jnp.bfloat16)
    do = jax.random.normal(key, (B, S, H, Dh), jnp.bfloat16)
    scale = Dh ** -0.5
    fl_fwd = 2 * 2 * B * H * S * S * Dh

    timeit_scan(lambda q: flash_attention(q, k, v, scale)[..., :Dh], q,
                label="flash self fwd 8x2048x16x72", flops=fl_fwd)

    g = jax.grad(lambda q, k, v: jnp.vdot(
        flash_attention(q, k, v, scale), do), (0, 1, 2))
    timeit_scan(lambda c: g(c[0], c[1], c[2]), (q, k, v), n=30,
                label="flash self fwd+bwd", flops=int(fl_fwd * 3.5))

    kc = jax.random.normal(key, (B, 1370, H, Dh), jnp.bfloat16)
    vc = jax.random.normal(key, (B, 1370, H, Dh), jnp.bfloat16)
    timeit_scan(lambda c: g(c[0], c[1], c[2]), (q, kc, vc), n=30,
                label="flash cross fwd+bwd 8x2048x1370",
                flops=int(2 * 2 * B * H * S * 1370 * Dh * 3.5))

    # XLA einsum attention for comparison
    from topiaxl.ops.attention import _xla_attention

    gx = jax.grad(lambda q, k, v: jnp.vdot(
        _xla_attention(q, k, v, scale).astype(jnp.bfloat16), do),
        (0, 1, 2))
    timeit_scan(lambda c: gx(c[0], c[1], c[2]), (q, k, v), n=30,
                label="XLA self fwd+bwd", flops=int(fl_fwd * 3.5))


if __name__ == "__main__":
    main()
