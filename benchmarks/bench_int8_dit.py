"""Int8 (W8A8) vs bf16 flagship DiT denoise chain on the real chip."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def build(quant):
    from topiaxl.models import DiT, quantize_dit_params

    model = DiT(seq_length=2048, in_channels=68, condition_channels=768,
                hidden_size=1152, depth=28, num_heads=16, cond_drop_prob=0.1,
                attn_proj_bias=True, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 2048, 68), jnp.float32)
    y = jax.random.normal(jax.random.PRNGKey(1), (1, 1370, 768), jnp.float32)
    params = jax.jit(model.init)(key, x, jnp.zeros((1,), jnp.int32), y)
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    if quant:
        params = quantize_dit_params(model, params)
        model = model.clone(quant=True)
    null = params["params"]["null_cond_embedding"]
    y_pair = jnp.concatenate(
        [y, jnp.broadcast_to(
            null[None, None, :].astype(jnp.float32), y.shape)], axis=0)
    kv_fn = jax.jit(lambda p, yy: model.apply(p, yy,
                                              method=type(model).precompute_kv))
    kvs = kv_fn(params, y_pair)

    @jax.jit
    def chain(params, x0, kvs):
        def body(x, i):
            o = model.apply(params, x, jnp.full((1,), i, jnp.int32), kvs,
                            6.0, method=type(model).forward_with_cfg_kv)
            return o[..., :68], None
        return jax.lax.scan(body, x0, jnp.arange(25))[0]

    return chain, params, x, kvs


def run(quant, label):
    chain, params, x, kvs = build(quant)
    out = chain(params, x, kvs)
    float(out.sum())
    n = 4
    t0 = time.perf_counter()
    for _ in range(n):
        out = chain(params, out, kvs)
    float(out.sum())
    dt = time.perf_counter() - t0
    print(f"{label:10s} {25 * n / dt:7.2f} steps/s")
    return 25 * n / dt


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("both", "bf16"):
        run(False, "bf16")
    if which in ("both", "int8"):
        run(True, "int8")
