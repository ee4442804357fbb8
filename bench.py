"""North-star benchmark: flagship DiT denoise steps/sec on one chip.

One "step" = one CFG'd denoise evaluation at full 3DTopia-XL geometry
(2 x [2048 tokens x 68ch] through depth-28/hidden-1152 DiT with
cross-attn to 1370 DINOv2 tokens), with per-block cross-attn K/V
precomputed once (they are constant over the chain).

Prints ONE JSON line. ``vs_baseline`` compares against an estimated
reference throughput of the PyTorch/xformers fp16 implementation on its
implied A100 (see BASELINE.md — the repo publishes no numbers; estimate:
~9.5 TFLOP/step at ~40% A100 fp16 MFU => ~13 steps/s).
"""

import json
import time

import jax
import jax.numpy as jnp

BASELINE_STEPS_PER_SEC = 13.0  # estimated A100 fp16 reference (see docstring)


def main():
    from topiaxl.models import DiT

    model = DiT(
        seq_length=2048, in_channels=68, condition_channels=768,
        hidden_size=1152, depth=28, num_heads=16, cond_drop_prob=0.1,
        attn_proj_bias=True, dtype=jnp.bfloat16,
    )
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 2048, 68), jnp.float32)
    t = jnp.full((1,), 500, jnp.int32)
    y = jax.random.normal(jax.random.PRNGKey(1), (1, 1370, 768), jnp.float32)

    params = jax.jit(model.init)(key, x, t, y)
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)

    # KV for cond + null branches, computed once per asset
    null = params["params"]["null_cond_embedding"]
    y_pair = jnp.concatenate(
        [y, jnp.broadcast_to(null[None, None, :], y.shape)], axis=0
    )
    kv_fn = jax.jit(lambda p, yy: model.apply(p, yy, method=DiT.precompute_kv))
    kvs = jax.block_until_ready(kv_fn(params, y_pair))

    @jax.jit
    def step(params, x, t, kvs):
        return model.apply(params, x, t, kvs, 6.0,
                           method=DiT.forward_with_cfg_kv)

    out = step(params, x, t, kvs)  # compile
    # NOTE: force a scalar readback for the sync — block_until_ready does
    # not reliably wait for execution through tunneled device backends
    float(out.sum())

    n = 20
    t0 = time.perf_counter()
    for i in range(n):
        out = step(params, out.astype(jnp.float32)[..., :68], t, kvs)
    float(out.sum())
    dt = time.perf_counter() - t0

    steps_per_sec = n / dt
    print(json.dumps({
        "metric": "dit_denoise_steps_per_sec",
        "value": round(steps_per_sec, 3),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
