"""Compare remat strategies for the flagship train step (run on real TPU).

Full-block remat recomputes the whole forward in the backward (+~33%
FLOPs). At B=2/chip the activations may fit in HBM without it, or with a
selective policy that saves only the matmul outputs.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def run(remat, batch=2, steps=5, label="", scan_blocks=False,
        grad_accum=1, scan_unroll=1):
    from topiaxl.diffusion import create_diffusion
    from topiaxl.models import DiT
    from topiaxl.pipelines.train import (
        create_train_state, jit_train_step, make_optimizer, make_train_step,
    )

    model = DiT(seq_length=2048, in_channels=68, condition_channels=768,
                hidden_size=1152, depth=28, num_heads=16,
                cond_drop_prob=0.1, attn_proj_bias=True,
                dtype=jnp.bfloat16, remat=remat, scan_blocks=scan_blocks,
                scan_unroll=scan_unroll)
    diffusion = create_diffusion(
        timestep_respacing=None, noise_schedule="squaredcos_cap_v2",
        parameterization="v", diffusion_steps=1000)
    key = jax.random.PRNGKey(0)
    params = jax.jit(model.init)(
        key, jnp.zeros((1, 2048, 68)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 2, 768)))
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    opt = make_optimizer(lr=1e-4, warmup_iters=3000, max_iters=200000)
    state = create_train_state(params, opt)
    rng = np.random.default_rng(0)
    batch_d = {
        "x": jnp.asarray(rng.standard_normal((batch, 2048, 68)).astype("f")),
        "y": jnp.asarray(rng.standard_normal((batch, 1370, 768)).astype("f")),
    }
    step = jit_train_step(
        make_train_step(model, diffusion, opt, grad_accum=grad_accum),
        donate=True)
    t0 = time.perf_counter()
    state, metrics = step(state, batch_d, key)
    float(metrics["loss"])
    print(f"{label:28s} compile+1 {time.perf_counter() - t0:7.1f} s")
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step(state, batch_d, key)
    float(metrics["loss"])
    sps = steps / (time.perf_counter() - t0)
    print(f"{label:28s} {sps:6.3f} steps/s ({sps * batch:.2f} samples/s)")
    return sps


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    if which in ("all", "none"):
        try:
            run(False, batch=batch, label=f"remat=False B={batch}")
        except Exception as e:
            print("remat=False failed:", repr(e)[:300])
    if which in ("all", "full"):
        run(True, batch=batch, label=f"remat=True B={batch}")
    if which in ("all", "dots"):
        try:
            run("dots", batch=batch, label=f"remat='dots' B={batch}")
        except Exception as e:
            print("remat='dots' failed:", repr(e)[:300])
    if which in ("all", "flash"):
        try:
            run("flash", batch=batch, label=f"remat='flash' B={batch}")
        except Exception as e:
            print("remat='flash' failed:", repr(e)[:300])
