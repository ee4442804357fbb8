"""Op-level profile of the flagship DiT train step (B=2 default) via
jax.profiler + xprof offline parsing. The ideal B=2 no-remat step is
~3x the forward + ~21 ms optimizer traffic (~11 steps/s); measured is
4.37 — this prints the top HLO ops by self-time to locate the gap.

Run on the TPU:  python benchmarks/profile_train_trace.py [batch] [remat]
remat in {none,full,dots,flash}.
"""
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    remat = {"none": False, "full": True, "dots": "dots",
             "flash": "flash", "flash_mlp": "flash_mlp"}[sys.argv[2] if len(sys.argv) > 2 else "none"]
    scan = len(sys.argv) > 3 and sys.argv[3] == "scan"
    ga = int(sys.argv[4]) if len(sys.argv) > 4 else 1

    from topiaxl.diffusion import create_diffusion
    from topiaxl.models import DiT
    from topiaxl.pipelines.train import (
        create_train_state, jit_train_step, make_optimizer, make_train_step,
    )

    model = DiT(seq_length=2048, in_channels=68, condition_channels=768,
                hidden_size=1152, depth=28, num_heads=16,
                cond_drop_prob=0.1, attn_proj_bias=True,
                dtype=jnp.bfloat16, remat=remat, scan_blocks=scan)
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
    state = state._replace(
        opt_state=jax.tree.map(lambda a: a + 0 if hasattr(a, "dtype") else a,
                               state.opt_state))
    rng = np.random.default_rng(0)
    batch = {
        "x": jnp.asarray(rng.standard_normal((B, 2048, 68)).astype("f")),
        "y": jnp.asarray(rng.standard_normal((B, 1370, 768)).astype("f")),
    }
    step = jit_train_step(make_train_step(model, diffusion, opt,
                                      grad_accum=ga),
                          donate=True)
    state, metrics = step(state, batch, key)
    float(metrics["loss"])

    logdir = "/tmp/topiaxl_train_trace"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        for _ in range(2):
            state, metrics = step(state, batch, key)
        float(metrics["loss"])

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from profile_sdf_refine import aggregate

    aggregate(logdir, f"train step B={B} remat={remat} ga={ga} (2 steps)",
              n_top=28)


if __name__ == "__main__":
    main()
