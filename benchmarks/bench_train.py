"""Flagship DiT training-step throughput on one chip.

BASELINE.md: "DiT training step (data-parallel, VAE frozen): benchmark
to establish (v5e-8 slice)". Only one real chip is reachable in this
environment, so this measures the single-chip step (the dp scaling
surface is proven separately: dryrun_multichip + the sharded-equivalence
tests run the same jitted step over virtual meshes). Gradient
rematerialization (DiT remat=True) keeps the full recipe — v-pred MSE +
VB, cond-drop, EMA, AdamW + clip — inside one chip's HBM.

Usage: python benchmarks/bench_train.py [--batch 2] [--steps 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--remat", default="full",
                    choices=["none", "full", "dots", "flash", "flash_mlp"])
    ap.add_argument("--scan", action="store_true",
                    help="scan_blocks training layout (one compiled "
                         "block body instead of 28 unrolled)")
    args = ap.parse_args()
    remat = {"none": False, "full": True, "dots": "dots",
             "flash": "flash", "flash_mlp": "flash_mlp"}[args.remat]

    from topiaxl.diffusion import create_diffusion
    from topiaxl.models import DiT
    from topiaxl.pipelines.train import (
        create_train_state, jit_train_step, make_optimizer, make_train_step,
    )

    model = DiT(seq_length=2048, in_channels=68, condition_channels=768,
                hidden_size=1152, depth=28, num_heads=16,
                cond_drop_prob=0.1, attn_proj_bias=True,
                dtype=jnp.bfloat16, remat=remat,
                scan_blocks=args.scan)
    diffusion = create_diffusion(
        timestep_respacing=None, noise_schedule="squaredcos_cap_v2",
        parameterization="v", diffusion_steps=1000)

    key = jax.random.PRNGKey(0)
    params = jax.jit(model.init)(
        key, jnp.zeros((1, 2048, 68)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 2, 768)))
    # bf16 weights on the single benchmark chip: f32 master weights +
    # both f32 Adam moments for 0.95B params exceed one v5e's 16 GB HBM —
    # production training shards them with fsdp across the slice
    # (parallel/sharding.py rules; proven on the virtual mesh)
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    opt = make_optimizer(lr=1e-4, warmup_iters=3000, max_iters=200000)
    state = create_train_state(params, opt)
    # donation halves the resident state (old+new cannot coexist in
    # 16 GB); de-alias the zero-init optimizer slots first so every
    # donated leaf is a distinct buffer
    state = state._replace(
        opt_state=jax.tree.map(lambda a: a + 0 if hasattr(a, "dtype") else a,
                               state.opt_state))

    B = args.batch
    rng = np.random.default_rng(0)
    batch = {
        "x": jnp.asarray(rng.standard_normal((B, 2048, 68)).astype("f")),
        "y": jnp.asarray(rng.standard_normal((B, 1370, 768)).astype("f")),
    }
    step = jit_train_step(make_train_step(model, diffusion, opt),
                          donate=True)

    state, metrics = step(state, batch, key)  # compile
    float(metrics["loss"])

    t0 = time.perf_counter()
    for i in range(args.steps):
        state, metrics = step(state, batch, jax.random.fold_in(key, i))
    float(metrics["loss"])
    dt = (time.perf_counter() - t0) / args.steps

    # per-step FLOPs ~ 3x forward (fwd + bwd) + remat recompute ~ 4x fwd.
    # fwd per sample ~ 3.04 TFLOP (half the 6.07 TFLOP CFG'd pair)
    tokens_per_sec = B * 2048 / dt
    print(json.dumps({
        "metric": "dit_train_steps_per_sec",
        "value": round(1.0 / dt, 3),
        "unit": "steps/s",
        "batch_per_chip": B,
        "samples_per_sec": round(B / dt, 2),
        "tokens_per_sec": round(tokens_per_sec, 0),
        "loss": round(float(metrics["loss"]), 4),
    }))


if __name__ == "__main__":
    main()
