"""End-to-end asset benchmark: image tokens -> PrimX -> textured GLB.

Measures the full pipeline wall-clock on the current default device
(one TPU chip under the driver) and prints per-stage + total JSON.
Random weights — throughput is weight-independent.

Usage: python benchmarks/bench_e2e.py [--mc 256] [--ddim 25] [--warm]
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
    ap.add_argument("--mc", type=int, default=256)
    ap.add_argument("--ddim", type=int, default=25)
    ap.add_argument("--texture", type=int, default=1024)
    ap.add_argument("--warm", action="store_true",
                    help="run twice, report the warm pass")
    args = ap.parse_args()

    from topiaxl.diffusion import create_diffusion
    from topiaxl.models import DiT, VAE3D
    from topiaxl.pipelines import infer as P

    key = jax.random.PRNGKey(0)
    dit = DiT(seq_length=2048, in_channels=68, condition_channels=768,
              hidden_size=1152, depth=28, num_heads=16, cond_drop_prob=0.1,
              attn_proj_bias=True, dtype=jnp.bfloat16)
    vae = VAE3D(dtype=jnp.bfloat16)
    diffusion = create_diffusion(
        timestep_respacing=f"ddim{args.ddim}",
        noise_schedule="squaredcos_cap_v2", parameterization="v",
        diffusion_steps=1000)

    t0 = time.perf_counter()
    dit_params = jax.jit(dit.init)(
        key, jnp.zeros((1, 2048, 68)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 2, 768)))
    dit_params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), dit_params)
    vae_params = vae.init(key, jnp.zeros((1, 8, 8, 8, 6)), key)
    init_s = time.perf_counter() - t0

    from topiaxl.models.latent_stats import get_latent_stats

    mean, std = get_latent_stats("primx_v1")
    y = jax.random.normal(jax.random.PRNGKey(1), (1, 1370, 768))

    def synthetic_asset():
        """Flagship-scale PrimX asset (sphere shell) — random DiT weights
        produce degenerate fields, so stage 2 is timed on a realistic
        workload instead."""
        from topiaxl.models.primx import PrimXParams, local_grid

        rng = np.random.default_rng(0)
        n = 2048
        v = rng.standard_normal((n, 3)).astype("f")
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        pos = (v * 0.55).astype("f")
        scale = np.full((n, 1), 0.07, "f")
        world = pos[:, None, :] + scale[:, 0][:, None, None] * local_grid(8)[None]
        sdf = np.linalg.norm(world, axis=2) - 0.55
        rgb = np.clip(0.5 + 0.5 * world.transpose(0, 2, 1), 0, 1)
        mat = np.concatenate([np.full((n, 1, 512), 0.8),
                              np.full((n, 1, 512), 0.2)], 1)
        feat = np.concatenate([sdf[:, None, :], rgb, mat], 1).reshape(n, -1)
        return PrimXParams(jnp.asarray(np.concatenate([scale, pos], 1)),
                           jnp.asarray(feat.astype("f")))

    def run(tag):
        stages = {}
        t0 = time.perf_counter()
        params = P.generate_primx(
            dit, vae, diffusion, dit_params, vae_params, y,
            jax.random.PRNGKey(2), mean, std, cfg_scale=6.0)
        jax.block_until_ready(params.feat)
        stages["stage1_denoise_decode_s"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        glb = P.extract_glb(
            synthetic_asset(), f"/tmp/topiaxl_bench_{tag}",
            mc_resolution=args.mc, decimate=100000,
            texture_size=args.texture, batch_size=32768, pos_scale=1.0)
        stages["stage2_extract_s"] = time.perf_counter() - t0
        stages["total_s"] = (stages["stage1_denoise_decode_s"]
                             + stages["stage2_extract_s"])
        stages["glb"] = glb
        return stages

    stages = run("cold")
    if args.warm:
        stages = run("warm")

    total = stages["total_s"]
    print(json.dumps({
        "metric": "image_to_glb_seconds",
        "value": round(total, 2),
        "unit": "s/asset",
        "vs_baseline": round(30.0 / total, 3),  # target: <30 s on one chip
        "stages": {k: round(v, 2) for k, v in stages.items()
                   if isinstance(v, float)},
        "init_s": round(init_s, 2),
    }))


if __name__ == "__main__":
    main()
