"""Stage-2 (PrimX -> GLB) phase profile on the real chip, including the
sdf_grid internal phases (coarse query / host upsample / band select /
refine query / scatter). Run: python benchmarks/profile_stage2.py [n_warm]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def synthetic_asset():
    from topiaxl.models.primx import PrimXParams, local_grid

    rng = np.random.default_rng(0)
    n = 2048
    v = rng.standard_normal((n, 3)).astype("f")
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    pos = (v * 0.55).astype("f")
    scale = np.full((n, 1), 0.07, "f")
    world = (pos[:, None, :]
             + scale[:, 0][:, None, None] * local_grid(8)[None])
    sdf = np.linalg.norm(world, axis=2) - 0.55
    rgb = np.clip(0.5 + 0.5 * world.transpose(0, 2, 1), 0, 1)
    mat = np.concatenate([np.full((n, 1, 512), 0.8),
                          np.full((n, 1, 512), 0.2)], 1)
    feat = np.concatenate([sdf[:, None, :], rgb, mat], 1).reshape(n, -1)
    return PrimXParams(jnp.asarray(np.concatenate([scale, pos], 1)),
                       jnp.asarray(feat.astype("f")))


def main():
    from topiaxl.pipelines import infer as P

    n_warm = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    params = synthetic_asset()
    for tag in ["cold"] + [f"warm{i}" for i in range(n_warm)]:
        tm = {}
        t0 = time.perf_counter()
        P.extract_glb(params, f"/tmp/topiaxl_prof_{tag}", mc_resolution=256,
                      decimate=100000, texture_size=1024, batch_size=32768,
                      pos_scale=1.0, timings_out=tm)
        total = time.perf_counter() - t0
        print(tag, round(total, 2), json.dumps(tm), flush=True)


if __name__ == "__main__":
    main()
