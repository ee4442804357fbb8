"""Device-op trace of the stage-2 band refine + texture bake queries —
the two dominant device phases of extract_glb (2.9 s + 1.4 s warm).
Prints top HLO ops so the gather / top_k / fallback split is visible.

Run on the TPU: python benchmarks/profile_sdf_refine.py
"""
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def aggregate(logdir, label, n_top=12):
    from xprof.convert.raw_to_tool_data import xspace_to_tool_data

    paths = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    data, _ = xspace_to_tool_data(paths, "hlo_stats^", {})
    if isinstance(data, bytes):
        data = data.decode()
    d = json.loads(data)
    if isinstance(d, list):
        d = d[0]
    cols = [c.get("label") for c in d["cols"]]
    ic = cols.index("HLO op category")
    it = cols.index("Total self time (us)")
    iname = cols.index("HLO op name")
    rows = []
    for r in d["rows"]:
        v = [(c or {}).get("v") for c in r["c"]]
        rows.append((float(v[it] or 0), v[ic], v[iname]))
    rows.sort(reverse=True)
    tot = sum(r[0] for r in rows)
    print(f"\n== {label}: device total {tot/1e3:.1f} ms ==")
    for t, cat, name in rows[:n_top]:
        print(f"  {t/1e3:8.2f} ms {100*t/tot:5.1f}%  {cat:24s} {name}")
    agg = {}
    for t, cat, _ in rows:
        agg[cat] = agg.get(cat, 0.0) + t
    for cat, t in sorted(agg.items(), key=lambda kv: -kv[1])[:8]:
        print(f"  [cat] {cat:28s} {t/1e3:8.2f} ms {100*t/tot:5.1f}%")


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from profile_stage2 import synthetic_asset

    from topiaxl.pipelines import infer as P

    params = synthetic_asset()

    # warm both paths once (compile + first run)
    tm = {}
    grid = P.sdf_grid(params, 256, prim_shape=8, dim_feat=6, timings=tm)
    print("warmup sdf_grid timings:", json.dumps(tm))

    logdir = "/tmp/topiaxl_refine_trace"
    os.system(f"rm -rf {logdir}")
    tm = {}
    with jax.profiler.trace(logdir):
        grid = P.sdf_grid(params, 256, prim_shape=8, dim_feat=6, timings=tm)
        print("traced sdf_grid timings:", json.dumps(tm))
    aggregate(logdir, "sdf_grid (coarse+refine)")

    # the texture-bake query at its real shape: 2048^2 texels w/ ssaa off,
    # masked to ~40% occupancy -> ~1.7M pts; approximate with 1.6M
    from topiaxl.models import primx as primx_lib

    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-0.8, 0.8, (1 << 18, 3)).astype("f"))
    q = primx_lib.query(params, pts, dim_feat=6, prim_shape=8, top_k=16,
                        with_fallback=False, outputs=("tex", "mat"),
                        selector="approx")
    jax.block_until_ready(q)
    float(jnp.sum(q["tex"]))
    logdir2 = "/tmp/topiaxl_bake_trace"
    os.system(f"rm -rf {logdir2}")
    with jax.profiler.trace(logdir2):
        q = primx_lib.query(params, pts, dim_feat=6, prim_shape=8, top_k=16,
                            with_fallback=False, outputs=("tex", "mat"),
                            selector="approx")
        float(jnp.sum(q["tex"]))
    aggregate(logdir2, "bake query (262k pts, tex+mat, approx)")


if __name__ == "__main__":
    main()
