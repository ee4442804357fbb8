"""Flat (8x narrow takes) vs rows (4x wide takes) gather for the field
query, at the two stage-2 shapes that dominate device time:
  - band refine: ~2.2M pts, sdf-only (C=1), cand_idx per cell
  - texture bake: ~1.6M pts, tex+mat (C=5), approx selector
Also times the uncovered-point fallback on/off for the refine shape.

Run on the TPU: python benchmarks/exp_gather_rows.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from topiaxl.models import primx as primx_lib


def timeit(f, n=3):
    out = f()
    jax.block_until_ready(out)
    float(jnp.sum(out[next(iter(out))]).astype(jnp.float32))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = f()
        float(jnp.sum(out[next(iter(out))]).astype(jnp.float32))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    rng = np.random.default_rng(0)
    n = 2048
    srt = np.concatenate([
        np.full((n, 1), 0.07, "f"),
        (rng.standard_normal((n, 3)) * 0.4).astype("f"),
    ], 1).astype("f")
    feat = rng.standard_normal((n, 6 * 512)).astype("f")
    params = primx_lib.PrimXParams(jnp.asarray(srt), jnp.asarray(feat))

    P = 1 << 21  # 2.1M refine-like points
    pts = jnp.asarray(rng.uniform(-0.9, 0.9, (P, 3)).astype("f"))
    cand = jnp.asarray(rng.integers(0, n, (P, 16)).astype("i4"))

    # chunked like the real pipeline (one 2M-point jit OOMs: [P*K,3]
    # f32 pads 42x on TPU tiles)
    for gather in ("flat", "rows"):
        for fb in (True, False):
            t = timeit(lambda: primx_lib.query_chunked(
                params, pts, chunk=32768, dim_feat=6, prim_shape=8,
                with_fallback=fb, outputs=("sdf",),
                cand_idx=cand, gather=gather))
            print(f"refine C=1 gather={gather} fallback={int(fb)}: "
                  f"{t:7.3f} s ({P/t/1e6:.1f} Mpts/s)", flush=True)

    Pb = 1 << 20  # 1M bake-like points
    ptsb = jnp.asarray(rng.uniform(-0.9, 0.9, (Pb, 3)).astype("f"))
    for gather in ("flat", "rows"):
        t = timeit(lambda: primx_lib.query_chunked(
            params, ptsb, chunk=32768, dim_feat=6, prim_shape=8, top_k=16,
            with_fallback=False, outputs=("tex", "mat"),
            selector="approx", gather=gather))
        print(f"bake  C=5 gather={gather} approx: {t:7.3f} s "
              f"({Pb/t/1e6:.1f} Mpts/s)", flush=True)


if __name__ == "__main__":
    main()
