"""Op-level profile of the flagship DiT denoise chain via jax.profiler +
xprof offline parsing (no TensorBoard UI needed). Prints the top HLO ops
by self-time — the ground truth for where the 47 ms CFG step goes.

Run on the TPU:  python benchmarks/profile_dit_trace.py [bf16|int8]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

from bench_int8_dit import build  # noqa: E402  (benchmarks/ on sys.path)


def main():
    quant = (sys.argv[1] if len(sys.argv) > 1 else "bf16") == "int8"
    chain, params, x, kvs = build(quant)
    out = chain(params, x, kvs)
    float(out.sum())  # compile + sync

    logdir = "/tmp/topiaxl_dit_trace"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        out = chain(params, out, kvs)
        float(out.sum())

    # same hlo_stats aggregation as profile_sdf_refine.aggregate: top
    # ops by device self-time + per-category totals
    from profile_sdf_refine import aggregate

    aggregate(logdir, f"DiT chain ({'int8' if quant else 'bf16'})",
              n_top=24)


if __name__ == "__main__":
    main()
