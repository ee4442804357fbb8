"""Op-level profile of the flagship DiT denoise chain via jax.profiler +
xprof offline parsing (no TensorBoard UI needed). Prints the top HLO ops
by self-time — the ground truth for where the 47 ms CFG step goes.

Run on the TPU:  python benchmarks/profile_dit_trace.py [bf16|int8]
"""
import glob
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

    paths = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    assert paths, f"no xplane under {logdir}"
    from xprof.convert.raw_to_tool_data import xspace_to_tool_data

    for tool in ("framework_op_stats", "hlo_stats"):
        try:
            data, _ = xspace_to_tool_data(paths, f"{tool}^", {})
        except Exception as e:
            print(f"[{tool}] failed: {e!r}")
            continue
        if isinstance(data, bytes):
            data = data.decode("utf-8", "replace")
        lines = str(data).splitlines()
        print(f"\n===== {tool} ({len(lines)} rows) =====")
        for ln in lines[:40]:
            print(ln[:400])


if __name__ == "__main__":
    main()
