"""Parse an xprof trace dir into a top-ops table (no TensorBoard UI).

Usage: python benchmarks/xprof_report.py /tmp/topiaxl_dit_trace [n_rows]
Shared by profile_dit_trace / profile_train_trace via report().
"""
import glob
import json
import sys


def _rows(data):
    """gviz DataTable JSON (possibly wrapped in a list) -> (cols, rows)."""
    if isinstance(data, bytes):
        data = data.decode("utf-8", "replace")
    if isinstance(data, str):
        data = json.loads(data)
    if isinstance(data, list):
        data = data[0]
    cols = [c.get("label") or c.get("id") for c in data["cols"]]
    rows = [[(c or {}).get("v") for c in r["c"]] for r in data.get("rows", [])]
    return cols, rows


def report(logdir: str, n: int = 30):
    paths = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    assert paths, f"no xplane under {logdir}"
    from xprof.convert.raw_to_tool_data import xspace_to_tool_data

    for tool in ("framework_op_stats", "hlo_stats"):
        try:
            data, _ = xspace_to_tool_data(paths, f"{tool}^", {})
            cols, rows = _rows(data)
        except Exception as e:
            print(f"[{tool}] failed: {e!r}")
            continue
        # keep the informative columns only
        want = [i for i, c in enumerate(cols)
                if any(k in str(c).lower() for k in (
                    "category", "type", "name", "occur", "time", "%",
                    "flop", "bandwidth", "self"))]
        print(f"\n===== {tool} ({len(rows)} rows) =====")
        print(" | ".join(str(cols[i])[:28] for i in want))
        for r in rows[:n]:
            print(" | ".join(str(r[i])[:60] for i in want))


if __name__ == "__main__":
    report(sys.argv[1] if len(sys.argv) > 1 else "/tmp/topiaxl_dit_trace",
           int(sys.argv[2]) if len(sys.argv) > 2 else 30)
