"""Run the `slow`-marked e2e test tier and record the outcome where
bench.py can report it (VERDICT r3 item 7; r4 next-round item 2).

The slow tier (tiny-config image->GLB, CLI train resume, live-reference
fixtures, DINOv2 cross-code parity) is deselected by the default
``-m 'not slow'`` addopts, so without this record nothing proves it ran
in a given round. The result lands in runs_meta/slow_suite.json — a
TRACKED path (runs/ is gitignored, which in r4 meant the record could
never survive to a fresh driver checkout) — together with the git SHA
it was produced at and whether the working tree was dirty; bench.py
embeds it in the bench JSON (marked stale if the source moved past it,
unverifiable if the SHA no longer resolves).

Run: python -m benchmarks.run_slow_suite
"""
import json
import os
import re
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "runs_meta", "slow_suite.json")


def main():
    t0 = time.perf_counter()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-q", "-m", "slow",
         "-p", "no:cacheprovider"],
        cwd=ROOT, capture_output=True, text=True)
    dur = time.perf_counter() - t0
    tail = (proc.stdout or "").strip().splitlines()[-1:] or [""]
    m = re.search(r"(\d+) passed", tail[0])
    passed = int(m.group(1)) if m else 0
    m = re.search(r"(\d+) failed", tail[0])
    failed = int(m.group(1)) if m else 0
    sha = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                         cwd=ROOT, capture_output=True,
                         text=True).stdout.strip()
    # a record produced from a dirty tree can claim at most "HEAD-ish":
    # bench.py downgrades it (ADVICE r4 #2)
    porcelain = subprocess.run(
        ["git", "status", "--porcelain", "--untracked-files=no"],
        cwd=ROOT, capture_output=True, text=True).stdout
    dirty = [ln[3:] for ln in porcelain.splitlines()
             if not ln[3:].startswith(("runs/", "runs_meta/"))]
    rec = {
        "status": "pass" if proc.returncode == 0 and failed == 0 else "fail",
        "passed": passed,
        "failed": failed,
        "duration_s": round(dur, 1),
        "sha": sha,
        "dirty": bool(dirty),
        "summary": tail[0][-160:],
    }
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))
    sys.exit(0 if rec["status"] == "pass" else 1)


if __name__ == "__main__":
    main()
