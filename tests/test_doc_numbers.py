"""Doc-number lint (VERDICT r4 item 3): every headline number published
in README.md / docs/*.md must match the latest bench measurement.

Mechanism: docs annotate a number with an HTML comment immediately after
it — ``**25.5 /s**<!--bench:dit_denoise_steps_per_sec tol=0.05-->`` —
and this fast-tier test asserts each annotated value against the latest
bench record (runs_meta/bench_latest.json, written by bench.py; falls
back to the newest driver-captured BENCH_r*.json). Round 4 shipped two
"docs truth-sync" commits and still left a 2x-stale e2e latency in
SERVING.md — hence mechanical, not by hand.
"""

import glob
import json
import os
import re

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# number, then up to ~100 chars of unit/markup (no digits beyond an
# optional exponent), then the marker comment
_CLAIM = re.compile(
    r"(\d+(?:\.\d+)?)[^\d<]{0,100}<!--bench:([A-Za-z0-9_.]+)"
    r"(?:\s+tol=(\d+(?:\.\d+)?))?-->")

_DEFAULT_TOL = 0.05


def _latest_bench() -> dict:
    p = os.path.join(ROOT, "runs_meta", "bench_latest.json")
    if os.path.exists(p):
        with open(p) as f:
            rec = json.load(f)["result"]
    else:
        rounds = sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json")))
        if not rounds:
            pytest.skip("no bench record to lint against")
        with open(rounds[-1]) as f:
            rec = json.load(f)["parsed"]
    # the headline metric is stored as metric/value keys — promote it to
    # a named field so docs can annotate it like any other
    if "metric" in rec and "value" in rec:
        rec = dict(rec)
        rec.setdefault(rec["metric"], rec["value"])
    return rec


def _doc_files():
    files = [os.path.join(ROOT, "README.md")]
    files += sorted(glob.glob(os.path.join(ROOT, "docs", "*.md")))
    return [p for p in files if os.path.exists(p)]


def _lookup(bench: dict, dotted: str):
    cur = bench
    for part in dotted.split("."):
        if not isinstance(cur, dict) or part not in cur:
            return None
        cur = cur[part]
    return cur


def test_doc_numbers_match_latest_bench():
    bench = _latest_bench()
    errors = []
    n_claims = 0
    for path in _doc_files():
        with open(path) as f:
            text = f.read()
        rel = os.path.relpath(path, ROOT)
        for m in _CLAIM.finditer(text):
            n_claims += 1
            claimed = float(m.group(1))
            field = m.group(2)
            tol = float(m.group(3)) if m.group(3) else _DEFAULT_TOL
            actual = _lookup(bench, field)
            line = text[:m.start()].count("\n") + 1
            if actual is None:
                errors.append(
                    f"{rel}:{line} claims {claimed} for bench field "
                    f"'{field}' which is absent from the latest record")
                continue
            actual = float(actual)
            denom = max(abs(actual), 1e-9)
            if abs(claimed - actual) / denom > tol:
                errors.append(
                    f"{rel}:{line} claims {claimed} for '{field}' but the "
                    f"latest measurement is {actual} "
                    f"(rel dev {abs(claimed - actual) / denom:.1%} > "
                    f"tol {tol:.0%})")
    assert not errors, "stale published numbers:\n" + "\n".join(errors)
    # the lint only covers annotated numbers — guard against silently
    # dropping the annotations themselves
    assert n_claims >= 10, (
        f"only {n_claims} annotated bench claims found across the docs; "
        "headline numbers must carry <!--bench:field--> markers")


def test_doc_marker_fields_resolve():
    """Every marker references a real bench field (typos in the field
    name would otherwise silently pass the value check above via the
    explicit error, but catch them separately for a clearer message)."""
    bench = _latest_bench()
    missing = []
    for path in _doc_files():
        with open(path) as f:
            text = f.read()
        for m in _CLAIM.finditer(text):
            if _lookup(bench, m.group(2)) is None:
                missing.append(f"{os.path.relpath(path, ROOT)}: "
                               f"{m.group(2)}")
    assert not missing, f"markers referencing absent bench fields: {missing}"
