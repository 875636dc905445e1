#!/usr/bin/env python3
"""Isolated 3-point scale curves (r8 verdict task 4 / r9 task 6).

The bench's in-session scale probe compares sf0.01 vs sf0.1 inside a
shared, late-session JVM — exactly the measurement the isolation floors
(BENCH_ISOLATED.json) proved can swing 1.5-3x on session state alone.
For queries whose probe ratio exceeded 2x per 10x data, this script
measures the REAL curve: each (query, sf) point runs in its own
subprocess (fresh JVM, one cold warmup + min-of-2 warm), across
sf0.001 / sf0.01 / sf0.1.

A linear operator shows warm-ratio ≈ 10 per decade once data dominates
fixed overhead; sub-second bases are overhead-dominated and a ratio
between 1 and ~4 at the small step with ≤ ~10 at the big step is the
linear signature.  Superlinear terms show up as ratios climbing ACROSS
decades (r2 > r1 with r2 > 10).

Usage::

    python scripts/scale_points.py [query ...]

Defaults to the three r8/r9 flagged queries.  MERGES results into
``SCALE_POINTS.json`` at the repo root and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FLAGGED = [
    "q1_pricing_summary",
    "doc_repetition_signals",
    "nation_trade_matrix",
]

SF_DIRS = {
    "0.001": "/root/testdata/sf0.001",
    "0.01": "/root/testdata/sf0.01",
    "0.1": "/root/testdata/sf0.1",
}

_CHILD = r"""
import json, sys, time
name, sf_dir = sys.argv[1], sys.argv[2]
from data_pipelines_using_llm_spark.registry import all_queries
from data_pipelines_using_llm_spark.session import get_spark

spark = get_spark(f"scalepoint-{name}")
fn = all_queries()[name].fn

def run_once():
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0

cold = run_once()
warm = min(run_once(), run_once())
print("POINT " + json.dumps({"cold": round(cold, 4), "warm": round(warm, 4)}))
"""


def main(names: list[str]) -> None:
    out_path = os.path.join(REPO, "SCALE_POINTS.json")
    try:
        with open(out_path) as fh:
            merged = json.load(fh)
    except Exception:
        merged = {}
    for name in names:
        curve: dict[str, dict] = {}
        for sf, sf_dir in SF_DIRS.items():
            # Per-point failure isolation (r10 ADVICE): a crashing child
            # must leave a NAMED error in the curve, not a silent gap,
            # and a hung point must not abort the sweep and discard the
            # queries already measured before the merge/write.
            try:
                proc = subprocess.run(
                    [sys.executable, "-c", _CHILD, name, sf_dir],
                    capture_output=True,
                    text=True,
                    cwd=REPO,
                    timeout=900,
                )
            except subprocess.TimeoutExpired:
                curve[sf] = {"error": "timeout after 900s"}
                continue
            got = None
            for line in proc.stdout.splitlines():
                if line.startswith("POINT "):
                    got = json.loads(line[len("POINT "):])
            if got is None:
                tail = (proc.stderr.strip().splitlines() or ["no output"])[-1]
                curve[sf] = {
                    "error": f"rc={proc.returncode}: {tail[:300]}"
                }
            else:
                curve[sf] = got
        if {"0.001", "0.01", "0.1"} <= set(curve) and all(
            "warm" in curve[sf] for sf in ("0.001", "0.01", "0.1")
        ):
            curve["ratio_001_to_01"] = round(
                curve["0.01"]["warm"] / curve["0.001"]["warm"], 2
            )
            curve["ratio_01_to_1"] = round(
                curve["0.1"]["warm"] / curve["0.01"]["warm"], 2
            )
        merged[name] = curve
    with open(out_path, "w") as fh:
        json.dump(merged, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps({"scale_points": merged}))


if __name__ == "__main__":
    main(sys.argv[1:] or FLAGGED)
