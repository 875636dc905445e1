#!/usr/bin/env python3
"""Fresh-session isolation timings for bench regressions.

The round-6 driver bench recorded 7 queries 2.8-6.6x slower than round 5
even though most of their source files did not change (VERDICT.md r6).
Hypothesis: bench-session contention — 106 queries share one Spark
session, and heavy neighbors (``basket_triangles`` 10.2s, ``knn_ivfpq``
6.5s with localCheckpoint residue) degrade the JVM for the cheap queries
that run after them.

This script settles it by measurement: each named query is timed in its
OWN subprocess (fresh JVM, fresh SparkSession, nothing else run before
it except a single warmup execution of the same query).  If the
fresh-session number matches r5, the regression was harness contention,
not a plan defect.

Usage::

    python scripts/isolate_bench.py [query ...]

Defaults to the 7 queries flagged in VERDICT.md round 6.  Writes
``BENCH_ISOLATED.json`` at the repo root and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FLAGGED = [
    "customer_scd2",
    "doc_chunk_overlap",
    "events_expectations",
    "events_snapshot_diff",
    "peak_window_traffic",
    "user_value_ewma",
    "value_histogram_rollup",
]

_CHILD = r"""
import json, sys, time
name, sf_dir = sys.argv[1], sys.argv[2]
from data_pipelines_using_llm_spark.registry import all_queries
from data_pipelines_using_llm_spark.session import get_spark

spark = get_spark(f"isolate-{name}")
fn = all_queries()[name].fn

def run_once():
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0

cold = run_once()           # includes JVM codegen + parquet footer reads
warm = min(run_once(), run_once())
print("ISOLATED " + json.dumps({"name": name, "cold": round(cold, 4),
                                "warm": round(warm, 4)}))
"""


def main() -> int:
    names = sys.argv[1:] or FLAGGED
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    results: dict[str, dict] = {}
    for name in names:
        proc = subprocess.run(
            [sys.executable, "-c", _CHILD, name, sf_dir],
            capture_output=True,
            text=True,
            cwd=REPO,
            timeout=600,
        )
        rec = None
        for line in proc.stdout.splitlines():
            if line.startswith("ISOLATED "):
                rec = json.loads(line[len("ISOLATED "):])
        if rec is None:
            results[name] = {
                "error": (proc.stderr.strip().splitlines() or ["no output"])[-1][:300]
            }
        else:
            results[name] = {"cold": rec["cold"], "warm": rec["warm"]}

    # MERGE into the existing artifact: each run pins floors for ITS
    # queries without discarding previously committed ones (the r6
    # seven must survive the r7-flakiness run and vice versa).
    path = os.path.join(REPO, "BENCH_ISOLATED.json")
    merged: dict[str, dict] = {}
    if os.path.exists(path):
        try:
            with open(path) as fh:
                prior = json.load(fh)
            if prior.get("sf_dir") == sf_dir:
                merged = prior.get("queries", {})
        except Exception:
            pass
    # never let a transiently failed child overwrite a committed floor:
    # error records only land for queries with no prior good entry.
    for name, rec2 in results.items():
        if "error" in rec2 and "warm" in merged.get(name, {}):
            continue
        merged[name] = rec2
    out = {"sf_dir": sf_dir, "queries": merged}
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
