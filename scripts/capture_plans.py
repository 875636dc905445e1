#!/usr/bin/env python3
"""Capture .explain("formatted") output for named registry queries.

Usage: python scripts/capture_plans.py OUTDIR SUFFIX query [query ...]
Writes OUTDIR/<query>_<SUFFIX>.txt.  Used by the optimization rounds to
commit before/after physical plans (the judge checks plan claims against
these files)."""
from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from data_pipelines_using_llm_spark.operators.caching import (
        release_barriers,
    )
    from data_pipelines_using_llm_spark.registry import all_queries
    from data_pipelines_using_llm_spark.session import get_spark

    spark = get_spark("capture-plans")
    registry = all_queries()
    for name in names:
        if name not in registry:
            print(f"SKIP {name}", file=sys.stderr)
            continue
        df = registry[name].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        release_barriers()
        try:
            spark.catalog.clearCache()
        except Exception:
            pass
        print(f"wrote {name}_{suffix}.txt ({len(plan)} bytes)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
