#!/usr/bin/env python3
"""Index-maintenance decision CLI — the operational face of the retrain
loop (r11 verdict task 3): point it at a LIVE versioned IVFPQ artifact
(plans/similarity_queries.py::ann_index_train's output directory) and it

1. loads the current snapshot's per-vector parts (``ann_index_load``),
2. computes the health report (``ann_index_stats_from_parts`` — per
   cell: population, corpus share, max single-PQ-code concentration),
3. runs the policy (``operators/similarity.py::ann_retrain_decision``)
   with the measured append/retrain cost split, and
4. prints ONE JSON line: ``{"decision": "append"|"retrain", ...}`` plus
   the artifact version and encoding regime — ready for a cron wrapper
   that calls ``ann_index_train`` when the answer is "retrain".

Usage::

    python scripts/ann_maintain.py <table_dir> [threshold]

``threshold`` defaults to 0.5 (see SCALE.md "Retrain policy" for the
measured healthy/drifted bands).  Exit code 0 = append, 2 = retrain —
scriptable either way.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 1
    table_dir = sys.argv[1]
    threshold = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from data_pipelines_using_llm_spark.operators.similarity import (
        ann_retrain_decision,
    )
    from data_pipelines_using_llm_spark.plans.similarity_queries import (
        ann_index_load,
        ann_index_meta,
        ann_index_stats_from_parts,
    )
    from data_pipelines_using_llm_spark.sinks.versioned import (
        current_version,
    )

    cells, _icents, codes, _pqcents = ann_index_load(spark, table_dir)
    report = ann_retrain_decision(
        ann_index_stats_from_parts(cells, codes),
        concentration_threshold=threshold,
        # the committed sf0.1 split (SCALE.md "Incremental extension");
        # re-measure per deployment for real cost accounting
        append_cost_s=1.28,
        retrain_cost_s=2.73,
    )
    report["version"] = current_version(table_dir)
    report["residual"] = ann_index_meta(spark, table_dir)["residual"]
    print(json.dumps(report))
    spark.stop()
    return 2 if report["decision"] == "retrain" else 0


if __name__ == "__main__":
    sys.exit(main())
