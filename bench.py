#!/usr/bin/env python3
"""Headline benchmark: runs the engine's flagship queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line.

Per-query timing wraps the full plan→execute→count cycle (the reference's
fetch/transform/aggregate/write instrumentation shape,
``Second Experiment/Claude Opus 4.py:43-52``, with values actually
recorded this time).
"""

from __future__ import annotations

import json
import os
import sys
import time

HEADLINE = [
    # relational / medallion core
    "q1_pricing_summary",
    "region_revenue",
    "monthly_sales_gold",
    "top_events_per_user",
    "latest_event_per_user_type",
    "merged_orders_silver",
    "shipping_priority",
    "local_supplier_volume",
    "user_sessions_batch",
    "quality_report_events",
    "monthly_event_gold",
    "revenue_rollup",
    "nation_trade_matrix",
    "signup_activation",
    "nation_market_share",
    "returned_item_customers",
    "customer_order_histogram",
    "large_volume_customers",
    "value_trend_slope",
    "nation_year_profit",
    "top_revenue_supplier",
    # behavior analytics
    "purchase_funnel",
    "cohort_retention_daily",
    "hourly_anomalies",
    "customer_rfm_segments",
    # training-data operators: dedup / text / similarity / multimodal / llm
    "training_corpus_prep",
    "dedup_exact_docs",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_fuzzy_blocked",
    "llm_summarize_docs",
    "llm_summarize_cached",
    "doc_quality_scores",
    "doc_fingerprints",
    "knn_brute_force",
    "knn_arrow",
    "knn_lsh",
    "kmeans_clusters",
    "dedup_components",
    "dedup_survivors",
    "value_outliers",
    "media_decode_stats",
    # streaming
    "stream_hourly_counts",
    "stream_click_purchase_join",
]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from data_pipelines_using_llm_spark.registry import all_queries
    from data_pipelines_using_llm_spark.session import get_spark

    spark = get_spark("bench")
    registry = all_queries()
    names = [n for n in HEADLINE if n in registry]
    # Warm the JVM + parquet footers once so timings measure the queries.
    registry[names[0]].fn(spark, sf_dir).count()

    from data_pipelines_using_llm_spark.operators.caching import release_barriers

    # Each query is timed as the MIN of two complete runs with persisted
    # intermediates released in between: a single-shot timing on a shared
    # host conflates the query with whatever else the machine is doing
    # (observed 3x swings between identical runs), while min-of-2 reports
    # reproducible engine cost.  Plans and caches are identical per run.
    # When even the two runs disagree wildly (>1.5x — noise or first-shape
    # JVM codegen warmup), ONE extra run breaks the tie; the extra cost is
    # paid only by the noisy queries.
    timings: dict[str, float] = {}
    t_all = time.perf_counter()
    for name in names:
        runs: list[float] = []
        for _ in range(2):
            t0 = time.perf_counter()
            df = registry[name].fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
            release_barriers()
        if max(runs) / max(min(runs), 1e-9) > 1.5:
            t0 = time.perf_counter()
            registry[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(time.perf_counter() - t0)
            release_barriers()
        timings[name] = round(min(runs), 4)
    total = round(sum(timings.values()), 4)
    wall = round(time.perf_counter() - t_all, 4)

    # Per-stage medallion instrumentation — the reference's
    # fetch/transform/aggregate/write timing shape
    # (Second Experiment/Claude Opus 4.py:43-52), values recorded this time.
    import tempfile

    from data_pipelines_using_llm_spark.plans.pipelines import (
        monthly_event_gold,
        silver_events,
    )
    from data_pipelines_using_llm_spark.sources.tables import load_table

    stages: dict[str, float] = {}
    t0 = time.perf_counter()
    load_table(spark, sf_dir, "events").write.format("noop").mode("overwrite").save()
    stages["fetch"] = round(time.perf_counter() - t0, 4)
    t0 = time.perf_counter()
    silver_events(spark, sf_dir).write.format("noop").mode("overwrite").save()
    stages["transform"] = round(time.perf_counter() - t0, 4)
    t0 = time.perf_counter()
    gold = monthly_event_gold(spark, sf_dir)
    gold.write.format("noop").mode("overwrite").save()
    stages["aggregate"] = round(time.perf_counter() - t0, 4)
    t0 = time.perf_counter()
    with tempfile.TemporaryDirectory() as tmp:
        gold.write.mode("overwrite").parquet(f"{tmp}/gold")
    stages["write"] = round(time.perf_counter() - t0, 4)

    # Scale curvature: re-run a probe set at sf0.01 so the 10x growth
    # factor (shuffle growth, skew) is a recorded number per round, not an
    # assertion.  Sub-linear ratios (<10) mean fixed overhead still
    # dominates at sf0.1; ratios >10 flag a super-linear operator.
    scale: dict[str, dict[str, float]] = {}
    probe_dir = "/root/testdata/sf0.01"
    if os.path.isdir(probe_dir) and os.path.realpath(probe_dir) != os.path.realpath(
        sf_dir
    ):
        probes = [
            "q1_pricing_summary",
            "nation_trade_matrix",
            "user_sessions_batch",
            "dedup_minhash_lsh",
            "knn_lsh",
        ]
        for name in probes:
            if name not in registry:
                continue
            t0 = time.perf_counter()
            registry[name].fn(spark, probe_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            small = round(time.perf_counter() - t0, 4)
            big = timings.get(name)
            scale[name] = {
                "sf0.01": small,
                "ratio": round(big / small, 2) if big and small else None,
            }
        release_barriers()

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "timing": "per-query min of 2 runs (sum reported)",
                "wall_sec": wall,
                "queries": timings,
                "stages": stages,
                "scale_probe": scale,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
