"""Declarative pipeline specs — the archetype pipelines as data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipelines_using_llm_spark.plans.spec import run_pipeline

SF = "/root/testdata/sf0.001"


def test_spec_medallion_archetype_matches_hand_built(spark):
    """The First/Second-experiment archetype (clean -> dedup -> monthly
    aggregate) expressed as a spec must equal the same chain written
    against the operator API directly."""
    from data_pipelines_using_llm_spark.operators.cleaning import (
        dedup_deterministic,
        drop_any_null,
    )
    from data_pipelines_using_llm_spark.sources.tables import load_table

    spec = {
        "source": "events",
        "steps": [
            {"op": "drop_nulls", "cols": ["user_id", "ts", "value"]},
            {
                "op": "dedup",
                "key": ["event_id"],
                "order_by": ["ts desc", "user_id"],
            },
            {"op": "derive", "cols": {"month": "date_trunc('month', ts)"}},
            {
                "op": "aggregate",
                "group_by": ["event_type", "month"],
                "metrics": {
                    "n_events": "count(1)",
                    "sum_value": (
                        "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)"
                    ),
                },
            },
        ],
    }
    got = run_pipeline(spark, spec, sf_dir=SF)

    e = load_table(spark, SF, "events")
    e = drop_any_null(e, ["user_id", "ts", "value"])
    e = dedup_deterministic(
        e, ["event_id"], [F.col("ts").desc(), F.col("user_id")]
    )
    want = (
        e.withColumn("month", F.date_trunc("month", "ts"))
        .groupBy("event_type", "month")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_spec_join_expect_and_wap_sink(spark, tmp_path):
    """Third-experiment shape: two sources joined, expectation-gated,
    published via WAP — and a failing expectation aborts the pipeline."""
    path = str(tmp_path / "gold")
    spec = {
        "source": "orders",
        "steps": [
            {"op": "select", "cols": ["o_orderkey", "o_custkey", "o_totalprice"]},
            {
                "op": "join",
                "source": "customer",
                "select": ["c_custkey", "c_name"],
                "on": [],
                "how": "inner",
                "broadcast": True,
            },
        ],
        "sink": {
            "path": path,
            "mode": "wap",
            "rules": [{"kind": "not_null", "col": "c_name"}],
        },
    }
    # join on expression list [] is invalid — exercise the loud error
    with pytest.raises(Exception):
        run_pipeline(spark, spec, sf_dir=SF)

    spec["steps"][1]["on"] = [
        "o_custkey"
    ]  # column rename needed: align names first
    spec["steps"].insert(
        1, {"op": "rename", "map": {"o_custkey": "c_custkey"}}
    )
    spec["steps"][2]["on"] = ["c_custkey"]
    out = run_pipeline(spark, spec, sf_dir=SF)
    assert out.count() > 0
    assert spark.read.parquet(path).count() == out.count()

    bad = {
        "source": "orders",
        "steps": [{"op": "derive", "cols": {"c_name": "NULL"}}],
        "sink": {
            "path": path,
            "mode": "wap",
            "rules": [{"kind": "not_null", "col": "c_name"}],
        },
    }
    before = spark.read.parquet(path).count()
    with pytest.raises(ValueError, match="audit failed"):
        run_pipeline(spark, bad, sf_dir=SF)
    assert spark.read.parquet(path).count() == before  # live untouched


def test_spec_unknown_op_and_vocabulary(spark):
    with pytest.raises(ValueError, match="unknown op.*aggregate"):
        run_pipeline(
            spark,
            {"source": "events", "steps": [{"op": "pivot"}]},
            sf_dir=SF,
        )


def test_spec_dedup_requires_total_order(spark):
    with pytest.raises(ValueError, match="order_by"):
        run_pipeline(
            spark,
            {
                "source": "events",
                "steps": [{"op": "dedup", "key": ["event_id"]}],
            },
            sf_dir=SF,
        )


def test_spec_expect_gate_fails_loudly(spark):
    spec = {
        "source": "events",
        "steps": [
            {
                "op": "expect",
                "rules": [
                    {"kind": "in_range", "col": "value", "lo": 0, "hi": 1}
                ],
            }
        ],
    }
    with pytest.raises(ValueError, match="expectations failed"):
        run_pipeline(spark, spec, sf_dir=SF).count()
    # on_fail="report" downgrades the same violation to a pass-through
    spec["steps"][0]["on_fail"] = "report"
    assert run_pipeline(spark, spec, sf_dir=SF).count() > 0


def test_spec_same_spec_batch_equals_streaming(spark):
    """The unification claim, asserted directly: HOURLY_SPEC executed by
    the batch compiler and as a Structured Streaming job produce the
    same rows; non-stateless ops are refused in streaming mode."""
    from data_pipelines_using_llm_spark.plans.spec import (
        HOURLY_SPEC,
        run_pipeline,
        run_pipeline_streaming,
    )

    batch = sorted(
        map(tuple, run_pipeline(spark, HOURLY_SPEC, sf_dir=SF).collect())
    )
    stream = sorted(
        map(
            tuple,
            run_pipeline_streaming(
                spark, HOURLY_SPEC, SF, "t_spec_mode_eq"
            ).collect(),
        )
    )
    assert batch == stream and batch

    unsafe = {
        "source": "events",
        "steps": [{"op": "dedup", "key": ["event_id"], "order_by": ["ts"]}],
    }
    with pytest.raises(ValueError, match="not streaming-safe"):
        run_pipeline_streaming(spark, unsafe, SF, "t_spec_unsafe")


def test_spec_versioned_sink_time_travel(spark, tmp_path):
    from data_pipelines_using_llm_spark.sinks.versioned import (
        list_versions,
        read_version,
    )

    path = str(tmp_path / "vspec")
    spec = {
        "source": "region",
        "steps": [{"op": "select", "cols": ["r_regionkey", "r_name"]}],
        "sink": {"path": path, "mode": "versioned", "keep": 2},
    }
    run_pipeline(spark, spec, sf_dir=SF)
    run_pipeline(spark, spec, sf_dir=SF)
    assert list_versions(path) == [1, 2]
    assert read_version(spark, path, 1).count() == read_version(
        spark, path
    ).count()
