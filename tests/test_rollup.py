"""Incremental rollup maintenance: batch-by-batch folding must equal a
from-scratch recompute bit-for-bit, and replays must be no-ops."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from data_pipelines_using_llm_spark.sinks.rollup import (
    incremental_rollup,
    read_rollup,
    rollup_batch,
)

SCHEMA = "event_time timestamp, value double, year int, month int"


def _batch(spark, month: int, hours: range, base: float):
    return spark.createDataFrame(
        [
            (dt.datetime(2025, month, 1, h % 24), base + h, 2025, month)
            for h in hours
        ],
        SCHEMA,
    )


def test_incremental_equals_recompute(spark, tmp_path):
    path = str(tmp_path / "gold")
    batches = [
        _batch(spark, 1, range(0, 10), 1.25),
        _batch(spark, 1, range(10, 16), 2.50),  # same month again
        _batch(spark, 2, range(0, 8), 7.75),
    ]
    for i, b in enumerate(batches):
        incremental_rollup(
            spark, b, path, keys=["year", "month"], sum_cols=["value"],
            batch_id=f"b{i}",
        )

    full = batches[0].unionByName(batches[1]).unionByName(batches[2])
    expect = {
        (r["year"], r["month"]): (r["n"], r["s"])
        for r in full.groupBy("year", "month")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("s"),
        )
        .collect()
    }
    got = {
        (r["year"], r["month"]): (r["n_rows"], r["sum_value"])
        for r in read_rollup(spark, path, ["value"]).collect()
    }
    assert got == expect  # bit-exact: decimal folding is order-independent
    avg = {
        (r["year"], r["month"]): r["avg_value"]
        for r in read_rollup(spark, path, ["value"]).collect()
    }
    for k, (n, s) in expect.items():
        assert avg[k] == s / n


def test_replayed_batch_is_noop(spark, tmp_path):
    path = str(tmp_path / "gold2")
    b = _batch(spark, 3, range(0, 5), 4.0)
    for _ in range(3):  # at-least-once delivery of the same batch
        incremental_rollup(
            spark, b, path, keys=["year", "month"], sum_cols=["value"],
            batch_id="the-batch",
        )
    rows = read_rollup(spark, path, ["value"]).collect()
    assert len(rows) == 1 and rows[0]["n_rows"] == 5


def test_rollup_batch_is_partial_aggregate(spark):
    b = _batch(spark, 4, range(0, 6), 1.0)
    out = rollup_batch(b, ["year", "month"], ["value"])
    assert out.columns == ["year", "month", "n_rows", "sum_value"]
    assert out.count() == 1
