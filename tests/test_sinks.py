"""Sink-module tests: partitioned writes, schema alignment, idempotent
upsert (re-run stability — the H3 hazard at the sink level), compaction."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_pipelines_using_llm_spark.sinks import (
    align_to_schema,
    compact_table,
    ensure_table,
    idempotent_upsert,
    write_table,
)


@pytest.fixture()
def feed(spark):
    return spark.createDataFrame(
        [
            (dt.datetime(2025, 1, 1, h), float(h), dt.date(2025, 1, 1))
            for h in range(6)
        ],
        "event_time timestamp, pm10 double, ingestion_date date",
    )


def test_partitioned_append_write(spark, feed, tmp_path):
    path = str(tmp_path / "bronze")
    write_table(feed, path, partition_by=["ingestion_date"])
    write_table(
        feed.withColumn("ingestion_date", F.lit(dt.date(2025, 1, 2))),
        path,
        partition_by=["ingestion_date"],
    )
    assert os.path.isdir(path + "/ingestion_date=2025-01-01")
    assert os.path.isdir(path + "/ingestion_date=2025-01-02")
    back = spark.read.parquet(path)
    assert back.count() == 12
    # partition pruning surface: filter on the partition key reads one dir
    assert back.filter("ingestion_date = DATE'2025-01-02'").count() == 6


def test_overwrite_mode(spark, feed, tmp_path):
    path = str(tmp_path / "t")
    write_table(feed, path, mode="overwrite")
    write_table(feed.limit(2), path, mode="overwrite")
    assert spark.read.parquet(path).count() == 2


def test_ensure_table_ddl(spark, feed, tmp_path):
    path = str(tmp_path / "ddl_table")
    write_table(feed, path)
    schema = T.StructType(
        [
            T.StructField("event_time", T.TimestampType()),
            T.StructField("pm10", T.DoubleType()),
            T.StructField("ingestion_date", T.DateType()),
        ]
    )
    ensure_table(spark, "t_ddl_test", schema, path)
    assert spark.catalog.tableExists("t_ddl_test")
    ensure_table(spark, "t_ddl_test", schema, path)  # idempotent no-op
    assert spark.table("t_ddl_test").count() == 6
    spark.sql("DROP TABLE t_ddl_test")


def test_align_to_schema(spark):
    df = spark.createDataFrame(
        [(1, 2.5, "x")], "id int, avg_pm double, extra string"
    )
    target = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("pm_avg", T.DoubleType()),
            T.StructField("added_later", T.StringType()),
        ]
    )
    out = align_to_schema(df, target, rename_map={"avg_pm": "pm_avg"})
    assert out.columns == ["id", "pm_avg", "added_later"]
    row = out.first()
    assert row.pm_avg == 2.5 and row.added_later is None
    assert out.schema["id"].dataType == T.LongType()  # cast applied

    with pytest.raises(ValueError):
        align_to_schema(df, target, rename_map={"avg_pm": "pm_avg"},
                        strict_extra=True)


def test_idempotent_upsert_rerun_stable(spark, feed, tmp_path):
    path = str(tmp_path / "silver")
    idempotent_upsert(spark, feed, path, key=["event_time"])
    assert spark.read.parquet(path).count() == 6

    # re-run the SAME batch: count must not change (no double-append)
    idempotent_upsert(spark, feed, path, key=["event_time"])
    assert spark.read.parquet(path).count() == 6

    # overlapping new batch: hours 3..8, updated values win for overlap
    batch2 = spark.createDataFrame(
        [
            (dt.datetime(2025, 1, 1, h), float(100 + h), dt.date(2025, 1, 2))
            for h in range(3, 9)
        ],
        "event_time timestamp, pm10 double, ingestion_date date",
    )
    idempotent_upsert(spark, batch2, path, key=["event_time"])
    back = spark.read.parquet(path)
    assert back.count() == 9
    assert back.filter("event_time = TIMESTAMP'2025-01-01 04:00:00'").first().pm10 == 104.0


def test_compact_table(spark, feed, tmp_path):
    path = str(tmp_path / "many_files")
    write_table(feed.repartition(6), path)
    n_before = len([f for f in os.listdir(path) if f.startswith("part-")])
    compact_table(spark, path, zorder_by=["event_time"], target_partitions=1)
    n_after = len([f for f in os.listdir(path) if f.startswith("part-")])
    assert n_after < n_before
    assert spark.read.parquet(path).count() == 6


def test_bucketed_join_has_no_shuffle(spark):
    """Co-located bucketed join: both sides bucketed on the key with the
    same bucket count => sort-merge join with NO exchange in the plan."""
    import contextlib
    import io

    from data_pipelines_using_llm_spark.sinks import write_bucketed
    from data_pipelines_using_llm_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    orders = load_table(spark, sf, "orders")
    customer = load_table(spark, sf, "customer")
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        write_bucketed(orders, "t_orders_b", ["o_custkey"], n_buckets=4)
        write_bucketed(
            customer.withColumnRenamed("c_custkey", "o_custkey"),
            "t_customer_b",
            ["o_custkey"],
            n_buckets=4,
        )
        # force a shuffle join so bucketing (not broadcast) is what's tested
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("t_orders_b").join(spark.table("t_customer_b"), "o_custkey")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        assert joined.count() == orders.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_customer_b")
