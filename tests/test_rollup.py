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


def test_crash_between_stage_and_swap_recovers(spark, tmp_path, monkeypatch):
    """Fault injection for the worst crash window: the process dies AFTER
    the ledger is staged into the tmp snapshot but BEFORE the swap.  The
    live table must be untouched (no marker, no data change), and a replay
    of the same batch must apply it exactly once — proving the marker
    travels with the snapshot, never ahead of it."""
    from data_pipelines_using_llm_spark.sinks import rollup as R

    path = str(tmp_path / "gold_crash")
    b0 = _batch(spark, 1, range(0, 6), 1.0)
    incremental_rollup(
        spark, b0, path, keys=["year", "month"], sum_cols=["value"], batch_id="b0"
    )
    before = {
        (r["year"], r["month"]): (r["n_rows"], r["sum_value"])
        for r in read_rollup(spark, path, ["value"]).collect()
    }

    real_swap = R._swap_in

    def dying_swap(live, tmp):
        raise OSError("injected kill before swap")

    monkeypatch.setattr(R, "_swap_in", dying_swap)
    b1 = _batch(spark, 1, range(6, 10), 2.0)
    import pytest

    with pytest.raises(OSError, match="injected kill"):
        incremental_rollup(
            spark, b1, path, keys=["year", "month"], sum_cols=["value"],
            batch_id="b1",
        )
    # live state unchanged, b1 NOT marked applied (marker only in tmp)
    assert {
        (r["year"], r["month"]): (r["n_rows"], r["sum_value"])
        for r in read_rollup(spark, path, ["value"]).collect()
    } == before
    assert not R._applied(path, "b1")

    # recovery: replay the batch with the real swap restored
    monkeypatch.setattr(R, "_swap_in", real_swap)
    for _ in range(2):  # at-least-once: second replay must be a no-op
        incremental_rollup(
            spark, b1, path, keys=["year", "month"], sum_cols=["value"],
            batch_id="b1",
        )
    rows = {
        (r["year"], r["month"]): (r["n_rows"], r["sum_value"])
        for r in read_rollup(spark, path, ["value"]).collect()
    }
    assert rows[(2025, 1)][0] == 10  # 6 + 4, applied exactly once
    assert R._applied(path, "b0") and R._applied(path, "b1")


def test_crash_after_swap_makes_replay_noop(spark, tmp_path, monkeypatch):
    """The other crash window: the swap lands but the caller dies before
    acknowledging.  The marker moved WITH the snapshot, so the replay is
    a no-op — the batch cannot double-count."""
    from data_pipelines_using_llm_spark.sinks import rollup as R

    path = str(tmp_path / "gold_crash2")
    b0 = _batch(spark, 2, range(0, 4), 3.0)
    incremental_rollup(
        spark, b0, path, keys=["year", "month"], sum_cols=["value"], batch_id="b0"
    )
    # crash-after-swap == state and marker both present; replay:
    assert R._applied(path, "b0")
    incremental_rollup(
        spark, b0, path, keys=["year", "month"], sum_cols=["value"], batch_id="b0"
    )
    rows = read_rollup(spark, path, ["value"]).collect()
    assert len(rows) == 1 and rows[0]["n_rows"] == 4


def test_value_histogram_rollup_bound_and_merge(spark):
    """The histogram median estimate is within one bucket width of the
    exact median for every type (flag = 1), and daily cells merged by
    addition equal the direct histogram (the stored-state contract)."""
    from pyspark.sql import functions as F

    from data_pipelines_using_llm_spark.plans.analytics import (
        HIST_BUCKETS,
        HIST_STEP_CENTS,
        value_histogram_rollup,
    )
    from data_pipelines_using_llm_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.01"
    out = value_histogram_rollup(spark, sf).collect()
    assert out and all(r["within_bucket"] == 1 for r in out)

    e = load_table(spark, sf, "events").filter(F.col("value").isNotNull())
    bucket = F.least(
        F.expr(
            f"CAST(CAST(value AS DECIMAL(9,2)) * 100 AS BIGINT)"
            f" DIV {HIST_STEP_CENTS}"
        ),
        F.lit(HIST_BUCKETS - 1),
    )
    direct = (
        e.groupBy("event_type", bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    via_daily = (
        e.groupBy(
            "event_type", F.date_trunc("day", "ts").alias("day"),
            bucket.alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("event_type", "bucket")
        .agg(F.sum("n").alias("n"))
        .collect()
    )
    assert sorted(map(tuple, direct)) == sorted(map(tuple, via_daily))


def test_incremental_join_view_matches_full_recompute(spark, tmp_path):
    """Delta-join maintenance must equal the from-scratch join after
    every batch, and a replayed batch id must not double-count."""
    from data_pipelines_using_llm_spark.sinks.rollup import (
        incremental_join_view,
        read_join_view,
    )

    view = str(tmp_path / "jv")
    a0 = spark.createDataFrame([(1, "x"), (2, "y")], "k bigint, va string")
    b0 = spark.createDataFrame([(1, 10), (3, 30)], "k bigint, vb bigint")
    empty_a = a0.limit(0)
    empty_b = b0.limit(0)
    # initialization batch: old sides empty, full tables as deltas
    incremental_join_view(empty_a, empty_b, a0, b0, ["k"], view, "b0")
    got0 = sorted(map(tuple, read_join_view(spark, view).collect()))
    want0 = sorted(map(tuple, a0.join(b0, ["k"]).collect()))
    assert got0 == want0
    # batch 1: both sides append
    da = spark.createDataFrame([(3, "z")], "k bigint, va string")
    db = spark.createDataFrame([(2, 20), (3, 31)], "k bigint, vb bigint")
    incremental_join_view(a0, b0, da, db, ["k"], view, "b1")
    a1, b1 = a0.unionByName(da), b0.unionByName(db)
    got1 = sorted(map(tuple, read_join_view(spark, view).collect()))
    want1 = sorted(map(tuple, a1.join(b1, ["k"]).collect()))
    assert got1 == want1
    # replaying batch 1 overwrites its own directory — no duplicates
    incremental_join_view(a0, b0, da, db, ["k"], view, "b1")
    got1r = sorted(map(tuple, read_join_view(spark, view).collect()))
    assert got1r == want1
