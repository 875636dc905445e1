"""Multi-batch streaming semantics: watermark advancement and late-data
eviction across micro-batches (the single-file oracle queries process one
batch, so they can't observe these; this test builds a 4-file stream with
maxFilesPerTrigger=1).

Note the one-batch lag: the watermark a micro-batch APPLIES is computed
from data at least one committed batch earlier, so the late row arrives
two batches after the event time that advances the watermark past it.
"""

from __future__ import annotations

import datetime as dt
import os
import time

from pyspark.sql import functions as F


def _write_batch(spark, path: str, rows, mtime: int) -> None:
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    df.coalesce(1).write.mode("overwrite").parquet(path)
    for f in os.listdir(path):
        os.utime(os.path.join(path, f), (mtime, mtime))


def test_watermark_drops_late_rows_across_batches(spark, tmp_path):
    base = dt.datetime(2024, 1, 1, 10, 0)
    root = tmp_path / "stream"
    now = int(time.time())
    # batch 1: two rows in the 10:00 window
    _write_batch(
        spark,
        str(root / "b1"),
        [(1, base, 1.0), (2, base + dt.timedelta(minutes=30), 1.0)],
        now - 400,
    )
    # batches 2+3: rows at ~20:00 — advance the watermark to 19:55
    _write_batch(
        spark,
        str(root / "b2"),
        [(3, base + dt.timedelta(hours=10), 1.0)],
        now - 300,
    )
    _write_batch(
        spark,
        str(root / "b3"),
        [(5, base + dt.timedelta(hours=10, minutes=5), 1.0)],
        now - 200,
    )
    # batch 4: LATE row at 10:31 — far below the applied watermark, dropped
    _write_batch(
        spark,
        str(root / "b4"),
        [(4, base + dt.timedelta(minutes=31), 99.0)],
        now - 100,
    )

    sdf = (
        spark.readStream.schema("event_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{root}/*")
    )
    agg = (
        sdf.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .select(F.col("w.start").alias("window_start"), "n", "s")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("t_watermark_late")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(300)
    finally:
        q.stop()

    out = {
        r["window_start"]: (r["n"], r["s"])
        for r in spark.table("t_watermark_late").collect()
    }
    # the 10:00 window finalized with exactly the two on-time rows; the
    # late row (value 99) was evicted by the watermark and must not appear
    assert out[base] == (2, 2.0), out
    # the 20:00 window never crossed the watermark -> not emitted in append
    assert base + dt.timedelta(hours=10) not in out


def test_streaming_medallion_idempotent_rerun(spark, tmp_path):
    """Streaming bronze -> silver via ``stream_silver_upsert`` (foreachBatch
    + idempotent upsert — the streaming answer to the reference's
    double-append hazard, SURVEY.md section 4.3.6).  A replayed run
    (fresh checkpoint, same data — the at-least-once failure mode) must
    leave silver stable; a rerun with the SAME checkpoint must skip the
    source entirely and also change nothing."""
    from data_pipelines_using_llm_spark.sources.tables import load_table
    from data_pipelines_using_llm_spark.streaming.ingest import stream_silver_upsert

    sf_dir = "/root/testdata/sf0.001"
    silver = str(tmp_path / "silver")
    stream_silver_upsert(spark, sf_dir, silver, str(tmp_path / "cp1"))
    expected = load_table(spark, sf_dir, "events").count()
    first = spark.read.parquet(silver)
    assert first.count() == expected
    assert first.select("event_id").distinct().count() == expected

    # replay with a fresh checkpoint: same keys arrive again -> upsert
    stream_silver_upsert(spark, sf_dir, silver, str(tmp_path / "cp2"))
    second = spark.read.parquet(silver)
    assert second.count() == expected

    # rerun with an existing checkpoint: source replays nothing
    stream_silver_upsert(spark, sf_dir, silver, str(tmp_path / "cp1"))
    assert spark.read.parquet(silver).count() == expected


def test_mixed_ts_precision_probe_fails_loudly(tmp_path):
    """A directory where some files store ts as TIMESTAMP(NANOS) and others
    as TIMESTAMP(MICROS) cannot be read under one static stream schema —
    the probe must reject it instead of silently scaling one set by 1000x."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from data_pipelines_using_llm_spark.streaming.ingest import _probe_ts_precision

    t0 = dt.datetime(2024, 1, 1, 10, 0)
    for name, unit in [("events_a.parquet", "ns"), ("events_b.parquet", "us")]:
        tbl = pa.table({"ts": pa.array([t0], type=pa.timestamp(unit))})
        pq.write_table(tbl, str(tmp_path / name), coerce_timestamps=None)

    # uniform subsets are fine, and report their precision
    assert _probe_ts_precision(str(tmp_path), "events_a.parquet") is True
    assert _probe_ts_precision(str(tmp_path), "events_b.parquet") is False
    with pytest.raises(ValueError, match="mixed ts precision"):
        _probe_ts_precision(str(tmp_path), "events_*.parquet")


def test_transform_with_state_engagement(spark):
    """transformWithStateInPandas composite state (ValueState + MapState)
    must equal the batch aggregate on bounded input.  Environment-gated:
    the API's Python state-server protocol needs protobuf, absent in this
    sandbox (pip has no network) — same discipline as the Delta skip."""
    import pytest

    from data_pipelines_using_llm_spark.streaming.stream_queries import (
        tws_available,
    )

    if not tws_available():
        pytest.skip("protobuf not installed - transformWithState worker cannot start")

    from tests.oracle_check import run_check

    problems = run_check(spark, "/root/testdata/sf0.001", "stream_user_engagement_tws")
    assert not problems, problems
