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


def test_gold_rollup_replay_after_crash_is_byte_noop(spark, tmp_path):
    """r7 verdict task 8: crash the stream in the worst window — gold
    swap (with its staged ledger marker) committed, streaming checkpoint
    NOT committed — then restart.  Structured Streaming redelivers the
    same batch id with the same data; the ledger must make the replay a
    BYTE-LEVEL no-op on the gold directory, and the final state must
    equal a run that never crashed."""
    import hashlib
    import shutil

    from pyspark.sql.streaming import StreamingQueryException

    from data_pipelines_using_llm_spark.sinks.rollup import read_rollup
    from data_pipelines_using_llm_spark.streaming.ingest import (
        stream_gold_rollup,
    )

    # three single-file micro-batches sliced from the fixture events
    src = "/root/testdata/sf0.001/events.parquet"
    events = spark.read.parquet(src)
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    for i in range(3):
        part = events.filter(F.col("event_id") % 3 == i).coalesce(1)
        d = str(tmp_path / f"slice{i}")
        part.write.mode("overwrite").parquet(d)
        pq = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(pq) == 1
        shutil.copy(os.path.join(d, pq[0]), str(inbox / f"f{i}.parquet"))

    def dir_hashes(p):
        out = {}
        for root, _, files in os.walk(p):
            for f in files:
                fp = os.path.join(root, f)
                rel = os.path.relpath(fp, p)
                with open(fp, "rb") as fh:
                    out[rel] = hashlib.sha256(fh.read()).hexdigest()
        return out

    gold = str(tmp_path / "gold")
    ckpt = str(tmp_path / "ckpt")
    try:
        stream_gold_rollup(spark, str(inbox), gold, ckpt, fail_after_batch=1)
        raise AssertionError("chaos hook did not fire")
    except StreamingQueryException:
        pass  # crashed after batch 1's gold commit, as injected

    # batches 0 and 1 are in gold; batch 1's checkpoint commit is lost
    h_after_crash = dir_hashes(gold)
    assert any("b1" in k for k in h_after_crash), "ledger marker missing"

    # restart: batch 1 replays (must be a no-op), batch 2 applies
    stream_gold_rollup(spark, str(inbox), gold, ckpt)
    final = {
        (r["year"], r["month"]): (r["n_rows"], r["sum_value"])
        for r in read_rollup(spark, gold, ["value"]).collect()
    }

    # a third run with no new files must not touch a single byte
    h_before_idle = dir_hashes(gold)
    stream_gold_rollup(spark, str(inbox), gold, ckpt)
    assert dir_hashes(gold) == h_before_idle

    # and the crashed-then-replayed gold equals the never-crashed run
    gold2 = str(tmp_path / "gold_once")
    stream_gold_rollup(spark, str(inbox), gold2, str(tmp_path / "ckpt2"))
    once = {
        (r["year"], r["month"]): (r["n_rows"], r["sum_value"])
        for r in read_rollup(spark, gold2, ["value"]).collect()
    }
    assert final == once and final

    # no double-count: totals match the batch ground truth
    n_total = sum(n for n, _ in final.values())
    assert n_total == events.filter(F.col("value").isNotNull()).count()


def test_stream_quarantine_matches_batch_split(spark):
    """The streaming dead-letter route must emit EXACTLY the rows the
    batch quarantine_split flags under the same row-level rules — one
    rule semantics, two execution modes (the flag expression is a
    stateless projection, so streaming adds no state and loses no
    rows)."""
    from data_pipelines_using_llm_spark.operators import expectations as EX
    from data_pipelines_using_llm_spark.sources.tables import load_table
    from data_pipelines_using_llm_spark.streaming.stream_queries import (
        stream_quarantine_events,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        (r["event_id"], r["violated_rules"])
        for r in stream_quarantine_events(spark, sf).collect()
    }
    rules = [
        EX.not_null("user_id"),
        EX.in_range("value", 0, 100),
        EX.in_set("event_type", ("click", "view", "purchase", "signup")),
    ]
    _p, q = EX.quarantine_split(load_table(spark, sf, "events"), rules)
    want = {
        (r["event_id"], r["violated_rules"]) for r in q.collect()
    }
    assert got == want and got, len(got)


def test_stream_quarantine_route_exactly_once_and_conserving(spark, tmp_path):
    """The streaming dead-letter sink: pass ∪ quarantine ≡ events with
    no overlap, quarantine rows carry rule names matching the batch
    split, and a FULL REPLAY (fresh checkpoint, same tables) is a
    row-level no-op — the keyed upsert turns at-least-once delivery
    into exactly-once tables."""
    from data_pipelines_using_llm_spark.operators import expectations as EX
    from data_pipelines_using_llm_spark.sources.tables import load_table
    from data_pipelines_using_llm_spark.streaming.ingest import (
        stream_quarantine_route,
    )

    sf = "/root/testdata/sf0.001"
    pass_path = str(tmp_path / "live")
    dead_path = str(tmp_path / "dead")
    stream_quarantine_route(
        spark, sf, pass_path, dead_path, str(tmp_path / "ckpt1")
    )
    ev = load_table(spark, sf, "events")
    pub = spark.read.parquet(pass_path)
    quar = spark.read.parquet(dead_path)
    assert pub.count() + quar.count() == ev.count()
    pub_ids = {r["event_id"] for r in pub.select("event_id").collect()}
    quar_ids = {r["event_id"] for r in quar.select("event_id").collect()}
    assert not (pub_ids & quar_ids)
    rules = [
        EX.not_null("user_id"),
        EX.in_range("value", 0, 100),
        EX.in_set("event_type", ("click", "view", "purchase", "signup")),
    ]
    _p, batch_q = EX.quarantine_split(ev, rules)
    want = {
        (r["event_id"], r["violated_rules"]) for r in batch_q.collect()
    }
    got = {
        (r["event_id"], r["violated_rules"])
        for r in quar.select("event_id", "violated_rules").collect()
    }
    assert got == want and got

    # full replay with a FRESH checkpoint: every batch redelivers; the
    # keyed upserts must leave both tables row-identical (compare to
    # the pre-replay collections — the swap invalidates old file lists)
    n_pub = len(pub_ids)
    stream_quarantine_route(
        spark, sf, pass_path, dead_path, str(tmp_path / "ckpt2")
    )
    assert spark.read.parquet(pass_path).count() == n_pub
    quar2 = {
        (r["event_id"], r["violated_rules"])
        for r in spark.read.parquet(dead_path)
        .select("event_id", "violated_rules")
        .collect()
    }
    assert quar2 == want


def test_stream_knn_serve_is_batching_invariant(spark, tmp_path):
    """Online ANN serving must be BATCHING-INVARIANT: split the corpus
    into 4 files so the file source delivers 4 micro-batches
    (maxFilesPerTrigger=1), and the union of per-batch serves must
    equal the one-shot batch knn_ivfpq on the same data — per-query
    top-k depends only on the query vector and the index, never on
    arrival batching.  (The registry gate proves stream == DuckDB on
    the single-file layout; this proves the multi-batch path.)"""
    from pyspark.sql import functions as F

    from data_pipelines_using_llm_spark.plans.similarity_queries import (
        knn_ivfpq,
    )
    from data_pipelines_using_llm_spark.sources.tables import load_table
    from data_pipelines_using_llm_spark.streaming.stream_queries import (
        stream_knn_serve,
    )

    sf = "/root/testdata/sf0.001"
    tmp_sf = str(tmp_path / "sf")
    os.makedirs(tmp_sf)
    load_table(spark, sf, "embeddings").repartition(4).write.parquet(
        f"{tmp_sf}/embeddings.parquet"
    )
    n_parts = len(
        [
            f
            for f in os.listdir(f"{tmp_sf}/embeddings.parquet")
            if f.endswith(".parquet")
        ]
    )
    assert n_parts == 4  # the stream really gets 4 micro-batches
    streamed = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine_sim"])
        for r in stream_knn_serve(spark, tmp_sf).collect()
    }
    batch = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine_sim"])
        for r in knn_ivfpq(spark, tmp_sf).collect()
    }
    assert streamed == batch and len(streamed) > 0


def test_stream_knn_picks_up_midstream_extend(spark, tmp_path):
    """r11 verdict task 4: a mid-stream index commit must be picked up
    by every LATER micro-batch while earlier batches' results stay
    untouched.  Train on the even-id half, stream 4 query files
    (maxFilesPerTrigger=1), commit ann_index_extend(odd half) at the
    start of batch 2 — batches 0–1 must equal a one-shot serve against
    v1 and batches 2–3 against v2 (the atomic pointer flip makes the
    per-batch re-resolution safe)."""
    from data_pipelines_using_llm_spark.operators import similarity as SIM
    from data_pipelines_using_llm_spark.plans import similarity_queries as SQ
    from data_pipelines_using_llm_spark.sources.tables import load_table
    from data_pipelines_using_llm_spark.streaming.stream_queries import (
        run_stream_knn,
    )

    sf = "/root/testdata/sf0.001"
    e = load_table(spark, sf, "embeddings")
    train = e.filter(F.col("vec_id") % 2 == 0)
    extra = e.filter(F.col("vec_id") % 2 == 1)
    tdir = str(tmp_path / "ann_index")
    v1 = SQ.ann_index_train(spark, sf, tdir, source=train)

    # 4 query files in controlled batch order (mtime ascending); ids
    # are the standard query block (% 100 == 0), all even, all in v1
    qids = sorted(
        r["vec_id"]
        for r in e.filter(F.col("vec_id") % SQ.QUERY_MOD == 0)
        .select("vec_id")
        .collect()
    )
    assert len(qids) >= 4
    files = [qids[0:1], qids[1:2], qids[2:3], qids[3:]]
    src_dir = str(tmp_path / "src")
    os.makedirs(src_dir)
    now = int(time.time())
    for i, ids in enumerate(files):
        p = str(tmp_path / f"qb{i}")
        e.filter(F.col("vec_id").isin(ids)).coalesce(1).write.parquet(p)
        leaf = [f for f in os.listdir(p) if f.endswith(".parquet")][0]
        dst = os.path.join(src_dir, f"q{i}.parquet")
        os.rename(os.path.join(p, leaf), dst)
        os.utime(dst, (now - 400 + i, now - 400 + i))

    extended = []

    def on_batch_start(batch_id: int) -> None:
        if batch_id == 2 and not extended:
            extended.append(SQ.ann_index_extend(spark, tdir, extra))

    out_dir = str(tmp_path / "out")
    chk = str(tmp_path / "chk")
    run_stream_knn(
        spark, src_dir, tdir, out_dir, chk, on_batch_start=on_batch_start
    )
    assert extended == [v1 + 1]
    got = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine_sim"])
        for r in spark.read.parquet(out_dir).collect()
    }

    def reference(version: int, ids: list) -> dict:
        parts = SQ.ann_index_load(spark, tdir, version=version)
        queries = SIM.normed(
            e.filter(F.col("vec_id").isin(ids)), "vec_id", "embedding"
        ).select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qnrm"),
        )
        return {
            (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine_sim"])
            for r in SIM.ivfpq_serve(
                queries, *parts, SQ.K, SQ.IVF_KMEANS_NPROBE
            ).collect()
        }

    early_ids = files[0] + files[1]
    late_ids = files[2] + files[3]
    want = reference(v1, early_ids) | reference(v1 + 1, late_ids)
    assert got == want and len(got) > 0
    # non-vacuity: the extension must actually change the late serves
    assert reference(v1, late_ids) != reference(v1 + 1, late_ids)


def test_stream_knn_tenant_purity_across_midstream_swap(spark, tmp_path):
    """r13 verdict task 3 — the multi-tenant serving deployment under a
    LIVE index swap: a tenant-filtered query stream (labels= through
    run_stream_knn) with an ann_index_extend committed at batch 2 must
    (a) never leak a foreign-tenant neighbor in ANY batch, before or
    after the swap, and (b) serve each batch exactly as a one-shot
    FILTERED serve against the version live at that batch's start —
    the filter composes with the pointer re-resolution, it is not
    re-derived per version."""
    from data_pipelines_using_llm_spark.operators import similarity as SIM
    from data_pipelines_using_llm_spark.plans import similarity_queries as SQ
    from data_pipelines_using_llm_spark.sources.tables import load_table
    from data_pipelines_using_llm_spark.streaming.stream_queries import (
        run_stream_knn,
    )

    sf = "/root/testdata/sf0.001"
    e = load_table(spark, sf, "embeddings")
    train = e.filter(F.col("vec_id") % 2 == 0)
    extra = e.filter(F.col("vec_id") % 2 == 1)
    tdir = str(tmp_path / "ann_index")
    v1 = SQ.ann_index_train(spark, sf, tdir, source=train)
    labels = e.select("vec_id", F.col("label").cast("long").alias("label"))

    qids = sorted(
        r["vec_id"]
        for r in e.filter(F.col("vec_id") % SQ.QUERY_MOD == 0)
        .select("vec_id")
        .collect()
    )
    assert len(qids) >= 4
    files = [qids[0:1], qids[1:2], qids[2:3], qids[3:]]
    src_dir = str(tmp_path / "src")
    os.makedirs(src_dir)
    now = int(time.time())
    for i, ids in enumerate(files):
        p = str(tmp_path / f"qb{i}")
        e.filter(F.col("vec_id").isin(ids)).coalesce(1).write.parquet(p)
        leaf = [f for f in os.listdir(p) if f.endswith(".parquet")][0]
        dst = os.path.join(src_dir, f"q{i}.parquet")
        os.rename(os.path.join(p, leaf), dst)
        os.utime(dst, (now - 400 + i, now - 400 + i))

    extended = []

    def on_batch_start(batch_id: int) -> None:
        if batch_id == 2 and not extended:
            extended.append(SQ.ann_index_extend(spark, tdir, extra))

    out_dir = str(tmp_path / "out")
    chk = str(tmp_path / "chk")
    run_stream_knn(
        spark, src_dir, tdir, out_dir, chk,
        on_batch_start=on_batch_start, labels=labels,
    )
    assert extended == [v1 + 1]
    out = spark.read.parquet(out_dir)

    # (a) tenant purity in every batch: no (query, neighbor) pair may
    # cross a label boundary
    lab = {r["vec_id"]: r["label"] for r in labels.collect()}
    rows = out.collect()
    assert rows
    for r in rows:
        assert lab[r["query_id"]] == lab[r["neighbor_id"]], (
            r["query_id"], r["neighbor_id"],
        )

    got = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine_sim"])
        for r in rows
    }

    def reference(version: int, ids: list) -> dict:
        parts = SQ.ann_index_load(spark, tdir, version=version)
        queries = (
            SIM.normed(
                e.filter(F.col("vec_id").isin(ids)), "vec_id", "embedding"
            )
            .join(
                labels.select(
                    F.col("vec_id"),
                    F.col("label").alias("qlabel"),
                ),
                "vec_id",
            )
            .select(
                F.col("vec_id").alias("query_id"),
                F.col("v").alias("qv"),
                F.col("nrm").alias("qnrm"),
                "qlabel",
            )
        )
        return {
            (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine_sim"])
            for r in SIM.ivfpq_serve(
                queries, *parts, SQ.K, SQ.IVF_KMEANS_NPROBE, labels=labels
            ).collect()
        }

    # (b) each batch = one-shot filtered serve against its live version
    early_ids = files[0] + files[1]
    late_ids = files[2] + files[3]
    want = reference(v1, early_ids) | reference(v1 + 1, late_ids)
    assert got == want
    # non-vacuity: the swap must actually change the late filtered
    # serves (the odd half contains same-tenant vectors that win)
    assert reference(v1, late_ids) != reference(v1 + 1, late_ids)


def test_stream_knn_picks_up_midstream_remove_and_rollback(spark, tmp_path):
    """The full live-maintenance story under a query stream: a
    mid-stream ann_index_remove is picked up by later batches, and a
    mid-stream rollback_to restores the pre-removal serving — each via
    the same per-batch pointer re-resolution, each batch seeing exactly
    the version live at its start."""
    from data_pipelines_using_llm_spark.operators import similarity as SIM
    from data_pipelines_using_llm_spark.plans import similarity_queries as SQ
    from data_pipelines_using_llm_spark.sinks.versioned import rollback_to
    from data_pipelines_using_llm_spark.sources.tables import load_table
    from data_pipelines_using_llm_spark.streaming.stream_queries import (
        run_stream_knn,
    )

    sf = "/root/testdata/sf0.001"
    e = load_table(spark, sf, "embeddings")
    tdir = str(tmp_path / "ann_index")
    v1 = SQ.ann_index_train(spark, sf, tdir)
    rm = e.filter(
        F.col("vec_id") % SQ.REMOVE_MOD == SQ.REMOVE_RES
    ).select("vec_id")

    qids = sorted(
        r["vec_id"]
        for r in e.filter(F.col("vec_id") % SQ.QUERY_MOD == 0)
        .select("vec_id")
        .collect()
    )
    files = [qids[0:1], qids[1:2], qids[2:3], qids[3:]]
    src_dir = str(tmp_path / "src")
    os.makedirs(src_dir)
    now = int(time.time())
    for i, ids in enumerate(files):
        p = str(tmp_path / f"qb{i}")
        e.filter(F.col("vec_id").isin(ids)).coalesce(1).write.parquet(p)
        leaf = [f for f in os.listdir(p) if f.endswith(".parquet")][0]
        dst = os.path.join(src_dir, f"q{i}.parquet")
        os.rename(os.path.join(p, leaf), dst)
        os.utime(dst, (now - 400 + i, now - 400 + i))

    actions = []

    def on_batch_start(batch_id: int) -> None:
        if batch_id == 1 and "removed" not in actions:
            actions.append("removed")
            SQ.ann_index_remove(spark, tdir, rm)  # -> v2 live
        if batch_id == 3 and "rolled" not in actions:
            actions.append("rolled")
            rollback_to(tdir, v1)  # restore pre-removal serving

    out_dir = str(tmp_path / "out")
    chk = str(tmp_path / "chk")
    run_stream_knn(
        spark, src_dir, tdir, out_dir, chk, on_batch_start=on_batch_start
    )
    assert actions == ["removed", "rolled"]
    got = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine_sim"])
        for r in spark.read.parquet(out_dir).collect()
    }

    def reference(version: int, ids: list) -> dict:
        parts = SQ.ann_index_load(spark, tdir, version=version)
        queries = SIM.normed(
            e.filter(F.col("vec_id").isin(ids)), "vec_id", "embedding"
        ).select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qnrm"),
        )
        return {
            (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine_sim"])
            for r in SIM.ivfpq_serve(
                queries, *parts, SQ.K, SQ.IVF_KMEANS_NPROBE
            ).collect()
        }

    want = (
        reference(v1, files[0])           # batch 0: pre-removal
        | reference(v1 + 1, files[1] + files[2])  # batches 1-2: removed
        | reference(v1, files[3])         # batch 3: rolled back
    )
    assert got == want and len(got) > 0
    # non-vacuity: removal genuinely changed the serving for the middle
    # batches' queries
    mid = files[1] + files[2]
    assert reference(v1, mid) != reference(v1 + 1, mid)


def test_full_maintenance_loop_drift_retrain_recover_live_swap(
    spark, tmp_path
):
    """r12 verdict task 6 — the WHOLE operational loop in one test:

    1. a healthy index says 'append';
    2. drifted appends (the +8/dim shifted cloud) are extended in until
       the policy (scripts/ann_maintain.py::decide) flips to 'retrain';
    3. the retrain is performed as a NEW SNAPSHOT of the same artifact
       — in the RESIDUAL regime, because that is what recovers: on the
       now-bimodal corpus a raw retrain leaves whole cells collapsed
       onto single codewords (measured worst concentration 1.0) while
       residual re-centering merges the clouds (0.17, back under the
       0.5 threshold) — the published rationale for residual encoding,
       measured here;
    4. the concentration metric is shown recovering below threshold;
    5. a LIVE query stream picks up the retrained snapshot mid-flight,
       INCLUDING its regime switch: batches before the swap serve the
       drifted raw index with raw ADC math, batches after serve the
       retrained residual index with reconstruction arithmetic (the
       encoding-aware dispatch in run_stream_knn)."""
    import importlib.util

    from data_pipelines_using_llm_spark.operators import similarity as SIM
    from data_pipelines_using_llm_spark.plans import similarity_queries as SQ
    from data_pipelines_using_llm_spark.sources.tables import load_table
    from data_pipelines_using_llm_spark.streaming.stream_queries import (
        run_stream_knn,
    )

    spec = importlib.util.spec_from_file_location(
        "ann_maintain", "/root/repo/scripts/ann_maintain.py"
    )
    am = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(am)

    sf = "/root/testdata/sf0.001"
    e = load_table(spark, sf, "embeddings")
    tdir = str(tmp_path / "ann_index")
    SQ.ann_index_train(spark, sf, tdir)
    assert am.decide(spark, tdir)["decision"] == "append"  # (1) healthy

    # (2) drifted appends until the decision flips — each batch is a
    # third of the corpus shifted +8/dim under fresh ids
    corpus = e.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    for i in range(3):
        batch = e.filter(F.col("vec_id") % 3 == i).select(
            (F.col("vec_id") + 1_000_000 * (i + 1)).alias("vec_id"),
            F.transform(
                "embedding", lambda x: x.cast("double") + F.lit(8.0)
            ).alias("embedding"),
        )
        SQ.ann_index_extend(spark, tdir, batch)
        corpus = corpus.unionByName(batch)
        if am.decide(spark, tdir)["decision"] == "retrain":
            break
    drifted = am.decide(spark, tdir)
    assert drifted["decision"] == "retrain", drifted
    v_drifted = drifted["version"]
    corpus = corpus.localCheckpoint(eager=True)

    # stream 4 query files; the retrain lands at the start of batch 2
    qids = sorted(
        r["vec_id"]
        for r in e.filter(F.col("vec_id") % SQ.QUERY_MOD == 0)
        .select("vec_id")
        .collect()
    )
    files = [qids[0:1], qids[1:2], qids[2:3], qids[3:]]
    src_dir = str(tmp_path / "src")
    os.makedirs(src_dir)
    now = int(time.time())
    for i, ids in enumerate(files):
        p = str(tmp_path / f"qb{i}")
        e.filter(F.col("vec_id").isin(ids)).coalesce(1).write.parquet(p)
        leaf = [f for f in os.listdir(p) if f.endswith(".parquet")][0]
        dst = os.path.join(src_dir, f"q{i}.parquet")
        os.rename(os.path.join(p, leaf), dst)
        os.utime(dst, (now - 400 + i, now - 400 + i))

    retrained = []

    def on_batch_start(batch_id: int) -> None:
        if batch_id == 2 and not retrained:
            # (3) the retrain as a snapshot bump of the SAME artifact,
            # in the regime that recovers
            retrained.append(
                SQ.ann_index_train(
                    spark, sf, tdir, source=corpus, residual=True
                )
            )

    out_dir = str(tmp_path / "out")
    chk = str(tmp_path / "chk")
    run_stream_knn(
        spark, src_dir, tdir, out_dir, chk, on_batch_start=on_batch_start
    )
    assert retrained == [v_drifted + 1]

    # (4) recovery: concentration back under threshold, regime recorded
    recovered = am.decide(spark, tdir)
    assert recovered["decision"] == "append", recovered
    assert recovered["worst_code_concentration"] < 0.5
    assert recovered["residual"] is True
    assert recovered["version"] == v_drifted + 1

    # (5) the stream served batches 0-1 from the drifted RAW snapshot
    # with raw ADC math and batches 2-3 from the retrained RESIDUAL
    # snapshot with reconstruction arithmetic
    got = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine_sim"])
        for r in spark.read.parquet(out_dir).collect()
    }

    def reference(version: int, residual: bool, ids: list) -> dict:
        parts = SQ.ann_index_load(spark, tdir, version=version)
        queries = SIM.normed(
            e.filter(F.col("vec_id").isin(ids)), "vec_id", "embedding"
        ).select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qnrm"),
        )
        serve = SIM.ivfpq_residual_serve if residual else SIM.ivfpq_serve
        return {
            (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine_sim"])
            for r in serve(
                queries, *parts, SQ.K, SQ.IVF_KMEANS_NPROBE
            ).collect()
        }

    early, late = files[0] + files[1], files[2] + files[3]
    want = reference(v_drifted, False, early) | reference(
        v_drifted + 1, True, late
    )
    assert got == want and len(got) > 0
    # non-vacuity both ways: the retrain changed the late serving, and
    # serving the residual snapshot with RAW arithmetic would have
    # produced different answers (the dispatch genuinely matters)
    assert reference(v_drifted, False, late) != reference(
        v_drifted + 1, True, late
    )
    assert reference(v_drifted + 1, False, late) != reference(
        v_drifted + 1, True, late
    )
