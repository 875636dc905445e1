"""Structured-Streaming query pack: tumbling / sliding / session windows,
watermark dedup, and a custom stateful operator (applyInPandasWithState).

Each query executes a REAL streaming job (readStream → transform →
writeStream, AvailableNow trigger, memory sink) and returns the final
table; on the bounded test input the result must equal the batch oracle
SQL, which is how streaming semantics stay inside the driver's
correctness gate.  See streaming/ingest.py for the source adapter.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

from data_pipelines_using_llm_spark.registry import QuerySpec
from data_pipelines_using_llm_spark.streaming.ingest import run_to_table, stream_events

SESSION_GAP_MIN = 30


def stream_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windowed counts/sums per event_type with a
    10-minute watermark (complete output => bounded result equals the
    batch group-by; the watermark is real and bounds state in update
    deployments)."""
    sdf = stream_events(spark, sf_dir)
    agg = (
        sdf.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias(
                "sum_value"
            ),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    return run_to_table(agg, spark, "dpls_stream_hourly_counts", "complete")


STREAM_HOURLY_COUNTS_ORACLE = """
SELECT date_trunc('hour', ts) AS window_start,
       event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
"""


def stream_sliding_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window (1 h window, 30 min slide) per-type averages — each
    event contributes to exactly two overlapping windows."""
    sdf = stream_events(spark, sf_dir)
    agg = (
        sdf.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
                / F.count("value")
            ).alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "avg_value",
        )
    )
    return run_to_table(agg, spark, "dpls_stream_sliding_avg", "complete")


# every event lands in exactly two 30-min-aligned windows of width 1 h:
# the one starting at its own 30-min floor and the one 30 min earlier
STREAM_SLIDING_AVG_ORACLE = """
WITH floored AS (
    SELECT *,
           date_trunc('hour', ts)
           + CASE WHEN minute(ts) >= 30 THEN INTERVAL 30 MINUTE
                  ELSE INTERVAL 0 MINUTE END AS f30
    FROM events
),
slid AS (
    SELECT f.*, u.window_start
    FROM floored f,
         UNNEST([f30, f30 - INTERVAL 30 MINUTE]) AS u(window_start)
)
SELECT window_start, event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value) AS avg_value
FROM slid
GROUP BY 1, 2
"""


def stream_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows (30-minute inactivity gap): built-in
    ``session_window`` — session end extends to last event + gap."""
    sdf = stream_events(spark, sf_dir)
    agg = (
        sdf.withWatermark("ts", "10 minutes")
        .groupBy(
            "user_id",
            F.session_window("ts", f"{SESSION_GAP_MIN} minutes").alias("w"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias(
                "sum_value"
            ),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )
    return run_to_table(agg, spark, "dpls_stream_user_sessions", "complete")


# gaps-and-islands replica of session_window: a new session starts when the
# gap to the previous event of the same user exceeds SESSION_GAP_MIN;
# session end = last event + gap (session_window semantics)
STREAM_USER_SESSIONS_ORACLE = f"""
WITH flagged AS (
    SELECT user_id, ts, value,
           CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                     <= INTERVAL {SESSION_GAP_MIN} MINUTE
                THEN 0 ELSE 1 END AS new_session
    FROM events
),
numbered AS (
    SELECT *, sum(new_session) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS UNBOUNDED PRECEDING) AS session_no
    FROM flagged
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL {SESSION_GAP_MIN} MINUTE AS session_end,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM numbered
GROUP BY user_id, session_no
"""


def stream_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once ingestion guard: drop event_id duplicates arriving
    within the watermark (state bounded by the 1-hour horizon; the batch
    equivalent is keyed dedup, SURVEY.md §2.4 D4)."""
    sdf = stream_events(spark, sf_dir)
    deduped = (
        sdf.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "user_id", "event_type", "value")
    )
    return run_to_table(deduped, spark, "dpls_stream_dedup_events", "append")


# event_ids are unique per table generation, so keyed streaming dedup must
# return every row exactly once regardless of arrival order
STREAM_DEDUP_ORACLE = """
SELECT event_id, user_id, event_type, value
FROM events
QUALIFY row_number() OVER (PARTITION BY event_id ORDER BY ts) = 1
"""

_STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("sum_cents", LongType()),
    ]
)
_STATEFUL_OUT_SCHEMA = (
    "user_id long, n_events long, sum_value double"
)


def _user_stats_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: Any
) -> Iterator[pd.DataFrame]:
    """Custom stateful operator: per-user running totals.  Money is summed
    as integer cents so the emitted double is order-independent and
    bit-identical to the oracle's DECIMAL sum."""
    if state.exists:
        n_events, sum_cents = state.get
    else:
        n_events, sum_cents = 0, 0
    for pdf in pdfs:
        n_events += len(pdf)
        sum_cents += int(pdf["value"].mul(100).round().astype("int64").sum())
    state.update((n_events, sum_cents))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n_events],
            "sum_value": [sum_cents / 100.0],
        }
    )


def stream_user_stats_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary-stateful streaming aggregation via applyInPandasWithState
    (the extension hook for rate-limited / LLM-batch operators): per-user
    event counts + exact value totals."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    sdf = stream_events(spark, sf_dir)
    stats = (
        sdf.withWatermark("ts", "1 hour")
        .groupBy("user_id")
        .applyInPandasWithState(
            _user_stats_fn,
            outputStructType=_STATEFUL_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    return run_to_table(stats, spark, "dpls_stream_user_stats", "append")


STREAM_USER_STATS_ORACLE = """
SELECT user_id,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY user_id
"""



_TWS_OUT_SCHEMA = (
    "user_id long, n_events long, sum_value double, n_types long, max_cents long"
)


class _UserEngagementProcessor:
    """transformWithState processor: per-user running totals in a
    ValueState plus a per-event-type MapState (distinct-type census) —
    the state-shape applyInPandasWithState can't express (its single
    state tuple has no keyed sub-state; here type counts live in a
    MapState the state store shards natively).

    Money accumulates as integer cents so the emitted double is
    order-independent and bit-identical to the oracle's DECIMAL sum.
    """

    def init(self, handle) -> None:
        self._totals = handle.getValueState(
            "totals", "n_events long, sum_cents long, max_cents long"
        )
        self._types = handle.getMapState("types", "t string", "c long")

    def handleInputRows(self, key, rows, timerValues):
        n_events, sum_cents, max_cents = (
            self._totals.get() if self._totals.exists() else (0, 0, 0)
        )
        for pdf in rows:
            n_events += len(pdf)
            cents = pdf["value"].mul(100).round().astype("int64")
            sum_cents += int(cents.sum())
            if len(cents):
                max_cents = max(max_cents, int(cents.max()))
            for t, c in pdf.groupby("event_type").size().items():
                prev = (
                    self._types.getValue((t,))[0]
                    if self._types.containsKey((t,))
                    else 0
                )
                self._types.updateValue((t,), (prev + int(c),))
        self._totals.update((n_events, sum_cents, max_cents))
        n_types = sum(1 for _ in self._types.keys())
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n_events],
                "sum_value": [sum_cents / 100.0],
                "n_types": [n_types],
                "max_cents": [max_cents],
            }
        )

    def close(self) -> None:
        pass


def tws_available() -> bool:
    """``transformWithStateInPandas`` needs protobuf in the Python worker
    (its state-server protocol); absent here, the query is registered only
    where the dependency exists — the same environment-gate discipline as
    the Delta branches in sinks/writers.py."""
    import importlib.util

    try:
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:  # parent 'google' namespace absent entirely
        return False


def stream_user_engagement_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary-stateful streaming via ``transformWithStateInPandas``
    (Spark 4's successor to applyInPandasWithState): composite state =
    ValueState running totals + MapState per-type counts, per user.

    Scale: state lives in the state store keyed by (user, type) — update
    cost is per-touched-key, not per-user-history; TTL hooks exist on
    both state types for bounded retention (not set here: the bounded
    test input must equal the batch oracle deterministically).
    """
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    proc = type(
        "_P", (StatefulProcessor,), dict(_UserEngagementProcessor.__dict__)
    )()
    sdf = stream_events(spark, sf_dir)
    stats = (
        sdf.withWatermark("ts", "1 hour")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=proc,
            outputStructType=_TWS_OUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
    return run_to_table(stats, spark, "dpls_stream_user_tws", "append")


STREAM_USER_ENGAGEMENT_TWS_ORACLE = """
SELECT user_id,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
       count(DISTINCT event_type) AS n_types,
       CAST(max(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS max_cents
FROM events
GROUP BY user_id
"""


#: event_type -> engagement weight (exact one-decimal fixed-point values,
#: shared verbatim with the oracle's VALUES list)
EVENT_WEIGHTS: list[tuple[str, str]] = [
    ("purchase", "10.0"),
    ("signup", "5.0"),
    ("click", "1.0"),
    ("view", "0.5"),
    ("error", "0.0"),
]


def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STATIC join (the enrichment shape none of the window
    queries cover): each micro-batch of the event stream joins a static
    dimension (event-type engagement weights), then rolls up a weighted
    engagement score per user.

    Scale shape: the static side is broadcast once and reused by every
    micro-batch — no stream-side shuffle for the join; the aggregation
    state is one row per user.  Weights are one-decimal fixed-point so
    the engagement sum is decimal-exact against the oracle."""
    weights = spark.createDataFrame(
        [(t, w) for t, w in EVENT_WEIGHTS], "event_type string, weight string"
    ).select("event_type", F.col("weight").cast("decimal(4,1)").alias("weight"))
    sdf = stream_events(spark, sf_dir)
    agg = (
        sdf.join(F.broadcast(weights), "event_type")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("weight").cast("double").alias("engagement"),
        )
    )
    return run_to_table(agg, spark, "dpls_stream_static_enrich", "complete")


STREAM_STATIC_ENRICH_ORACLE = f"""
WITH w(event_type, weight) AS (
    VALUES {", ".join(f"('{t}', {v})" for t, v in EVENT_WEIGHTS)}
)
SELECT user_id, count(*) AS n_events,
       CAST(sum(CAST(weight AS DECIMAL(4,1))) AS DOUBLE) AS engagement
FROM events JOIN w USING (event_type)
GROUP BY user_id
"""


ATTRIB_WINDOW_MIN = 30


def stream_click_purchase_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STREAM interval join: every purchase joined to all clicks by
    the same user in the preceding 30 minutes (inclusive) — the streaming
    twin of the batch ``purchase_click_attribution`` as-of join, but with
    full interval semantics and bilateral watermarks.

    Scale shape: both sides shuffle once on ``user_id``; the watermark +
    time-bound condition lets Spark EVICT join state older than the
    interval (unbounded-state stream joins are rejected by the planner),
    so state per user is 30 minutes of clicks, not the stream's history.
    On the bounded AvailableNow input the result must equal the batch
    range join the oracle states.

    State-partition sizing: a stream-stream join materializes one state
    store PER shuffle partition PER side; the partition count is pinned
    at first start from ``spark.sql.shuffle.partitions``.  Join state
    here is bounded (30 min × active users), so fewer, larger state
    partitions beat many tiny ones — we pin 8 for this query and restore
    the session default after (on a real cluster, size to
    state-bytes/partition, not to the batch-shuffle default).
    """
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        joined = _click_purchase_joined(spark, sf_dir)
        return run_to_table(joined, spark, "dpls_stream_click_purchase", "append")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)


def _click_purchase_joined(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = stream_events(spark, sf_dir)
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    joined = purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {ATTRIB_WINDOW_MIN} MINUTES")
        ),
        "inner",
    ).select(
        "purchase_id",
        F.col("p_user").alias("user_id"),
        "purchase_ts",
        "click_id",
        "click_ts",
    )
    return joined


ATTRIB_CUTOFF = "2024-01-28 00:00:00"


def stream_attributed_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHAINED stateful operators: the stream-stream interval join feeds a
    tumbling-window aggregation in the SAME streaming query (multiple
    stateful operators, append mode) — attributed click counts per hour.

    Bounded-input exactness: append-mode windows only emit once the
    watermark passes them, and the final watermark on AvailableNow input
    is min(max event time per side) − 1 h; the fixed CUTOFF filter keeps
    every emitted window far inside that horizon, so the streaming result
    equals the batch oracle with the same cutoff — no data-dependent
    tail-window truncation.

    Scale shape: join state evicts by the interval bound; window state by
    the watermark; the second shuffle reuses the first's partitioning on
    nothing — it re-keys by window, which is the unavoidable exchange of
    any keyed re-aggregation.
    """
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        joined = _click_purchase_joined(spark, sf_dir)
        agg = (
            joined.filter(F.col("purchase_ts") < F.lit(ATTRIB_CUTOFF).cast("timestamp"))
            .groupBy(F.window("purchase_ts", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).alias("n_attributed"))
            .select(F.col("w.start").alias("window_start"), "n_attributed")
        )
        return run_to_table(agg, spark, "dpls_stream_attributed_hourly", "append")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)


STREAM_ATTRIBUTED_HOURLY_ORACLE = f"""
SELECT date_trunc('hour', p.ts) AS window_start,
       count(*) AS n_attributed
FROM events p
JOIN events c
  ON p.user_id = c.user_id
 AND c.ts <= p.ts
 AND c.ts >= p.ts - INTERVAL {ATTRIB_WINDOW_MIN} MINUTE
WHERE p.event_type = 'purchase'
  AND c.event_type = 'click'
  AND p.ts < TIMESTAMP '{ATTRIB_CUTOFF}'
GROUP BY 1
"""


STREAM_CLICK_PURCHASE_ORACLE = f"""
SELECT p.event_id AS purchase_id,
       p.user_id AS user_id,
       p.ts AS purchase_ts,
       c.event_id AS click_id,
       c.ts AS click_ts
FROM events p
JOIN events c
  ON p.user_id = c.user_id
 AND c.ts <= p.ts
 AND c.ts >= p.ts - INTERVAL {ATTRIB_WINDOW_MIN} MINUTE
WHERE p.event_type = 'purchase'
  AND c.event_type = 'click'
"""


def stream_user_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Count-Min maintenance: the 4×16 activity sketch over the
    user-id stream, kept current by the streaming aggregation itself —
    ``operators/sketch.py::cms_build`` applied verbatim to the streaming
    DataFrame (explode to (row, bucket) cells → grouped count), complete
    output.  The state store holds depth×width rows NO MATTER the
    traffic: the sketch IS the state, which is exactly why CMS is the
    streaming-frequency structure — and on bounded input the final table
    equals the batch sketch, so the whole streaming path sits inside the
    cross-engine hash gate (integer cells, no float caveat)."""
    from data_pipelines_using_llm_spark.operators.sketch import cms_build

    sdf = stream_events(spark, sf_dir)
    keys = sdf.filter(F.col("user_id").isNotNull()).select(
        F.col("user_id").cast("string").alias("k")
    )
    sketch = cms_build(keys, "k")
    return run_to_table(sketch, spark, "dpls_stream_user_cms", "complete")


def _stream_user_cms_oracle() -> str:
    from data_pipelines_using_llm_spark.operators.sketch import (
        CMS_DEPTH,
        sql_cms_bucket,
    )

    cell_rows = "\nUNION ALL\n".join(
        f"SELECT {r} AS row, {sql_cms_bucket('k', r)} AS bucket FROM keys"
        for r in range(CMS_DEPTH)
    )
    return f"""
WITH keys AS (
    SELECT CAST(user_id AS VARCHAR) AS k FROM events
    WHERE user_id IS NOT NULL
),
cells AS (
{cell_rows}
)
SELECT row, bucket, count(*) AS counter FROM cells GROUP BY 1, 2
"""


def stream_quarantine_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dead-letter routing — the batch quarantine primitive
    (operators/expectations.py::flag_violations) applied to the event
    STREAM unchanged: every row-level rule is a pure column predicate,
    so the flag-and-filter split is a STATELESS projection — no
    watermark, no state store, append mode, same code path and same
    rule semantics as the batch `events_quarantine` row (unique rules
    are the one exclusion: keep-first needs ordered state, which is the
    watermark-dedup query's territory).  At 100 TB/day this is the
    shape that routes malformed telemetry to a dead-letter table in
    -flight instead of poisoning the bronze append."""
    from data_pipelines_using_llm_spark.operators import expectations as EX

    sdf = stream_events(spark, sf_dir)
    rules = [
        EX.not_null("user_id"),
        EX.in_range("value", 0, 100),
        EX.in_set("event_type", ("click", "view", "purchase", "signup")),
    ]
    flagged = EX.flag_violations(sdf, rules)
    quarantined = flagged.filter(F.col("violated_rules") != "").select(
        "event_id", "user_id", "event_type", "value", "violated_rules"
    )
    return run_to_table(
        quarantined, spark, "dpls_stream_quarantine", "append"
    )


STREAM_QUARANTINE_ORACLE = """
WITH flagged AS (
    SELECT event_id, user_id, event_type, value,
           concat_ws(',',
               CASE WHEN user_id IS NULL THEN 'not_null_user_id' END,
               CASE WHEN value IS NOT NULL
                     AND NOT (value BETWEEN 0 AND 100)
                    THEN 'in_range_value' END,
               CASE WHEN event_type IS NOT NULL
                     AND event_type NOT IN
                         ('click', 'view', 'purchase', 'signup')
                    THEN 'in_set_event_type' END
           ) AS violated_rules
    FROM events
)
SELECT event_id, user_id, event_type, value, violated_rules
FROM flagged WHERE violated_rules <> ''
"""


def run_stream_knn(
    spark: SparkSession,
    src_dir: str,
    table_dir: str,
    out_dir: str,
    chk: str,
    query_mod: int | None = None,
    on_batch_start=None,
    timeout_s: int = 300,
    labels: DataFrame | None = None,
) -> None:
    """The online-serving stream over a LIVE versioned index: query
    vectors arrive as parquet files (one micro-batch per file), and
    each micro-batch RE-RESOLVES the index version pointer — one
    ``ann_index_load`` inside ``foreachBatch`` — before serving through
    the pure IVFPQ dataflow (operators/similarity.py::ivfpq_serve).
    This is the production daily-swap shape (r11 verdict task 4): an
    ``ann_index_train`` or ``ann_index_extend`` committed mid-stream is
    picked up by every LATER micro-batch, while earlier batches'
    results are untouched — the snapshot-plus-atomic-pointer-flip
    artifact (sinks/versioned.py) makes the re-resolution safe: a batch
    reads the version that was live when it started, never a half
    index.  The POINTER read is the only per-batch filesystem touch:
    loaded parts are ``localCheckpoint``-cached PER VERSION, so at
    100 TB a daily swap re-reads the O(corpus) per-vector parts once
    per NEW version, not once per micro-batch (cached blocks live for
    the stream's lifetime, bounded by the number of swaps; a rollback
    to an already-served version reuses its cached parts — snapshots
    are immutable, so the cache can never go stale).
    The serve dispatch is ENCODING-AWARE (r13): each new version's
    meta row is read alongside its parts, and a ``residual`` artifact
    is served through :func:`SIM.ivfpq_residual_serve` instead of the
    raw ADC math — so the production drift loop (drift detected →
    ``ann_index_train(residual=True)`` committed as the next snapshot,
    see scripts/ann_maintain.py) swaps BOTH the version and the
    encoding regime under the live stream, and a residual index can
    never be silently served with raw arithmetic.
    ``on_batch_start(batch_id)`` is a test seam for committing
    an index change at a chosen batch boundary.  ``query_mod`` filters
    arriving vec_ids to the query block (None serves every arrival).
    ``labels`` turns on METADATA-FILTERED serving (r13 verdict task 3 —
    the actual multi-tenant deployment: filtered + versioned +
    streaming): pass the static ``(vec_id, label)`` tenant table and
    each arriving query carries its OWN ``label`` column (already in
    the stream schema) as its tenant — the per-batch serve pre-filters
    candidates inside candidate generation exactly as the batch rows
    do, under BOTH encoding regimes, so a mid-stream index swap cannot
    leak a foreign-tenant row."""
    from pyspark.sql.types import ArrayType, FloatType, IntegerType

    from data_pipelines_using_llm_spark.operators import similarity as SIM
    from data_pipelines_using_llm_spark.plans.similarity_queries import (
        IVF_KMEANS_NPROBE,
        K,
        ann_index_load,
        ann_index_meta,
    )
    from data_pipelines_using_llm_spark.sinks.versioned import (
        current_version,
    )

    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
            StructField("label", IntegerType()),
        ]
    )
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    parts_by_version: dict[int, tuple] = {}

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if on_batch_start is not None:
            on_batch_start(batch_id)
        # per-batch POINTER resolution — the whole point: the serve
        # plan below reads whatever snapshot is live RIGHT NOW; the
        # parts themselves are cached per version (pinned immutable
        # snapshot read)
        live = current_version(table_dir)
        cached = parts_by_version.get(live)
        if cached is None:
            cached = (
                tuple(
                    part.localCheckpoint(eager=True)
                    for part in ann_index_load(
                        spark, table_dir, version=live
                    )
                ),
                # the encoding regime travels WITH the snapshot: read it
                # once per new version so a mid-stream retrain that
                # switches regimes is served with the right arithmetic
                ann_index_meta(spark, table_dir, version=live)["residual"],
            )
            parts_by_version[live] = cached
        (cells, icents, codes, pqcents), residual = cached
        arrivals = (
            batch_df.filter(F.col("vec_id") % query_mod == 0)
            if query_mod is not None
            else batch_df
        )
        queries = SIM.normed(arrivals, "vec_id", "embedding").select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qnrm"),
        )
        if labels is not None:
            # the arriving request carries its own tenant; the corpus
            # side comes from the static label table passed in
            queries = queries.join(
                arrivals.select(
                    F.col("vec_id").alias("query_id"),
                    F.col("label").cast("long").alias("qlabel"),
                ),
                "query_id",
            )
        serve = SIM.ivfpq_residual_serve if residual else SIM.ivfpq_serve
        serve(
            queries, cells, icents, codes, pqcents, K, IVF_KMEANS_NPROBE,
            labels=labels,
        ).write.mode("append").parquet(out_dir)

    query = (
        sdf.writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", chk)
        .start()
    )
    try:
        finished = query.awaitTermination(timeout_s)
        if not finished:
            raise TimeoutError(f"run_stream_knn exceeded {timeout_s}s")
    finally:
        query.stop()


def stream_knn_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONLINE vector serving — query vectors arrive as a STREAM and
    every micro-batch is scored against the persisted IVFPQ index
    through the pure serving dataflow (:func:`run_stream_knn`): train →
    persist (versioned artifact), then each ``foreachBatch`` RE-RESOLVES
    the version pointer and serves — the float corpus is never read at
    serve time, candidates come from the stored membership table and
    scores from the stored codes.  Because the scoring is sequenced
    folds + exact arithmetic and each query's top-k depends only on its
    own vector and the index, the result is BATCHING-INVARIANT — the
    union over micro-batches equals the batch serve, which is why this
    row shares ``knn_ivfpq``'s oracle verbatim (the gate proves
    stream == batch == DuckDB in one shot; the index is not modified
    mid-stream here, so every batch resolves the same version — the
    mid-stream-swap pickup is proven in
    tests/test_streaming.py::test_stream_knn_picks_up_midstream_extend).
    At 100 TB this is the online-retrieval shape: a Kafka stream of
    query embeddings against a daily-trained index, nothing stateful,
    no watermark, index artifacts broadcast per batch."""
    return _stream_knn_serve_impl(spark, sf_dir, residual=False)


def stream_knn_residual_serve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Online serving from a RESIDUAL index — the same stream as
    :func:`stream_knn_serve` pointed at a residual-regime artifact, so
    the ENCODING-AWARE dispatch in :func:`run_stream_knn` (per-version
    meta read → :func:`SIM.ivfpq_residual_serve`) is itself hash-gated:
    the row shares ``knn_ivfpq_residual``'s oracle verbatim, and a
    stream that served the residual snapshot with raw ADC arithmetic —
    the pre-r13 behavior — would hash-mismatch every batch.  Batching
    invariance holds for the same reason as the raw row (per-query
    top-k, exact sequenced folds)."""
    return _stream_knn_serve_impl(spark, sf_dir, residual=True)


def stream_knn_tenant_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ACTUAL multi-tenant serving deployment (r13 verdict task 3) —
    filtered + versioned + streaming composed: query vectors stream in
    carrying their tenant label, every micro-batch re-resolves the
    index pointer, and candidates are pre-filtered to the query's
    tenant INSIDE candidate generation.  The row shares
    ``knn_ivfpq_tenant``'s oracle verbatim (the correlated
    label-equality candidate predicate), so a stream that leaked a
    foreign-tenant row, post-filtered after ranking, or dropped the
    filter after an index swap fails the hash.  Batching invariance
    holds as for the unfiltered stream (per-query top-k, exact
    sequenced folds); tenant purity across a MID-STREAM index swap is
    proven in tests/test_streaming.py::
    test_stream_knn_tenant_purity_across_midstream_swap."""
    return _stream_knn_serve_impl(
        spark, sf_dir, residual=False, tenant=True
    )


def stream_knn_residual_tenant_serve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The filters × encodings × serving-modes matrix CLOSED: tenant
    filtering + residual encoding + streaming in one gated row —
    arriving queries carry their tenant, each micro-batch re-resolves
    the versioned RESIDUAL snapshot, reads its meta row, and serves
    through :func:`SIM.ivfpq_residual_serve` with the label pre-filter
    inside candidate generation.  Shares ``knn_ivfpq_residual_tenant``'s
    oracle verbatim — a stream that dropped the filter, or served the
    residual snapshot with raw ADC arithmetic, fails the hash."""
    return _stream_knn_serve_impl(
        spark, sf_dir, residual=True, tenant=True
    )


def _stream_knn_serve_impl(
    spark: SparkSession, sf_dir: str, residual: bool, tenant: bool = False
) -> DataFrame:
    import os
    import shutil
    import tempfile

    from data_pipelines_using_llm_spark.plans.similarity_queries import (
        QUERY_MOD,
        seed_index_dir,
    )

    tdir = tempfile.mkdtemp(prefix="stream_ann_index_")
    # the sf dir holds every table and a file source wants a directory:
    # stage a symlink-only dir holding just the embeddings file(s)
    src_dir = tempfile.mkdtemp(prefix="stream_knn_src_")
    out_dir = tempfile.mkdtemp(prefix="stream_knn_out_")
    chk = tempfile.mkdtemp(prefix="stream_knn_chk_")
    try:
        # session-shared training committed as this stream's artifact
        # (byte-compatible with ann_index_train's snapshot)
        seed_index_dir(spark, sf_dir, tdir, residual=residual)
        emb_path = os.path.join(sf_dir, "embeddings.parquet")
        if os.path.isdir(emb_path):  # multi-file table: one link per part
            leaves = [
                os.path.join(emb_path, f)
                for f in sorted(os.listdir(emb_path))
                if f.endswith(".parquet")
            ]
        else:
            leaves = [emb_path]
        for i, leaf in enumerate(leaves):
            os.symlink(leaf, os.path.join(src_dir, f"part-{i:05d}.parquet"))
        labels = None
        if tenant:
            from data_pipelines_using_llm_spark.sources.tables import (
                load_table,
            )

            labels = load_table(spark, sf_dir, "embeddings").select(
                "vec_id", F.col("label").cast("long").alias("label")
            )
        run_stream_knn(
            spark, src_dir, tdir, out_dir, chk, query_mod=QUERY_MOD,
            labels=labels,
        )
        return spark.read.parquet(out_dir).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tdir, ignore_errors=True)
        shutil.rmtree(out_dir, ignore_errors=True)
        shutil.rmtree(chk, ignore_errors=True)
        shutil.rmtree(src_dir, ignore_errors=True)


def _stream_knn_oracle() -> str:
    from data_pipelines_using_llm_spark.plans.similarity_queries import (
        _knn_ivfpq_oracle,
    )

    return _knn_ivfpq_oracle()


def _stream_knn_residual_oracle() -> str:
    from data_pipelines_using_llm_spark.plans.similarity_queries import (
        _knn_ivfpq_residual_oracle,
    )

    return _knn_ivfpq_residual_oracle()


def _stream_knn_tenant_oracle() -> str:
    from data_pipelines_using_llm_spark.plans.similarity_queries import (
        _TENANT_CAND_PRED,
        _knn_ivfpq_oracle,
    )

    return _knn_ivfpq_oracle(extra_cand_pred=_TENANT_CAND_PRED)


def _stream_knn_residual_tenant_oracle() -> str:
    from data_pipelines_using_llm_spark.plans.similarity_queries import (
        _TENANT_CAND_PRED,
        _knn_ivfpq_residual_oracle,
    )

    return _knn_ivfpq_residual_oracle(extra_cand_pred=_TENANT_CAND_PRED)


QUERIES = {
    "stream_knn_serve": QuerySpec(
        stream_knn_serve,
        _stream_knn_oracle(),
        "online vector serving: micro-batches of query vectors scored "
        "against the loaded persisted IVFPQ index (batching-invariant, "
        "shares knn_ivfpq's oracle verbatim)",
    ),
    "stream_knn_residual_serve": QuerySpec(
        stream_knn_residual_serve,
        _stream_knn_residual_oracle(),
        "online serving from a RESIDUAL artifact: the stream's "
        "per-version meta read must dispatch the reconstruction "
        "arithmetic (shares knn_ivfpq_residual's oracle verbatim — "
        "raw ADC math on the residual snapshot hash-mismatches)",
    ),
    "stream_knn_tenant_serve": QuerySpec(
        stream_knn_tenant_serve,
        _stream_knn_tenant_oracle(),
        "the multi-tenant serving deployment composed: filtered + "
        "versioned + streaming — arriving queries carry their tenant, "
        "candidates pre-filtered inside generation per micro-batch "
        "(shares knn_ivfpq_tenant's oracle verbatim)",
    ),
    "stream_knn_residual_tenant_serve": QuerySpec(
        stream_knn_residual_tenant_serve,
        _stream_knn_residual_tenant_oracle(),
        "filters x encodings x serving-modes closed: tenant-filtered "
        "streaming serve from a residual snapshot (shares "
        "knn_ivfpq_residual_tenant's oracle verbatim)",
    ),
    "stream_quarantine_events": QuerySpec(
        stream_quarantine_events,
        STREAM_QUARANTINE_ORACLE,
        "streaming dead-letter routing: stateless flag-and-filter split",
    ),
    "stream_user_cms": QuerySpec(stream_user_cms, _stream_user_cms_oracle(), "streaming CMS sketch maintenance (sketch = state)"),
    "stream_static_enrich": QuerySpec(stream_static_enrich, STREAM_STATIC_ENRICH_ORACLE, "stream-static broadcast join"),
    "stream_click_purchase_join": QuerySpec(stream_click_purchase_join, STREAM_CLICK_PURCHASE_ORACLE, "stream-stream interval join"),
    "stream_attributed_hourly": QuerySpec(stream_attributed_hourly, STREAM_ATTRIBUTED_HOURLY_ORACLE, "chained stateful: join then windowed agg"),
    "stream_hourly_counts": QuerySpec(stream_hourly_counts, STREAM_HOURLY_COUNTS_ORACLE, "tumbling window agg"),
    "stream_sliding_avg": QuerySpec(stream_sliding_avg, STREAM_SLIDING_AVG_ORACLE, "sliding window agg"),
    "stream_user_sessions": QuerySpec(stream_user_sessions, STREAM_USER_SESSIONS_ORACLE, "session windows"),
    "stream_dedup_events": QuerySpec(stream_dedup_events, STREAM_DEDUP_ORACLE, "watermark dedup"),
    "stream_user_stats_stateful": QuerySpec(stream_user_stats_stateful, STREAM_USER_STATS_ORACLE, "applyInPandasWithState"),
}

if tws_available():  # pragma: no cover - absent in this sandbox (no protobuf)
    QUERIES["stream_user_engagement_tws"] = QuerySpec(
        stream_user_engagement_tws,
        STREAM_USER_ENGAGEMENT_TWS_ORACLE,
        "transformWithState: ValueState + MapState composite",
    )
