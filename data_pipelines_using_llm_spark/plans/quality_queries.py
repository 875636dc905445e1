"""Quality-operator queries (SURVEY.md §2.13) bound to the driver's
``events`` table, each with a DuckDB oracle.

The profiles run over (user_id, ts) as the record key and ``value`` /
``props`` as the metric columns — the same shapes the reference computes
over (timestamp, pollutant columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipelines_using_llm_spark.operators import quality
from data_pipelines_using_llm_spark.registry import QuerySpec
from data_pipelines_using_llm_spark.sources.tables import load_table

EVENT_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


def null_profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 one-pass null profile (vs the reference's per-column job loop,
    ``First experiment/Claude Opus 4.py:182-183``)."""
    return quality.null_profile(load_table(spark, sf_dir, "events"), EVENT_COLS)


NULL_PROFILE_ORACLE = """
SELECT count(*) AS total_records,
       count(*) - count(event_id)   AS event_id_nulls,
       count(*) - count(ts)         AS ts_nulls,
       count(*) - count(user_id)    AS user_id_nulls,
       count(*) - count(event_type) AS event_type_nulls,
       count(*) - count(value)      AS value_nulls,
       count(*) - count(props)      AS props_nulls
FROM events
"""


def null_rate_report_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 tall form: (column, nulls, pct) — scales to wide tables."""
    return quality.null_rate_columns(
        load_table(spark, sf_dir, "events"), ["value", "props", "event_type"]
    )


NULL_RATE_REPORT_ORACLE = """
WITH t AS (SELECT count(*) AS total_records,
                  count(*) - count(value)      AS value_nulls,
                  count(*) - count(props)      AS props_nulls,
                  count(*) - count(event_type) AS event_type_nulls
           FROM events)
SELECT 'value' AS "column", value_nulls AS nulls,
       round(value_nulls * 100.0 / total_records, 4) AS null_pct, total_records FROM t
UNION ALL
SELECT 'props', props_nulls,
       round(props_nulls * 100.0 / total_records, 4), total_records FROM t
UNION ALL
SELECT 'event_type', event_type_nulls,
       round(event_type_nulls * 100.0 / total_records, 4), total_records FROM t
"""


def duplicate_stats_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2/D1/D2: one-row duplicate stats on the (user_id, ts) record key."""
    return quality.duplicate_stats(
        load_table(spark, sf_dir, "events"), ["user_id", "ts"]
    )


DUPLICATE_STATS_ORACLE = """
WITH per_key AS (
    SELECT user_id, ts, count(*) AS n FROM events GROUP BY user_id, ts
)
SELECT CAST(sum(n) AS BIGINT)                                  AS total_records,
       count(*)                                                AS distinct_keys,
       CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT)  AS dup_keys,
       CAST(sum(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT)  AS dup_rows,
       CAST(sum(n) - count(*) AS BIGINT)                       AS excess_rows
FROM per_key
"""


def duplicate_profile_user_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 top-offenders on a coarser key (user_id, day) where duplicates
    actually exist — the ``HAVING COUNT(*)>1 ORDER BY count DESC LIMIT``
    report of ``First experiment/Claude Sonnet 4.py:296-308``."""
    e = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.date_trunc("day", F.col("ts"))
    )
    return quality.duplicate_profile(e, ["user_id", "event_date"], top_k=10)


DUPLICATE_PROFILE_ORACLE = """
SELECT user_id, date_trunc('day', ts) AS event_date, count(*) AS n_copies
FROM events
GROUP BY 1, 2
HAVING count(*) > 1
ORDER BY n_copies DESC, user_id, event_date
LIMIT 10
"""


def completeness_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 completeness % (``Third Experiment/Claude Sonnet 4.py:256-265``)."""
    return quality.completeness(
        load_table(spark, sf_dir, "events"), ["value", "props", "event_type"]
    )


COMPLETENESS_ORACLE = """
SELECT count(*) AS total_records,
       count(value) + count(props) + count(event_type) AS non_null_cells,
       count(*) * 3 AS total_cells,
       round((count(value) + count(props) + count(event_type)) * 100.0
             / (count(*) * 3), 4) AS completeness_pct
FROM events
"""


def quality_report_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 full quality report — totals, dup stats, per-metric nulls,
    retention (``First experiment/Claude Opus 4.py:161-167`` shape)."""
    return quality.quality_report(
        load_table(spark, sf_dir, "events"),
        key=["user_id", "ts"],
        metric_cols=["value", "props"],
    )


QUALITY_REPORT_ORACLE = """
WITH base AS (
    SELECT user_id, ts,
           CASE WHEN value IS NULL OR props IS NULL THEN 1 ELSE 0 END AS any_null,
           CASE WHEN value IS NULL THEN 1 ELSE 0 END AS value_null,
           CASE WHEN props IS NULL THEN 1 ELSE 0 END AS props_null
    FROM events
), per_key AS (
    SELECT user_id, ts, count(*) AS n, sum(any_null) AS n_null,
           sum(value_null) AS value_nulls, sum(props_null) AS props_nulls
    FROM base GROUP BY user_id, ts
)
SELECT CAST(sum(n) AS BIGINT)             AS total_records,
       CAST(count(*) AS BIGINT)           AS distinct_keys,
       CAST(sum(n) - count(*) AS BIGINT)  AS excess_dup_rows,
       CAST(sum(n_null) AS BIGINT)        AS rows_with_any_null,
       CAST(sum(n) - sum(n_null) AS BIGINT) AS clean_records,
       round((sum(n) - sum(n_null)) * 100.0 / sum(n), 4) AS retention_pct,
       CAST(sum(value_nulls) AS BIGINT)   AS value_nulls,
       CAST(sum(props_nulls) AS BIGINT)   AS props_nulls
FROM per_key
"""


def health_check_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 health check (``First experiment/Claude Sonnet 4.py:699-779``),
    anchored to data timestamps for determinism."""
    return quality.health_check(
        load_table(spark, sf_dir, "events"),
        ts_col="ts",
        metric_cols=["value", "props"],
    )


HEALTH_CHECK_ORACLE = """
WITH agg AS (
    SELECT count(*) AS total_records,
           min(ts)  AS min_ts,
           max(ts)  AS max_ts,
           round((count(value) + count(props)) * 100.0 / (count(*) * 2), 4)
               AS completeness_pct
    FROM events
)
SELECT total_records, min_ts, max_ts, completeness_pct,
       total_records > 0                                   AS has_rows,
       max_ts >= min_ts + INTERVAL 48 HOUR                 AS spans_freshness_window,
       completeness_pct >= 50.0                            AS is_complete_enough,
       CAST(total_records > 0 AS INT)
       + CAST(max_ts >= min_ts + INTERVAL 48 HOUR AS INT)
       + CAST(completeness_pct >= 50.0 AS INT)             AS checks_passed
FROM agg
"""


def monitoring_view_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 monitoring view body (``First experiment/Claude Sonnet 4.py:651-690``):
    per-ingestion-bucket counts, nulls and averages."""
    e = load_table(spark, sf_dir, "events")
    return quality.monitoring_summary(
        e, F.date_trunc("day", F.col("ts")), ["value"]
    ).withColumnRenamed("bucket", "event_date")


MONITORING_VIEW_ORACLE = """
SELECT date_trunc('day', ts)  AS event_date,
       count(*)                AS n_records,
       count(*) - count(value) AS value_nulls,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value) AS value_avg
FROM events
GROUP BY 1
"""


def summary_stats_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 summary statistics (the reference's ``df.summary()`` /
    ``describe()``, ``Second Experiment/GPT 5.py:141-142``) computed in ONE
    grouped pass with order-independent moments: decimal-exact sum and
    sum-of-squares, stddev derived in double by the same expression on
    both engines (bit-identical)."""
    d = load_table(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(18,2)")
    n = F.count("value")
    sx = F.sum(dec).cast("double")
    sx2 = F.sum(dec * dec).cast("double")
    return d.groupBy("event_type").agg(
        n.alias("n_values"),
        (sx / n).alias("mean_value"),
        F.sqrt((sx2 - sx * sx / n) / (n - F.lit(1))).alias("std_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


SUMMARY_STATS_ORACLE = """
WITH s AS (
    SELECT event_type,
           count(value) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sx,
           CAST(sum(CAST(value AS DECIMAL(18,2))
                    * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sx2,
           min(value) AS min_value,
           max(value) AS max_value
    FROM events GROUP BY event_type
)
SELECT event_type,
       n AS n_values,
       sx / n AS mean_value,
       sqrt((sx2 - sx * sx / n) / (n - 1)) AS std_value,
       min_value,
       max_value
FROM s
"""


def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per event_type (both engines use the
    same ``pos = p*(n-1)`` linear interpolation, so doubles agree).  At
    100 TB swap ``percentile`` for ``percentile_approx`` (t-digest sketch,
    single pass, mergeable partials) — same plan shape, bounded error."""
    d = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    return d.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("p50"),
        F.expr("percentile(value, 0.9)").alias("p90"),
        F.expr("percentile(value, 0.99)").alias("p99"),
    )


VALUE_PERCENTILES_ORACLE = """
SELECT event_type,
       quantile_cont(value, 0.5)  AS p50,
       quantile_cont(value, 0.9)  AS p90,
       quantile_cont(value, 0.99) AS p99
FROM events
WHERE value IS NOT NULL
GROUP BY event_type
"""


_PCT_ACCURACY = 1000  # percentile_approx: rank error <= floor(n/accuracy)
_PCT_TARGETS = {"50": 0.5, "90": 0.9, "99": 0.99}


def value_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB percentile path (``percentile_approx`` = mergeable
    t-digest-style sketch, no sorted shuffle of raw values) — verified
    through a full cross-engine gate rather than rows-only: both engines
    emit, per group, the EXACT values at ranks ``floor(p*(n-1))+1-delta``
    and ``ceil(p*(n-1))+1+delta`` (delta = the sketch's documented rank
    error ``floor(n/accuracy)`` + 2 slack), and an ``in_band`` flag.  The
    oracle's flag is the literal expectation (1); Spark's is computed from
    the sketch — a drifting sketch flips the flag and fails the hash gate.

    The rank-selection scaffolding (row_number per event_type) is the
    verification harness, not the production path: at 100 TB you run ONLY
    the sketch aggregation; the band check runs on samples/test SFs.
    """
    from pyspark.sql import Window

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", "value")
    )
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_values"),
        *[
            F.percentile_approx("value", p, _PCT_ACCURACY).alias(f"a{t}")
            for t, p in _PCT_TARGETS.items()
        ],
    )
    delta = F.floor(F.col("n_values") / _PCT_ACCURACY) + F.lit(2)
    bands = stats.withColumn("delta", delta.cast("long"))
    for t, p in _PCT_TARGETS.items():
        base = F.col("n_values") - F.lit(1)
        bands = bands.withColumn(
            f"lo{t}_rn",
            F.greatest(F.lit(1).cast("long"), F.floor(F.lit(p) * base) + 1 - F.col("delta")),
        ).withColumn(
            f"hi{t}_rn",
            F.least(F.col("n_values"), F.ceil(F.lit(p) * base) + 1 + F.col("delta")),
        )
    stack_parts = ", ".join(
        f"'{side}{t}', {side}{t}_rn" for t in _PCT_TARGETS for side in ("lo", "hi")
    )
    targets = bands.selectExpr(
        "event_type", f"stack({2 * len(_PCT_TARGETS)}, {stack_parts}) AS (tag, rn)"
    )
    ranked = ev.withColumn(
        "rn", F.row_number().over(Window.partitionBy("event_type").orderBy("value"))
    )
    picked = ranked.join(F.broadcast(targets), ["event_type", "rn"])
    vals = picked.groupBy("event_type").agg(
        *[
            F.max(F.when(F.col("tag") == f"{side}{t}", F.col("value"))).alias(
                f"p{t}_{side}"
            )
            for t in _PCT_TARGETS
            for side in ("lo", "hi")
        ]
    )
    out = stats.join(vals, "event_type")
    cols = [F.col("event_type"), F.col("n_values")]
    for t in _PCT_TARGETS:
        cols += [
            F.col(f"p{t}_lo"),
            F.col(f"p{t}_hi"),
            F.when(
                F.col(f"a{t}").between(F.col(f"p{t}_lo"), F.col(f"p{t}_hi")), 1
            )
            .otherwise(0)
            .cast("long")
            .alias(f"p{t}_in_band"),
        ]
    return out.select(*cols)


VALUE_PERCENTILES_APPROX_ORACLE = f"""
WITH ev AS (SELECT event_type, value FROM events WHERE value IS NOT NULL),
stats AS (
    SELECT event_type, count(*) AS n,
           CAST(floor(count(*) / {_PCT_ACCURACY}) + 2 AS BIGINT) AS delta
    FROM ev GROUP BY event_type
),
ranked AS (
    SELECT event_type, value,
           row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn
    FROM ev
),
bands AS (
    SELECT event_type, n,
           greatest(1, CAST(floor(0.5 * (n - 1)) AS BIGINT) + 1 - delta)  AS lo50_rn,
           least(n, CAST(ceil(0.5 * (n - 1)) AS BIGINT) + 1 + delta)      AS hi50_rn,
           greatest(1, CAST(floor(0.9 * (n - 1)) AS BIGINT) + 1 - delta)  AS lo90_rn,
           least(n, CAST(ceil(0.9 * (n - 1)) AS BIGINT) + 1 + delta)      AS hi90_rn,
           greatest(1, CAST(floor(0.99 * (n - 1)) AS BIGINT) + 1 - delta) AS lo99_rn,
           least(n, CAST(ceil(0.99 * (n - 1)) AS BIGINT) + 1 + delta)     AS hi99_rn
    FROM stats
)
SELECT b.event_type, b.n AS n_values,
       max(CASE WHEN r.rn = b.lo50_rn THEN r.value END) AS p50_lo,
       max(CASE WHEN r.rn = b.hi50_rn THEN r.value END) AS p50_hi,
       CAST(1 AS BIGINT) AS p50_in_band,
       max(CASE WHEN r.rn = b.lo90_rn THEN r.value END) AS p90_lo,
       max(CASE WHEN r.rn = b.hi90_rn THEN r.value END) AS p90_hi,
       CAST(1 AS BIGINT) AS p90_in_band,
       max(CASE WHEN r.rn = b.lo99_rn THEN r.value END) AS p99_lo,
       max(CASE WHEN r.rn = b.hi99_rn THEN r.value END) AS p99_hi,
       CAST(1 AS BIGINT) AS p99_in_band
FROM bands b JOIN ranked r ON r.event_type = b.event_type
GROUP BY b.event_type, b.n
"""


def sql_bronze_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-first entry point (SURVEY.md §3 entry 2): the quality
    report expressed as a ``spark.sql`` string over registered views —
    the reference's only query-language frontend is f-string SQL
    (``First experiment/Claude Sonnet 4.py:229-233,475-497``).  Identical
    text runs on DuckDB, so the oracle IS the query."""
    from data_pipelines_using_llm_spark.sources.tables import register_views

    register_views(spark, sf_dir, names=("events",))
    return spark.sql(SQL_BRONZE_STATS)


SQL_BRONZE_STATS = """
SELECT count(*) AS total_records,
       count(DISTINCT user_id) AS distinct_users,
       date_trunc('minute', min(ts)) AS min_minute,
       date_trunc('minute', max(ts)) AS max_minute,
       count(CASE WHEN value IS NOT NULL THEN 1 END) AS value_present,
       round(count(CASE WHEN value IS NOT NULL THEN 1 END)
             * CAST(100 AS DOUBLE) / count(*), 4) AS value_completeness_pct
FROM events
"""


QUERIES = {
    "null_profile_events": QuerySpec(
        null_profile_events, NULL_PROFILE_ORACLE, "Q1 one-pass null profile"
    ),
    "sql_bronze_stats": QuerySpec(
        sql_bronze_stats, SQL_BRONZE_STATS, "SQL-first entry point (A4)"
    ),
    "summary_stats_events": QuerySpec(
        summary_stats_events, SUMMARY_STATS_ORACLE,
        "A6 one-pass summary statistics",
    ),
    "value_percentiles": QuerySpec(
        value_percentiles, VALUE_PERCENTILES_ORACLE,
        "exact percentiles (approx at scale)",
    ),
    "value_percentiles_approx": QuerySpec(
        value_percentiles_approx, VALUE_PERCENTILES_APPROX_ORACLE,
        "percentile sketch vs exact rank band (cross-engine gate)",
    ),
    "null_rate_report_events": QuerySpec(
        null_rate_report_events, NULL_RATE_REPORT_ORACLE,
        "Q1 tall null-rate report",
    ),
    "duplicate_stats_events": QuerySpec(
        duplicate_stats_events, DUPLICATE_STATS_ORACLE, "Q2 dup stats"
    ),
    "duplicate_profile_user_day": QuerySpec(
        duplicate_profile_user_day, DUPLICATE_PROFILE_ORACLE,
        "Q2 top dup keys",
    ),
    "completeness_events": QuerySpec(
        completeness_events, COMPLETENESS_ORACLE, "Q7 completeness"
    ),
    "quality_report_events": QuerySpec(
        quality_report_events, QUALITY_REPORT_ORACLE, "Q4 quality report"
    ),
    "health_check_events": QuerySpec(
        health_check_events, HEALTH_CHECK_ORACLE, "Q5 health check"
    ),
    "monitoring_view_events": QuerySpec(
        monitoring_view_events, MONITORING_VIEW_ORACLE, "Q6 monitoring view"
    ),
}
