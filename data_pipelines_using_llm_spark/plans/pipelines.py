"""The three reference pipeline archetypes (SURVEY.md §0, §3), composed
from the operator modules as single fused logical plans.

Unlike the reference — which fires an action per quality metric (§4.3.1) —
each pipeline here hands Catalyst ONE plan per materialization point, so a
bronze→silver→gold run is three jobs, not twenty.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipelines_using_llm_spark.functions.exact import exact_avg
from data_pipelines_using_llm_spark.operators.cleaning import clean
from data_pipelines_using_llm_spark.registry import QuerySpec
from data_pipelines_using_llm_spark.sources.tables import load_table


def silver_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Archetype 1 (FE): bronze → quality policies → silver.

    Clean policy: drop rows missing any metric, then deterministic dedup on
    the record key, latest-first (``First experiment/GPT 5 NANO.py:82-86``
    is the deterministic reference variant this standardizes on).
    """
    bronze = load_table(spark, sf_dir, "events")
    return clean(
        bronze,
        key=["user_id", "ts"],
        metric_cols=["value", "event_type"],
        null_policy="drop_any_null",
        dedup_policy="deterministic",
        tiebreaker=[F.col("event_id").desc()],
    )


SILVER_EVENTS_ORACLE = """
SELECT event_id, ts, user_id, event_type, value, props
FROM events
WHERE value IS NOT NULL AND event_type IS NOT NULL
QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1
"""


def monthly_event_gold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Archetype 2 (SE): silver → monthly gold aggregate
    (``Second Experiment/Claude Opus 4.py:201-221`` shape: avg/min/max/count
    per metric per (year, month)) — stacked on the archetype-1 silver so
    the whole bronze→silver→gold lineage is one logical plan."""
    silver = silver_events(spark, sf_dir)
    return (
        silver.groupBy(
            F.year("ts").alias("event_year"),
            F.month("ts").alias("event_month"),
            F.col("event_type"),
        )
        .agg(
            exact_avg("value").alias("avg_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.count(F.lit(1)).alias("total_records"),
        )
    )


MONTHLY_EVENT_GOLD_ORACLE = """
WITH silver AS (
    SELECT event_id, ts, user_id, event_type, value
    FROM events
    WHERE value IS NOT NULL AND event_type IS NOT NULL
    QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1
)
SELECT CAST(year(ts) AS INT)  AS event_year,
       CAST(month(ts) AS INT) AS event_month,
       event_type,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value) AS avg_value,
       min(value)             AS min_value,
       max(value)             AS max_value,
       count(*)               AS total_records
FROM silver
GROUP BY 1, 2, 3
"""


def merged_orders_silver(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Archetype 3 (TE): two sources → disambiguate → inner join on the
    shared key → null gate → merged silver
    (``Third Experiment/Claude Opus 4.py:154-179`` with the P3 pre-join
    renames of ``Third Experiment/GPT 5.py:202-203``).

    Stand-in feeds: ``orders`` ⋈ ``lineitem`` per-order rollup — the join
    key plays the role of the shared ``time`` column.  The lineitem side is
    pre-aggregated before the join (partial aggregation shrinks the shuffle
    to one row per order).
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    from data_pipelines_using_llm_spark.functions.exact import dec

    disc_price = dec("l_extendedprice", "decimal(12,2)") * (
        F.lit(1).cast("decimal(3,2)") - dec("l_discount", "decimal(3,2)")
    )
    li_rollup = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(disc_price).cast("double").alias("line_revenue"),
        )
    )
    return (
        orders.join(li_rollup, orders.o_orderkey == li_rollup.l_orderkey, "inner")
        .filter(F.col("o_totalprice").isNotNull())
        .select(
            "o_orderkey",
            "o_custkey",
            F.date_trunc("day", F.col("o_orderdate")).alias("order_date"),
            "o_totalprice",
            "n_lines",
            "line_revenue",
        )
    )


MERGED_ORDERS_SILVER_ORACLE = """
SELECT o_orderkey, o_custkey,
       date_trunc('day', o_orderdate) AS order_date,
       o_totalprice, n_lines, line_revenue
FROM orders
JOIN (
    SELECT l_orderkey, count(*) AS n_lines,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
               AS line_revenue
    FROM lineitem GROUP BY l_orderkey
) ON o_orderkey = l_orderkey
WHERE o_totalprice IS NOT NULL
"""


def columnar_json_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2+S3+S4 end-to-end, driver-checkable: build hourly-style
    struct-of-arrays JSON payloads from ``events`` IN-PLAN (one payload per
    user-day, arrays sorted for determinism), then ingest them back through
    the native ``from_json`` + ``posexplode(arrays_zip(...))`` adapter
    (sources/columnar_json.py — the distributed replacement for the
    reference's driver-side pivot, ``First experiment/Claude Opus
    4.py:53-84``).  The round trip proves the parse path: output rows must
    equal the source events at the payload's minute granularity."""
    from data_pipelines_using_llm_spark.sources.columnar_json import (
        ISO_HOURLY_FORMAT,
        flatten_hourly,
    )

    events = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    per_day = (
        events.groupBy("user_id", F.date_trunc("day", "ts").alias("_day"))
        .agg(F.array_sort(F.collect_list(F.struct("ts", "value"))).alias("_sa"))
        .select(
            "user_id",
            F.to_json(
                F.struct(
                    F.struct(
                        F.transform(
                            "_sa", lambda x: F.date_format(x["ts"], ISO_HOURLY_FORMAT)
                        ).alias("time"),
                        F.transform("_sa", lambda x: x["value"]).alias("value"),
                    ).alias("hourly")
                )
            ).alias("payload"),
        )
    )
    rows = flatten_hourly(per_day, metrics=["value"], keep_cols=["user_id"])
    return rows.select("user_id", "event_time", "value")


COLUMNAR_JSON_INGEST_ORACLE = """
SELECT user_id, date_trunc('minute', ts) AS event_time, value
FROM events
WHERE ts IS NOT NULL
"""


def silver_events_lenient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's LENIENT cleaning variant (keep rows with ANY metric
    present — ``First experiment/Claude Sonnet 4.py:325-341`` — plus
    full-row DISTINCT dedup, D5 ``:329-341``), as opposed to
    silver_events' strict drop-any-null policy."""
    from data_pipelines_using_llm_spark.operators.cleaning import (
        dedup_full_row,
        keep_if_any_present,
    )

    events = load_table(spark, sf_dir, "events")
    kept = keep_if_any_present(events, ["value", "props"])
    return dedup_full_row(
        kept.select("event_id", "ts", "user_id", "event_type", "value", "props")
    )


SILVER_EVENTS_LENIENT_ORACLE = """
SELECT DISTINCT event_id, ts, user_id, event_type, value, props
FROM events
WHERE value IS NOT NULL OR props IS NOT NULL
"""


QUERIES = {
    "silver_events_lenient": QuerySpec(
        silver_events_lenient,
        SILVER_EVENTS_LENIENT_ORACLE,
        "lenient clean policy + full-row dedup",
    ),
    "columnar_json_ingest": QuerySpec(
        columnar_json_ingest,
        COLUMNAR_JSON_INGEST_ORACLE,
        "S2-S4 columnar-JSON round trip",
    ),
    "silver_events": QuerySpec(silver_events, SILVER_EVENTS_ORACLE, "archetype 1: bronze→silver"),
    "monthly_event_gold": QuerySpec(monthly_event_gold, MONTHLY_EVENT_GOLD_ORACLE, "archetype 2: silver→gold"),
    "merged_orders_silver": QuerySpec(merged_orders_silver, MERGED_ORDERS_SILVER_ORACLE, "archetype 3: join silver"),
}
