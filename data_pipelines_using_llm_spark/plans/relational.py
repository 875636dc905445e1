"""Relational core queries (SURVEY.md §2.3 P*/F*, §2.5 J*, §2.6 A*,
§2.7 W1, §2.8 O*, §2.9) over the driver's TPC-H-ish tables.

Every query is declarative DataFrame API so Catalyst gets predicate
pushdown, column pruning and join selection; small dimension tables are
broadcast explicitly.  Each entry has a DuckDB oracle with IDENTICAL output
column names.  All money-column aggregates go through the exact-decimal
helpers (`functions/exact.py`) so both engines produce bit-identical
doubles — plain double sums are summation-order dependent and flake on
round() boundaries (SURVEY.md §7.3.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipelines_using_llm_spark.functions.exact import dec, exact_avg, exact_sum
from data_pipelines_using_llm_spark.registry import QuerySpec
from data_pipelines_using_llm_spark.sources.tables import load_table


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2 archetype (grouped multi-metric aggregate with null-ignoring
    avg — ``Second Experiment/Claude 4 Sonnet.py:233-250``) in its classic
    TPC-H-Q1 shape: scan one fact table, filter (pushed to parquet),
    group by two low-cardinality keys, 8 aggregates.

    Scale: map-side partial aggregation means only (flag,status) groups
    shuffle — a few rows per input partition regardless of table size.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = dec("l_extendedprice", "decimal(12,2)") * (
        F.lit(1).cast("decimal(3,2)") - dec("l_discount", "decimal(3,2)")
    )
    charge = disc_price * (
        F.lit(1).cast("decimal(3,2)") + dec("l_tax", "decimal(3,2)")
    )
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            exact_sum("l_quantity").alias("sum_qty"),
            exact_sum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            exact_avg("l_quantity").alias("avg_qty"),
            exact_avg("l_extendedprice").alias("avg_price"),
            exact_avg("l_discount", "decimal(3,2)").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)      AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
           AS sum_disc_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))
                * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))) AS DOUBLE)
           AS sum_charge,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(l_quantity)
           AS avg_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(l_extendedprice)
           AS avg_price,
       CAST(sum(CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) / count(l_discount)
           AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def monthly_sales_gold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment-2 gold archetype: monthly multi-stat rollup
    (``Second Experiment/Claude Opus 4.py:201-221`` — avg+min+max+count per
    metric per (year, month)), on ``orders``."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").alias("o_year"),
            F.month("o_orderdate").alias("o_month"),
        )
        .agg(
            exact_avg("o_totalprice").alias("avg_price"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
            exact_sum("o_totalprice").alias("sum_price"),
            F.count(F.lit(1)).alias("total_records"),
        )
    )


MONTHLY_SALES_ORACLE = """
SELECT CAST(year(o_orderdate) AS INT)  AS o_year,
       CAST(month(o_orderdate) AS INT) AS o_month,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(o_totalprice)
                                       AS avg_price,
       min(o_totalprice)               AS min_price,
       max(o_totalprice)               AS max_price,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       count(*)                        AS total_records
FROM orders
GROUP BY 1, 2
"""


def region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/J2 multi-join archetype (``Third Experiment/Claude Opus 4.py:154-179``)
    scaled up: fact ⋈ three dimensions, grouped rollup.

    The dimensions are broadcast — at 100 TB the orders fact never
    shuffles for these joins; only the final tiny groupBy shuffles.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            exact_sum("o_totalprice").alias("revenue"),
            exact_avg("o_totalprice").alias("avg_order_value"),
            F.count_distinct(F.col("c_custkey")).alias("n_customers"),
        )
    )


REGION_REVENUE_ORACLE = """
SELECT r_name                         AS region_name,
       count(*)                       AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(o_totalprice)
                                      AS avg_order_value,
       count(DISTINCT c_custkey)      AS n_customers
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2 top-k: ``ORDER BY … LIMIT`` compiles to TakeOrderedAndProject —
    each partition keeps only its local top-k, so no global sort at scale
    (``First experiment/Claude Sonnet 4.py:605-615`` is the reference shape).
    Tiebreak on the unique key keeps the result deterministic."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


TOP_ORDERS_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
"""


def top_events_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 extension — top-k per group via ranking window.  One shuffle on
    the partition key; rows never leave their partition for the rank."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("value").desc(), F.col("event_id")
    )
    return (
        e.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("user_id", "event_id", "event_type", "value", "rnk")
    )


TOP_EVENTS_PER_USER_ORACLE = """
SELECT user_id, event_id, event_type, value,
       CAST(row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS INT) AS rnk
FROM events
QUALIFY rnk <= 3
"""


def latest_event_per_user_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4 deterministic keep-first dedup (``First experiment/GPT 5 NANO.py:82-86``
    semantics): one row per (user_id, event_type), latest ``ts`` wins,
    unique ``event_id`` as final tiebreaker."""
    from data_pipelines_using_llm_spark.operators.cleaning import dedup_deterministic

    e = load_table(spark, sf_dir, "events")
    return dedup_deterministic(
        e,
        ["user_id", "event_type"],
        [F.col("ts").desc(), F.col("event_id").desc()],
    ).select("user_id", "event_type", "event_id", "ts", "value")


LATEST_EVENT_ORACLE = """
SELECT user_id, event_type, event_id, ts, value
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id, event_type
                           ORDER BY ts DESC, event_id DESC) = 1
"""


def daily_event_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 time-bucketed report (``First experiment/Claude Sonnet 4.py:588-600``
    daily trend): per-day per-type counts and averages."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("day", F.col("ts")).alias("event_date"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            exact_avg("value").alias("avg_value"),
            exact_sum("value").alias("sum_value"),
        )
    )


DAILY_TREND_ORACLE = """
SELECT date_trunc('day', ts)    AS event_date,
       event_type,
       count(*)                  AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value) AS avg_value,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)               AS sum_value
FROM events
GROUP BY 1, 2
"""


def hourly_peak_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 hour-of-day peak report (``First experiment/Claude Sonnet 4.py:604-615``
    — top-10 hours by average metric).  The average is decimal-exact so
    the top-10 cut is identical across engines; hour tiebreaks."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(F.hour("ts").alias("hour_of_day")).agg(
        exact_avg("value").alias("avg_value"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return (
        hourly.orderBy(F.col("avg_value").desc(), F.col("hour_of_day"))
        .limit(10)
    )


HOURLY_PEAK_ORACLE = """
SELECT CAST(hour(ts) AS INT) AS hour_of_day,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value) AS avg_value,
       count(*)              AS n_events
FROM events
GROUP BY 1
ORDER BY avg_value DESC, hour_of_day
LIMIT 10
"""


def freshness_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 threshold/freshness predicate
    (``First experiment/Claude Sonnet 4.py:733-737`` — "rows in the last
    48h"), anchored to max(ts) in the data instead of wall-clock NOW() so
    the check is deterministic.  The one-row max is broadcast — no shuffle
    of the fact side."""
    e = load_table(spark, sf_dir, "events")
    anchor = e.agg(F.max("ts").alias("_max_ts"))
    return (
        e.join(F.broadcast(anchor))
        .filter(F.col("ts") >= F.col("_max_ts") - F.expr("INTERVAL 48 HOURS"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_recent"),
            exact_avg("value").alias("avg_recent_value"),
        )
    )


FRESHNESS_ORACLE = """
SELECT event_type,
       count(*) AS n_recent,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value) AS avg_recent_value
FROM events
WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 48 HOUR
GROUP BY event_type
"""


def union_splice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 set-op surface: the reference's only union is the implicit
    UNION ALL of append-mode re-ingestion (``First experiment/Claude Opus
    4.py:129``); here made explicit with ``unionByName`` over two filtered
    slices, then re-aggregated."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "value"
    )
    errors = e.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "value"
    )
    return (
        purchases.unionByName(errors)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            exact_sum("value").alias("sum_value"),
        )
    )


UNION_SPLICE_ORACLE = """
SELECT user_id,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM (
    SELECT event_id, user_id, value FROM events WHERE event_type = 'purchase'
    UNION ALL
    SELECT event_id, user_id, value FROM events WHERE event_type = 'error'
)
GROUP BY user_id
"""


def customer_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 + A1 (experiment-3 merged-silver shape): broadcast-join enrich
    then per-segment stats; P3 pre-join disambiguation via select/alias."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", F.col("c_acctbal").alias("acctbal")
    )
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "inner")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            exact_sum("o_totalprice").alias("revenue"),
            exact_avg("acctbal").alias("avg_acctbal"),
        )
    )


CUSTOMER_ORDER_STATS_ORACLE = """
SELECT c_mktsegment AS segment,
       count(*)     AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(c_acctbal)
                    AS avg_acctbal
FROM orders
JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def rolling_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 extension flagged in SURVEY: rolling window over time buckets
    (``rowsBetween(-6, 0)`` 7-day moving average of daily order revenue).
    The global-ordered window runs on ONE row per day — bounded and tiny
    after the pre-aggregation, so the single-partition sort is safe at any
    input scale."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.date_trunc("day", F.col("o_orderdate")).alias("order_date")).agg(
        exact_sum("o_totalprice").alias("day_revenue")
    )
    w = Window.orderBy("order_date").rowsBetween(-6, 0)
    return daily.select(
        "order_date",
        "day_revenue",
        F.round(F.avg("day_revenue").over(w), 4).alias("revenue_7d_avg"),
    )


ROLLING_DAILY_REVENUE_ORACLE = """
WITH daily AS (
    SELECT date_trunc('day', o_orderdate) AS order_date,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS day_revenue
    FROM orders GROUP BY 1
)
SELECT order_date, day_revenue,
       round(avg(day_revenue) OVER (ORDER BY order_date
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS revenue_7d_avg
FROM daily
"""


def user_trailing_10min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE window frame (value-based — the semantic sibling
    ``rolling_daily_revenue``'s ROWS frame cannot express): per event,
    how many events and how much value the same user produced in the
    trailing 10 minutes.  A ROWS frame would be wrong whenever events
    are irregularly spaced; RANGE bounds the frame by the ORDER-BY value
    itself, so gaps and ties are handled identically on both engines
    (all rows with equal order value enter the frame together).

    Scale: one shuffle on user_id; each user's partition sorts once and
    the frame is maintained incrementally by the window operator.
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-600, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.count(F.lit(1)).over(w).alias("n_trailing_10m"),
        F.sum(dec("value", "decimal(18,2)")).over(w).cast("double").alias(
            "value_trailing_10m"
        ),
    )


USER_TRAILING_10MIN_ORACLE = """
SELECT event_id, user_id, ts,
       count(*) OVER w AS n_trailing_10m,
       CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
           AS value_trailing_10m
FROM events
WINDOW w AS (PARTITION BY user_id
             ORDER BY CAST(epoch(date_trunc('second', ts)) AS BIGINT)
             RANGE BETWEEN 600 PRECEDING AND CURRENT ROW)
"""


def part_type_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 ratio-% report shape (``First experiment/Claude Sonnet 4.py:861-867``
    ``AVG(CASE WHEN…)*100``): revenue share of PROMO-like part types —
    conditional aggregation in one pass over the join."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    rev = dec("l_extendedprice", "decimal(12,2)") * (
        F.lit(1).cast("decimal(3,2)") - dec("l_discount", "decimal(3,2)")
    )
    zero = F.lit(0).cast("decimal(16,4)")
    return joined.agg(
        F.round(
            F.sum(
                F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(zero)
            ).cast("double")
            * 100.0
            / F.sum(rev).cast("double"),
            4,
        ).alias("promo_revenue_pct"),
        F.count(F.lit(1)).alias("n_lineitems"),
    )


PART_TYPE_SHARE_ORACLE = """
SELECT round(CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
                      THEN CAST(l_extendedprice AS DECIMAL(12,2))
                           * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))
                      ELSE CAST(0 AS DECIMAL(16,4)) END) AS DOUBLE) * 100.0
             / CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE),
             4) AS promo_revenue_pct,
       count(*) AS n_lineitems
FROM lineitem JOIN part ON l_partkey = p_partkey
"""


def purchase_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (the §2.5 temporal extension — no reference counterpart):
    attach to every ``purchase`` event the user's most recent preceding
    ``click`` (inclusive).  Implemented union+window (operators/asof.py):
    one shuffle on user_id, no range-join explosion."""
    from data_pipelines_using_llm_spark.operators.asof import asof_join

    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    # unique predecessor per (user, ts): keep the highest event_id
    w = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            "user_id",
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_event_id"),
            F.col("value").alias("click_value"),
        )
        .withColumn("rn", F.row_number().over(
            Window.partitionBy("user_id", "click_ts").orderBy(
                F.col("click_event_id").desc()
            )
        ))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    return asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="click_ts",
        value_cols=["click_event_id", "click_ts", "click_value"],
    )


PURCHASE_CLICK_ATTRIBUTION_ORACLE = """
WITH clicks AS (
    SELECT user_id, ts AS click_ts, event_id AS click_event_id,
           value AS click_value
    FROM events
    WHERE event_type = 'click'
    QUALIFY row_number() OVER (PARTITION BY user_id, ts
                               ORDER BY event_id DESC) = 1
)
SELECT p.event_id, p.user_id, p.ts,
       c.click_event_id, c.click_ts, c.click_value
FROM (SELECT event_id, user_id, ts FROM events
      WHERE event_type = 'purchase') p
ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.ts >= c.click_ts
"""


def user_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() window extension (§2.7 — the reference's only window fn is
    row_number): inter-event gap in seconds per user, the base signal for
    sessionization and anomaly detection."""
    events = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "user_id",
        "event_id",
        "ts",
        (
            F.unix_timestamp("ts")
            - F.unix_timestamp(F.lag("ts").over(w))
        ).alias("gap_seconds"),
    )


USER_EVENT_GAPS_ORACLE = """
SELECT user_id, event_id, ts,
       epoch(date_trunc('second', ts))
       - epoch(date_trunc('second',
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)))
           AS gap_seconds
FROM events
WHERE ts IS NOT NULL
"""


def props_k_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar functions (§2.10 — the reference parses ALL JSON in
    driver Python; here ``get_json_object`` extracts executor-side, fully
    pushdown/codegen-friendly): per-type stats of the ``props.k`` field."""
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return events.groupBy("event_type").agg(
        F.count(k).alias("n_with_props"),
        F.sum(k).alias("sum_k"),
        (F.sum(k).cast("double") / F.count(k)).alias("avg_k"),
    )


PROPS_K_STATS_ORACLE = """
SELECT event_type,
       count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_props,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
           AS sum_k,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE)
           / count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS avg_k
FROM events
GROUP BY event_type
"""


BLOOM_PRUNE_THRESHOLD = 490_000  # ~18% of customers: the filter must
# actually discriminate (the BIG_ORDER_THRESHOLD set covers ~87% of
# customers — any filter saturates on it)


def bloom_customer_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join pruning, measured end to end: the
    big-order customer keys build a 128-bit Bloom filter (mergeable
    (word, mask) rows — operators/sketch.py::bloom_build), every
    customer is probed, and the output is the filter's confusion
    summary: probe count, true members, Bloom positives, false
    positives (the filter is deliberately undersized so the FP path is
    EXERCISED at the driver's gate), false negatives (must be 0 — the
    gate proves the no-false-negative contract on both engines), and
    the realized FP rate.

    This is the runtime-filter pattern Spark's own
    ``spark.sql.optimizer.runtime.bloomFilter`` applies inside joins
    (plan-gated in tests/test_plans.py), exposed as an OPERATOR so a
    pipeline can ship a filter to a different system — the filter
    travels as ≤ bits/32 integer rows and merges by OR.  Everything is
    BIGINT (char-hash fold, Lehmer mix, sub-2^32 masks), so the whole
    confusion table hash-gates cross-engine.
    """
    from data_pipelines_using_llm_spark.operators.sketch import (
        bloom_build,
        bloom_probe,
    )

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    big = (
        orders.filter(F.col("o_totalprice") > BLOOM_PRUNE_THRESHOLD)
        .select(F.col("o_custkey").alias("key"))
        .distinct()
    )
    bloom = bloom_build(big, "key")
    probed = bloom_probe(
        bloom, customer.select(F.col("c_custkey").alias("key")), "key"
    )
    flagged = probed.join(
        big.withColumn("actual", F.lit(1)), "key", "left"
    ).select(
        "bloom_member", F.coalesce("actual", F.lit(0)).alias("actual")
    )
    return flagged.agg(
        F.count(F.lit(1)).alias("n_probed"),
        F.sum("actual").alias("n_members"),
        F.sum("bloom_member").alias("n_bloom_positive"),
        F.sum(F.col("bloom_member") * (1 - F.col("actual"))).alias(
            "n_false_positive"
        ),
        F.sum(F.col("actual") * (1 - F.col("bloom_member"))).alias(
            "n_false_negative"
        ),
        F.round(
            F.sum(F.col("bloom_member") * (1 - F.col("actual")))
            / (F.count(F.lit(1)) - F.sum("actual")),
            6,
        ).alias("fp_rate"),
    )


def _bloom_prune_oracle() -> str:
    from data_pipelines_using_llm_spark.operators.sketch import (
        BLOOM_BITS,
        BLOOM_K,
        sql_bloom_pos,
    )
    from data_pipelines_using_llm_spark.plans.text_queries import SQL_CHAR_HASH

    h_big = SQL_CHAR_HASH.format(s="CAST(key AS VARCHAR)")
    build_pos = "\nUNION ALL\n".join(
        f"SELECT {sql_bloom_pos('h', r, BLOOM_BITS)} AS pos FROM bh"
        for r in range(BLOOM_K)
    )
    probe_pos = "\nUNION ALL\n".join(
        f"SELECT key, {sql_bloom_pos('h', r, BLOOM_BITS)} AS pos FROM ph"
        for r in range(BLOOM_K)
    )
    return f"""
WITH big AS (
    SELECT DISTINCT o_custkey AS key FROM orders
    WHERE o_totalprice > {BLOOM_PRUNE_THRESHOLD}
),
bh AS (SELECT key, {h_big} AS h FROM big),
bpos AS (
{build_pos}
),
words AS (
    SELECT pos // 32 AS word,
           bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INT)) AS mask
    FROM bpos GROUP BY 1
),
ph AS (SELECT c_custkey AS key, {SQL_CHAR_HASH.format(s='CAST(c_custkey AS VARCHAR)')} AS h
       FROM customer),
ppos AS (
{probe_pos}
),
hits AS (
    SELECT p.key,
           CASE WHEN w.mask IS NOT NULL
                 AND (w.mask & (CAST(1 AS BIGINT) << CAST(p.pos % 32 AS INT)))
                     = (CAST(1 AS BIGINT) << CAST(p.pos % 32 AS INT))
                THEN 1 ELSE 0 END AS hit
    FROM ppos p LEFT JOIN words w ON w.word = p.pos // 32
),
mem AS (SELECT key, min(hit) AS bloom_member FROM hits GROUP BY key),
flag AS (
    SELECT m.bloom_member,
           CASE WHEN b.key IS NOT NULL THEN 1 ELSE 0 END AS actual
    FROM mem m LEFT JOIN big b ON b.key = m.key
)
SELECT CAST(count(*) AS BIGINT) AS n_probed,
       CAST(sum(actual) AS BIGINT) AS n_members,
       CAST(sum(bloom_member) AS BIGINT) AS n_bloom_positive,
       CAST(sum(bloom_member * (1 - actual)) AS BIGINT) AS n_false_positive,
       CAST(sum(actual * (1 - bloom_member)) AS BIGINT) AS n_false_negative,
       round(CAST(sum(bloom_member * (1 - actual)) AS BIGINT)
             / (CAST(count(*) AS BIGINT) - CAST(sum(actual) AS BIGINT)), 6)
           AS fp_rate
FROM flag
"""


def props_variant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured analytics via Spark 4's VARIANT type: ``props``
    is parsed ONCE into the binary variant encoding
    (``try_parse_json`` — malformed rows become NULL instead of
    failing the task) and fields are extracted with typed
    ``variant_get`` paths.

    Why this beats per-field ``get_json_object`` at 100 TB: each
    ``get_json_object`` call re-parses the JSON string per field, while
    VARIANT parses once into a navigable binary form (and columnar
    writers can shred frequent paths into real columns with min/max
    stats).  Per-type distinct/min/max of ``props.k`` here; the
    string-path twin ``props_k_stats`` keeps the §2.10 reference shape.
    """
    events = load_table(spark, sf_dir, "events")
    k = F.variant_get(F.try_parse_json("props"), "$.k", "long")
    return events.groupBy("event_type").agg(
        F.count(k).alias("n_with_k"),
        F.countDistinct(k).alias("n_distinct_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


PROPS_VARIANT_STATS_ORACLE = """
SELECT event_type,
       count(k) AS n_with_k,
       count(DISTINCT k) AS n_distinct_k,
       min(k) AS min_k,
       max(k) AS max_k
FROM (SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events)
GROUP BY event_type
"""


def revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (§2.6 extension — the reference has no
    grouping sets): order revenue at (year, month), (year), and grand
    total levels in ONE pass; subtotal rows carry NULL group keys and a
    grouping_id discriminator.  Catalyst expands the grouping sets before
    the shuffle, so it stays a single aggregation job."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup(
            F.year("o_orderdate").alias("o_year"),
            F.month("o_orderdate").alias("o_month"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            exact_sum("o_totalprice").alias("revenue"),
            F.grouping_id().alias("level"),
        )
    )


REVENUE_ROLLUP_ORACLE = """
SELECT year(o_orderdate) AS o_year,
       month(o_orderdate) AS o_month,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       grouping(year(o_orderdate)) * 2 + grouping(month(o_orderdate)) AS level
FROM orders
GROUP BY ROLLUP (year(o_orderdate), month(o_orderdate))
"""


BIG_ORDER_THRESHOLD = 400_000


def customers_with_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-SEMI join (§2.5 note: join kinds beyond inner come free from
    ``df.join(how=...)``): customers having at least one order above the
    threshold.  Semi joins ship only the join key of the right side —
    at scale the filtered orders' keys are a fraction of the fact table."""
    customer = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > BIG_ORDER_THRESHOLD
    )
    return customer.join(
        big, customer.c_custkey == big.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_acctbal")


CUSTOMERS_WITH_BIG_ORDERS_ORACLE = f"""
SELECT c_custkey, c_name, c_acctbal
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_totalprice > {BIG_ORDER_THRESHOLD})
"""


def customers_no_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-ANTI join: the complement set (no order above threshold)."""
    customer = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > BIG_ORDER_THRESHOLD
    )
    return customer.join(
        big, customer.c_custkey == big.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_acctbal")


CUSTOMERS_NO_BIG_ORDERS_ORACLE = f"""
SELECT c_custkey, c_name, c_acctbal
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > {BIG_ORDER_THRESHOLD})
"""


LOCF_NULL_MOD = 11


def user_value_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill (last-observation-carried-forward): per-user sparse
    metric values filled from the most recent non-null observation — the
    time-series gap-filling operator (sparsity simulated deterministically
    by nulling every 11th event so both engines see identical gaps).

    Scale: ``last(ignorenulls=True)`` over a running frame is one window
    pass — same single (user_id) exchange+sort as any per-user window;
    no self-join, no per-gap scans.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    sparse = F.when(
        F.col("event_id") % LOCF_NULL_MOD == 0, F.lit(None)
    ).otherwise(F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.withColumn("v_sparse", sparse).select(
        "event_id",
        "user_id",
        "v_sparse",
        F.last("v_sparse", ignorenulls=True).over(w).alias("v_filled"),
    )


USER_VALUE_LOCF_ORACLE = f"""
WITH sparse AS (
    SELECT event_id, user_id, ts,
           CASE WHEN event_id % {LOCF_NULL_MOD} = 0 THEN NULL ELSE value END
               AS v_sparse
    FROM events
)
SELECT event_id, user_id, v_sparse,
       last_value(v_sparse IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS v_filled
FROM sparse
"""


def hourly_trend_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar densification: per-type hourly counts over a COMPLETE
    hour spine (``sequence`` of hours × distinct types, zero-filled) —
    the reporting operator that makes "no events that hour" visible as 0
    instead of a missing row.

    Scale: the spine is |hours|×|types| rows generated from a one-row
    bounds aggregate — broadcast-sized next to the fact; the only fact
    shuffle is the (hour, type) count.  The left join keeps spine rows,
    so downstream window/anomaly math sees a gap-free series.
    """
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("hour", F.col("ts")).alias("h"), "event_type"
    )
    bounds = ev.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    hours = bounds.select(
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("hour")
    )
    types = ev.select("event_type").distinct()
    counts = ev.groupBy("h", "event_type").agg(F.count(F.lit(1)).alias("c"))
    grid = hours.crossJoin(F.broadcast(types.select(F.col("event_type").alias("t"))))
    return grid.join(
        counts,
        (grid.hour == counts.h) & (grid.t == counts.event_type),
        "left",
    ).select(
        "hour",
        F.col("t").alias("event_type"),
        F.coalesce(F.col("c"), F.lit(0)).cast("long").alias("n_events"),
    )


HOURLY_TREND_DENSE_ORACLE = """
WITH b AS (
    SELECT min(date_trunc('hour', ts)) AS h0, max(date_trunc('hour', ts)) AS h1
    FROM events
),
hours AS (SELECT UNNEST(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour FROM b),
types AS (SELECT DISTINCT event_type AS t FROM events),
counts AS (
    SELECT date_trunc('hour', ts) AS h, event_type, count(*) AS c
    FROM events GROUP BY 1, 2
)
SELECT hour, t AS event_type, CAST(coalesce(c, 0) AS BIGINT) AS n_events
FROM hours
CROSS JOIN types
LEFT JOIN counts ON h = hour AND counts.event_type = t
"""


QUERIES = {
    "user_value_locf": QuerySpec(
        user_value_locf, USER_VALUE_LOCF_ORACLE, "forward-fill sparse metric (LOCF)"
    ),
    "hourly_trend_dense": QuerySpec(
        hourly_trend_dense,
        HOURLY_TREND_DENSE_ORACLE,
        "zero-filled hourly spine per type (calendar densification)",
    ),
    "props_k_stats": QuerySpec(
        props_k_stats, PROPS_K_STATS_ORACLE, "JSON field extraction + agg"
    ),
    "bloom_customer_prune": QuerySpec(
        bloom_customer_prune,
        _bloom_prune_oracle(),
        "Bloom-filter semi-join prune: integer-exact confusion summary",
    ),
    "props_variant_stats": QuerySpec(
        props_variant_stats,
        PROPS_VARIANT_STATS_ORACLE,
        "VARIANT semi-structured path: parse once, typed variant_get",
    ),
    "revenue_rollup": QuerySpec(
        revenue_rollup, REVENUE_ROLLUP_ORACLE, "ROLLUP grouping-sets totals"
    ),
    "customers_with_big_orders": QuerySpec(
        customers_with_big_orders, CUSTOMERS_WITH_BIG_ORDERS_ORACLE, "left-semi join"
    ),
    "customers_no_big_orders": QuerySpec(
        customers_no_big_orders, CUSTOMERS_NO_BIG_ORDERS_ORACLE, "left-anti join"
    ),
    "user_event_gaps": QuerySpec(
        user_event_gaps, USER_EVENT_GAPS_ORACLE, "lag window: inter-event gaps"
    ),
    "purchase_click_attribution": QuerySpec(
        purchase_click_attribution,
        PURCHASE_CLICK_ATTRIBUTION_ORACLE,
        "as-of join (union+window)",
    ),
    "q1_pricing_summary": QuerySpec(q1_pricing_summary, Q1_ORACLE, "A1/A2 grouped multi-agg"),
    "monthly_sales_gold": QuerySpec(monthly_sales_gold, MONTHLY_SALES_ORACLE, "SE gold monthly rollup"),
    "region_revenue": QuerySpec(region_revenue, REGION_REVENUE_ORACLE, "J1/J2 multi-join rollup"),
    "top_orders": QuerySpec(top_orders, TOP_ORDERS_ORACLE, "O2 global top-k"),
    "top_events_per_user": QuerySpec(top_events_per_user, TOP_EVENTS_PER_USER_ORACLE, "W1 rank top-k per group"),
    "latest_event_per_user_type": QuerySpec(latest_event_per_user_type, LATEST_EVENT_ORACLE, "D4 deterministic dedup"),
    "daily_event_trend": QuerySpec(daily_event_trend, DAILY_TREND_ORACLE, "A7 daily trend"),
    "hourly_peak_pattern": QuerySpec(hourly_peak_pattern, HOURLY_PEAK_ORACLE, "A7 hour-of-day peaks"),
    "freshness_window": QuerySpec(freshness_window, FRESHNESS_ORACLE, "F5 freshness threshold"),
    "union_splice": QuerySpec(union_splice, UNION_SPLICE_ORACLE, "§2.9 unionByName"),
    "customer_order_stats": QuerySpec(customer_order_stats, CUSTOMER_ORDER_STATS_ORACLE, "J1+A1 enrich+agg"),
    "rolling_daily_revenue": QuerySpec(rolling_daily_revenue, ROLLING_DAILY_REVENUE_ORACLE, "rolling window ext"),
    "user_trailing_10min": QuerySpec(user_trailing_10min, USER_TRAILING_10MIN_ORACLE, "RANGE window frame (value-based)"),
    "part_type_share": QuerySpec(part_type_share, PART_TYPE_SHARE_ORACLE, "A4 conditional ratio report"),
}
