"""Skew-mitigation query pack: salted plans whose results are
bit-identical to the straightforward (skew-vulnerable) formulation — the
DuckDB oracle IS the unsalted query, which proves semantics preservation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipelines_using_llm_spark.operators import skew
from data_pipelines_using_llm_spark.registry import QuerySpec
from data_pipelines_using_llm_spark.sources.tables import load_table


def salted_event_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type event stats via two-stage salted aggregation: event_type
    has ~5 values, so at 100 TB every row funnels into 5 reducers without
    the salt stage.  Decimal partials keep the result exact."""
    events = load_table(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(18,2)")
    return skew.salted_agg(
        events,
        key="event_type",
        salt_from="event_id",
        partial_aggs=[
            F.count(F.lit(1)).alias("_n"),
            F.sum(dec).alias("_s"),
            F.min("value").alias("_mn"),
            F.max("value").alias("_mx"),
        ],
        final_aggs=[
            F.sum("_n").alias("n_events"),
            F.sum("_s").cast("double").alias("sum_value"),
            F.min("_mn").alias("min_value"),
            F.max("_mx").alias("max_value"),
        ],
    )


SALTED_EVENT_TYPE_STATS_ORACLE = """
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
       min(value) AS min_value,
       max(value) AS max_value
FROM events
GROUP BY event_type
"""


def salted_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-dimension join via salted replication (the no-broadcast
    skew path), then nation-level revenue rollup."""
    orders = load_table(spark, sf_dir, "orders").withColumnRenamed(
        "o_custkey", "custkey"
    )
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_nationkey"
    )
    joined = skew.salted_join(
        orders, customer, key="custkey", salt_from="o_orderkey", n_salts=8
    )
    return joined.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
    )


SALTED_NATION_REVENUE_ORACLE = """
SELECT c.c_nationkey,
       count(*) AS n_orders,
       CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
GROUP BY c.c_nationkey
"""


SKEW_TOP_KEYS = 3


def events_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew diagnostics — the report an operator runs BEFORE
    choosing between plain hash partitioning, salting, and AQE skew
    splitting: for each candidate shuffle key of ``events`` (user_id,
    event_type), the key cardinality, the heaviest key's share of all
    rows, the max/avg imbalance factor, and the top heavy-hitter keys.

    One grouped count per key column (map-side partial), then per-column
    aggregates over the (small) per-key count table plus an
    ``orderBy().limit()`` heavy-hitter top-k — which compiles to
    TakeOrderedAndProject (per-partition bounded heaps merged on one
    node, never a global sort), so even a billion-key per-key table
    yields the top-3 without a single-task sort.  Nothing here touches
    the fact table twice per key column, and nothing is quadratic.  The
    imbalance factor ``max_cnt / avg_cnt`` is exactly the multiplier by
    which the hottest reducer exceeds the mean at any partition count
    where keys don't share reducers — the number that decides whether
    `operators/skew.py`'s salted plans are worth their second stage.
    """
    events = load_table(spark, sf_dir, "events")
    from pyspark.sql.window import Window

    outs = []
    for keycol in ("user_id", "event_type"):
        per_key = (
            events.filter(F.col(keycol).isNotNull())
            .groupBy(F.col(keycol).cast("string").alias("key"))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        top = (
            per_key.orderBy(F.col("cnt").desc(), F.col("key"))
            .limit(SKEW_TOP_KEYS)
            .agg(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct(
                                    (-F.col("cnt")).alias("nc"), F.col("key")
                                )
                            )
                        ),
                        lambda s: s["key"],
                    ),
                    ",",
                ).alias("top_keys")
            )
        )
        stats = per_key.agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("cnt").alias("n_rows"),
            F.max("cnt").alias("max_cnt"),
        )
        outs.append(
            stats.crossJoin(F.broadcast(top)).select(
                F.lit(keycol).alias("key_column"),
                "n_keys",
                "n_rows",
                "max_cnt",
                F.round(
                    F.col("max_cnt") / (F.col("n_rows") / F.col("n_keys")), 6
                ).alias("imbalance"),
                F.round(F.col("max_cnt") / F.col("n_rows"), 6).alias(
                    "max_share"
                ),
                "top_keys",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def _skew_profile_oracle() -> str:
    parts = []
    for keycol in ("user_id", "event_type"):
        parts.append(
            f"""
SELECT '{keycol}' AS key_column, n_keys, n_rows, max_cnt,
       round(max_cnt / (n_rows / n_keys), 6) AS imbalance,
       round(max_cnt / n_rows, 6) AS max_share,
       top_keys
FROM (
    SELECT CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(cnt) AS BIGINT) AS n_rows,
           CAST(max(cnt) AS BIGINT) AS max_cnt
    FROM (SELECT CAST({keycol} AS VARCHAR) AS key, count(*) AS cnt
          FROM events WHERE {keycol} IS NOT NULL GROUP BY 1)
) CROSS JOIN (
    SELECT string_agg(key, ',' ORDER BY cnt DESC, key) AS top_keys
    FROM (SELECT key, cnt
          FROM (SELECT CAST({keycol} AS VARCHAR) AS key, count(*) AS cnt
                FROM events WHERE {keycol} IS NOT NULL GROUP BY 1)
          ORDER BY cnt DESC, key LIMIT {SKEW_TOP_KEYS})
)"""
        )
    return "\nUNION ALL\n".join(parts)


QUERIES = {
    "salted_event_type_stats": QuerySpec(
        salted_event_type_stats, SALTED_EVENT_TYPE_STATS_ORACLE, "salted two-stage agg"
    ),
    "salted_nation_revenue": QuerySpec(
        salted_nation_revenue, SALTED_NATION_REVENUE_ORACLE, "salted replicated join"
    ),
    "events_skew_profile": QuerySpec(
        events_skew_profile,
        _skew_profile_oracle(),
        "shuffle-key skew diagnostics (cardinality, imbalance, heavy hitters)",
    ),
}
