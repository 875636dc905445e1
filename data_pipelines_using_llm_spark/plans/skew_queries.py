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


QUERIES = {
    "salted_event_type_stats": QuerySpec(
        salted_event_type_stats, SALTED_EVENT_TYPE_STATS_ORACLE, "salted two-stage agg"
    ),
    "salted_nation_revenue": QuerySpec(
        salted_nation_revenue, SALTED_NATION_REVENUE_ORACLE, "salted replicated join"
    ),
}
