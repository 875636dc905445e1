"""Association / dependence pack: market-basket part-affinity lift and
event-type x hour mutual information.

The reference's reporting layer is univariate (per-day counts, per-type
means — ``Second Experiment/GPT 5.py:141-152``); this pack adds the two
standard bivariate reports an analytics platform ships next: which items
co-occur beyond chance (lift), and how strongly two categorical columns
depend on each other (pointwise mutual information).

Cross-engine exactness: all counts are integers; every lift/PMI double
is one expression over exact integer inputs, rounded at 6 with the
formula textually mirrored in the oracle (division/ln of identical
exact integers yields identical doubles; ln discrepancies across libm
implementations are <= 1 ulp, absorbed by round-6 — same precedent as
the z-score queries in plans/behavior.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipelines_using_llm_spark.registry import QuerySpec
from data_pipelines_using_llm_spark.sources.tables import load_table

AFFINITY_TOP = 50


def part_affinity_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 co-purchased part pairs by basket count, with lift.

    basket = order; pair candidates come from a SELF-EQUI-JOIN on
    ``l_orderkey`` with ``part_a < part_b`` — the candidate count is
    sum over baskets of C(|basket|, 2), bounded by the max basket size
    (7 lineitems in TPC-H-shaped data), never |parts|^2.  Item
    marginals and the basket total join back on part keys / one-row
    broadcast.  lift = P(a,b) / (P(a) * P(b)) expressed over raw
    counts as (pair_cnt * n_baskets) / (cnt_a * cnt_b).

    At 100 TB: the pair groupBy is the only corpus-scale shuffle; the
    final top-50 is a TakeOrdered (per-partition top-k + driver merge),
    not a global sort.
    """
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    pairs = (
        li.alias("a")
        .join(
            li.alias("b"),
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("pair_cnt"))
    )
    item = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("item_cnt"))
    total = li.select("l_orderkey").distinct().agg(
        F.count(F.lit(1)).alias("n_baskets")
    )
    scored = (
        pairs.join(item.withColumnRenamed("l_partkey", "part_a"), "part_a")
        .withColumnRenamed("item_cnt", "cnt_a")
        .join(item.withColumnRenamed("l_partkey", "part_b"), "part_b")
        .withColumnRenamed("item_cnt", "cnt_b")
        .join(F.broadcast(total))
        .select(
            "part_a",
            "part_b",
            "pair_cnt",
            # Double multiply, same rationale as event_type_mutual_info:
            # BIGINT*BIGINT wraps silently in non-ANSI Spark at extreme
            # counts while DuckDB raises; doubles are cross-engine exact.
            F.round(
                (F.col("pair_cnt").cast("double") * F.col("n_baskets").cast("double"))
                / (F.col("cnt_a").cast("double") * F.col("cnt_b").cast("double")),
                6,
            ).alias("lift"),
        )
    )
    return scored.orderBy(
        F.col("pair_cnt").desc(), "part_a", "part_b"
    ).limit(AFFINITY_TOP)


PART_AFFINITY_LIFT_ORACLE = f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           count(*) AS pair_cnt
    FROM li a JOIN li b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
),
item AS (SELECT l_partkey, count(*) AS item_cnt FROM li GROUP BY 1),
tot AS (SELECT count(DISTINCT l_orderkey) AS n_baskets FROM li)
SELECT part_a, part_b, pair_cnt,
       round((CAST(pair_cnt AS DOUBLE) * CAST(n_baskets AS DOUBLE))
             / (CAST(ia.item_cnt AS DOUBLE) * CAST(ib.item_cnt AS DOUBLE)), 6)
           AS lift
FROM pairs
JOIN item ia ON ia.l_partkey = part_a
JOIN item ib ON ib.l_partkey = part_b
CROSS JOIN tot
ORDER BY pair_cnt DESC, part_a, part_b
LIMIT {AFFINITY_TOP}
"""


def event_type_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell pointwise mutual information between ``event_type`` and
    hour-of-day over ``events``.

    PMI(x, y) = ln( (n_xy * N) / (n_x * n_y) ); the cell's contribution
    to total MI is (n_xy / N) * PMI.  Emitting the per-cell rows (not a
    single folded total) keeps the hash gate strong AND sidesteps the
    cross-engine summation-order question entirely — every output double
    is one ln/division over exact integers.

    Plan: one corpus aggregation to |types| x 24 cells; both marginals
    re-aggregate from the CELLS (already tiny), not the corpus, and join
    back as broadcasts — the events table is scanned exactly once.
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull() & F.col("ts").isNotNull()
    )
    cells = e.groupBy(
        "event_type", F.hour("ts").alias("hour")
    ).agg(F.count(F.lit(1)).alias("n_xy"))
    margin_x = cells.groupBy("event_type").agg(
        F.sum("n_xy").alias("n_x")
    )
    margin_y = cells.groupBy("hour").agg(F.sum("n_xy").alias("n_y"))
    total = cells.agg(F.sum("n_xy").alias("n_total"))
    # Multiply in DOUBLE on both engines: BIGINT*BIGINT overflows int64
    # once n_xy~1e10 meets n_total~1e12 (100 TB corpus counts), where
    # non-ANSI Spark silently wraps while DuckDB raises — double products
    # are IEEE-identical cross-engine and never wrap.
    pmi = F.log(
        (F.col("n_xy").cast("double") * F.col("n_total").cast("double"))
        / (F.col("n_x").cast("double") * F.col("n_y").cast("double"))
    )
    return (
        cells.join(F.broadcast(margin_x), "event_type")
        .join(F.broadcast(margin_y), "hour")
        .join(F.broadcast(total))
        .select(
            "event_type",
            "hour",
            "n_xy",
            F.round(pmi, 6).alias("pmi"),
            F.round((F.col("n_xy") / F.col("n_total")) * pmi, 6).alias(
                "mi_contrib"
            ),
        )
    )


EVENT_TYPE_MUTUAL_INFO_ORACLE = """
WITH cells AS (
    SELECT event_type, CAST(hour(ts) AS INT) AS hour, count(*) AS n_xy
    FROM events
    WHERE event_type IS NOT NULL AND ts IS NOT NULL
    GROUP BY 1, 2
),
mx AS (SELECT event_type, CAST(sum(n_xy) AS BIGINT) AS n_x
       FROM cells GROUP BY 1),
my AS (SELECT hour, CAST(sum(n_xy) AS BIGINT) AS n_y FROM cells GROUP BY 1),
tot AS (SELECT CAST(sum(n_xy) AS BIGINT) AS n_total FROM cells)
SELECT c.event_type, c.hour, c.n_xy,
       round(ln((CAST(c.n_xy AS DOUBLE) * CAST(n_total AS DOUBLE))
                / (CAST(n_x AS DOUBLE) * CAST(n_y AS DOUBLE))), 6) AS pmi,
       round((CAST(c.n_xy AS DOUBLE) / n_total)
             * ln((CAST(c.n_xy AS DOUBLE) * CAST(n_total AS DOUBLE))
                  / (CAST(n_x AS DOUBLE) * CAST(n_y AS DOUBLE))), 6)
           AS mi_contrib
FROM cells c
JOIN mx ON mx.event_type = c.event_type
JOIN my ON my.hour = c.hour
CROSS JOIN tot
"""


QUERIES = {
    "part_affinity_lift": QuerySpec(
        part_affinity_lift,
        PART_AFFINITY_LIFT_ORACLE,
        "market-basket co-purchase lift top-k",
    ),
    "event_type_mutual_info": QuerySpec(
        event_type_mutual_info,
        EVENT_TYPE_MUTUAL_INFO_ORACLE,
        "event_type x hour PMI / MI contributions",
    ),
}
