"""Decision-support query pack #3: the remaining TPC-H plan shapes.

The reference's SQL-report archetype (A4, ``First experiment/Claude
Sonnet 4.py:861-867``) and join archetype (J1/J2, ``Third Experiment/
Claude Opus 4.py:154-179``) are already covered by packs #1/#2; this
pack adds the warehouse shapes those packs still lacked:

- scan-only aggregation with every predicate pushed to parquet (Q6),
- relative-to-global HAVING via a same-aggregate scalar broadcast (Q11),
- fact-fact join with conditional two-way counts (Q12),
- conditional-share over a broadcast dim attribute (Q14),
- COUNT(DISTINCT) grouped report behind an anti-joined exclusion (Q16),
- dim-filtered semi chain with a grouped threshold HAVING (Q20),
- per-group argmax-uniqueness via a two-level aggregation (Q21).

TPC-H columns absent from the driver's schema (``partsupp``,
``l_commitdate``/``l_receiptdate``, ``l_shipmode``) are adapted: the
supply relation is derived from ``lineitem`` itself, and lateness is
``l_shipdate`` relative to ``o_orderdate``.  Shapes and plan disciplines
are the point, not benchmark-literal text.

Cross-engine exactness follows functions/exact.py: money aggregates in
DECIMAL, threshold comparisons multiplied out so both engines compare
fixed-point integers, doubles only at the output boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipelines_using_llm_spark.functions.exact import dec
from data_pipelines_using_llm_spark.operators.caching import barrier
from data_pipelines_using_llm_spark.registry import QuerySpec
from data_pipelines_using_llm_spark.sources.tables import load_table

Q6_START, Q6_END = "1996-01-01", "1997-01-01"
Q12_LATE_DAYS, Q12_VERY_LATE_DAYS = 90, 180
Q14_START, Q14_END = "1996-03-01", "1996-04-01"
Q20_START, Q20_END = "1996-01-01", "1997-01-01"
Q20_MIN_QTY, Q20_MIN_PARTS = 100, 3


def _disc_price():
    return dec("l_extendedprice", "decimal(12,2)") * (
        F.lit(1).cast("decimal(3,2)") - dec("l_discount", "decimal(3,2)")
    )


def forecast_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: revenue increase if low-discount small-quantity
    items had their discount dropped — a single-table aggregate where
    EVERY predicate is a pushable range.

    Scale: the whole query is one parquet scan with three PushedFilters
    (shipdate range, discount band, quantity cap) and a 4-column
    ReadSchema, followed by a map-side partial sum — zero shuffled rows
    beyond one partial-aggregate row per task.  This is the floor case:
    if this plan shuffles data, the scan configuration is broken.

    Discount band compares raw doubles; both engines read the same
    parquet bits and parse the same literals, so the comparison is
    bit-identical (no epsilon needed).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit(Q6_START))
            & (F.col("l_shipdate") < F.lit(Q6_END))
            & (F.col("l_discount") >= F.lit(0.04))
            & (F.col("l_discount") <= F.lit(0.06))
            & (F.col("l_quantity") < F.lit(24))
        )
        .agg(
            F.sum(
                dec("l_extendedprice", "decimal(12,2)")
                * dec("l_discount", "decimal(3,2)")
            )
            .cast("double")
            .alias("potential_revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


FORECAST_REVENUE_DELTA_ORACLE = f"""
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                * CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) AS potential_revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{Q6_START}' AND l_shipdate < TIMESTAMP '{Q6_END}'
  AND l_discount >= 0.04 AND l_discount <= 0.06
  AND l_quantity < 24
"""


def important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose lifetime revenue exceeds 1.25x the
    average part revenue — grouped aggregate HAVING against a scalar
    derived from the SAME aggregate.

    The supply relation is ``lineitem`` (no partsupp in this schema);
    "1.25x average" is stated scale-invariantly AND verified non-vacuous
    at every generated SF (21 / 242 / 2348 qualifying parts at sf0.001 /
    0.01 / 0.1 — the r5 2x threshold returned 0 rows at the driver's
    sf0.01, so the hash gate compared empty sets and verified nothing).
    The predicate is multiplied out with integer factors
    (``4 * rev * n_parts > 5 * total``) so both engines compare exact
    decimals, never a double quotient.

    Scale: one fact shuffle keyed by partkey; the global (total,
    n_parts) is a ONE-ROW broadcast computed from the same persisted
    aggregate (barrier prevents a second fact scan); part names arrive
    by broadcast.  The anti-pattern this avoids is a window over the
    full aggregate (single-partition sort) or a fact re-scan for the
    global sum.
    """
    li = load_table(spark, sf_dir, "lineitem")
    rev = barrier(
        li.groupBy("l_partkey").agg(F.sum(_disc_price()).alias("rev_dec"))
    )
    tot = rev.agg(
        F.sum("rev_dec").alias("total_dec"), F.count(F.lit(1)).alias("n_parts")
    )
    part = load_table(spark, sf_dir, "part")
    return (
        rev.crossJoin(F.broadcast(tot))
        .filter(
            F.lit(4) * F.col("rev_dec") * F.col("n_parts")
            > F.lit(5) * F.col("total_dec")
        )
        .join(F.broadcast(part), rev.l_partkey == part.p_partkey)
        .select(
            "p_partkey",
            "p_name",
            F.col("rev_dec").cast("double").alias("part_value"),
        )
    )


IMPORTANT_PARTS_ORACLE = """
WITH rev AS (
    SELECT l_partkey,
           sum(CAST(l_extendedprice AS DECIMAL(12,2))
               * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS rev_dec
    FROM lineitem
    GROUP BY 1
),
tot AS (SELECT sum(rev_dec) AS total_dec, count(*) AS n_parts FROM rev)
SELECT p.p_partkey, p.p_name, CAST(r.rev_dec AS DOUBLE) AS part_value
FROM rev r, tot t
JOIN part p ON r.l_partkey = p.p_partkey
WHERE 4 * r.rev_dec * t.n_parts > 5 * t.total_dec
"""


def late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: late shipments bucketed by how late, with
    conditional counts of critical vs ordinary order priorities — the
    fact-fact join + CASE-pivot aggregation pattern.

    Lateness is ``l_shipdate`` vs ``o_orderdate`` (no commitdate in this
    schema); buckets are (90, 180] and >180 days.

    Scale: both sides project to 2-3 columns before the orderkey
    exchange (ReadSchema is the guard), the lateness predicate is
    evaluated pre-aggregation so only late rows reach the tiny
    2-row aggregate, and the conditional counts are map-side partials.
    The 90-day filter cannot push below the join (it spans both
    tables) — the scan prune is column-level, not row-level, which is
    exactly what the shape dictates.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    critical = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(delay > Q12_LATE_DAYS)
        .withColumn(
            "delay_bucket",
            F.when(delay <= Q12_VERY_LATE_DAYS, F.lit("late_91_180")).otherwise(
                F.lit("late_gt_180")
            ),
        )
        .groupBy("delay_bucket")
        .agg(
            F.sum(F.when(critical, 1).otherwise(0)).alias("critical_count"),
            F.sum(F.when(critical, 0).otherwise(1)).alias("ordinary_count"),
        )
    )


LATE_SHIPMENT_PRIORITY_ORACLE = f"""
SELECT CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) <= {Q12_VERY_LATE_DAYS}
            THEN 'late_91_180' ELSE 'late_gt_180' END AS delay_bucket,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS critical_count,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS ordinary_count
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE date_diff('day', o.o_orderdate, l.l_shipdate) > {Q12_LATE_DAYS}
GROUP BY 1
"""


def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promotional revenue as a percentage of one
    month's revenue — conditional aggregation over a broadcast dim
    attribute, two exact sums and one double division at the boundary.

    Scale: the month predicate prunes the fact scan; ``part`` joins by
    broadcast (``p_type`` is the only dim column read); both sums are
    partial aggregates of the SAME join pass — one scan, one broadcast,
    zero fact shuffles.  The share divides two exact decimals cast to
    double, so both engines emit the same bits.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q14_START))
        & (F.col("l_shipdate") < F.lit(Q14_END))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    promo = F.when(F.col("p_type") == "PROMO", _disc_price()).otherwise(
        F.lit(0).cast("decimal(3,2)")
    )
    return joined.agg(
        F.sum(promo).cast("double").alias("promo_revenue"),
        F.sum(_disc_price()).cast("double").alias("total_revenue"),
        (
            F.lit(100.0)
            * F.sum(promo).cast("double")
            / F.sum(_disc_price()).cast("double")
        ).alias("promo_share_pct"),
    )


PROMO_REVENUE_SHARE_ORACLE = f"""
WITH j AS (
    SELECT CAST(l_extendedprice AS DECIMAL(12,2))
           * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))) AS dp,
           p.p_type
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l_shipdate >= TIMESTAMP '{Q14_START}' AND l_shipdate < TIMESTAMP '{Q14_END}'
)
SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN dp ELSE CAST(0 AS DECIMAL(3,2)) END)
            AS DOUBLE) AS promo_revenue,
       CAST(sum(dp) AS DOUBLE) AS total_revenue,
       100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN dp
                             ELSE CAST(0 AS DECIMAL(3,2)) END) AS DOUBLE)
             / CAST(sum(dp) AS DOUBLE) AS promo_share_pct
FROM j
"""


def supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers ship each
    (brand, type, size) part class, excluding a brand, a type, and a
    blacklisted supplier set — grouped COUNT(DISTINCT) behind an
    anti-join.

    The supply relation is ``lineitem``; the exclusion set (Q16's
    "complaints" suppliers) is suppliers with negative account balance.

    Scale: the blacklist is a broadcast LEFT-ANTI join (the excluded set
    is a filtered dim, never shuffled); the part attributes arrive by
    broadcast; the distinct runs as Spark's two-phase expand/partial
    aggregate keyed by (brand, type, size, suppkey) — the fact shuffles
    once with duplicate (class, supplier) pairs already collapsed
    map-side.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5") & (F.col("p_type") != "PROMO")
    )
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select(F.col("s_suppkey").alias("bad_suppkey"))
    return (
        li.join(F.broadcast(bad), li.l_suppkey == F.col("bad_suppkey"), "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


SUPPLIER_DIVERSITY_ORACLE = """
SELECT p.p_brand, p.p_type, p.p_size,
       count(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#5' AND p.p_type <> 'PROMO'
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
"""


def red_part_supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who moved significant volume of one
    part family ("red ..." parts) in one year — dim-filtered semi chain
    ending in a grouped threshold HAVING, reported with nation names.

    Scale: the part-family filter is a broadcast semi (only matching
    partkeys reach the probe), the year predicate prunes the fact scan,
    and the per-supplier rollup shuffles one bounded row per (supplier)
    key.  Quantity sums are DECIMAL (quantities are integral doubles) so
    the threshold compare is exact; supplier/nation names arrive via
    broadcast at the very end, after the HAVING has shrunk the row set.
    """
    red = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("red %")
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q20_START))
        & (F.col("l_shipdate") < F.lit(Q20_END))
    )
    per_supp = (
        li.join(F.broadcast(red), li.l_partkey == red.p_partkey, "left_semi")
        .groupBy("l_suppkey")
        .agg(
            F.sum(dec("l_quantity", "decimal(12,2)")).alias("qty_dec"),
            F.count_distinct("l_partkey").alias("n_red_parts"),
        )
        .filter(
            (F.col("qty_dec") > Q20_MIN_QTY) & (F.col("n_red_parts") >= Q20_MIN_PARTS)
        )
    )
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        per_supp.join(
            F.broadcast(supplier), per_supp.l_suppkey == supplier.s_suppkey
        )
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .select(
            "s_suppkey",
            "s_name",
            "n_name",
            F.col("qty_dec").cast("double").alias("red_qty"),
            "n_red_parts",
        )
    )


RED_PART_SUPPLY_ORACLE = f"""
WITH per_supp AS (
    SELECT l_suppkey,
           sum(CAST(l_quantity AS DECIMAL(12,2))) AS qty_dec,
           count(DISTINCT l_partkey) AS n_red_parts
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '{Q20_START}' AND l_shipdate < TIMESTAMP '{Q20_END}'
      AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red %')
    GROUP BY 1
    HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > {Q20_MIN_QTY}
       AND count(DISTINCT l_partkey) >= {Q20_MIN_PARTS}
)
SELECT s.s_suppkey, s.s_name, n.n_name,
       CAST(ps.qty_dec AS DOUBLE) AS red_qty, ps.n_red_parts
FROM per_supp ps
JOIN supplier s ON ps.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
"""


def sole_late_shipper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: for failed multi-supplier orders, the supplier
    who was the UNIQUE last shipper (everyone else had finished) —
    per-group argmax-uniqueness, the exists/not-exists pair decorrelated
    into a two-level aggregation.

    Level 1 groups the fact to (order, supplier) grain with each
    supplier's last ship date; level 2 derives per-order supplier count,
    order-wide last date, and HOW MANY suppliers hit it.  An order
    counts against a supplier iff ≥2 suppliers participated and exactly
    one (this one) shipped last.  Timestamps compare exactly, so the
    uniqueness test is deterministic across engines.

    Scale: shuffle 1 collapses the fact to (order, supplier) rows
    map-side; the level-2 stats run as a WINDOW over orderkey —
    per-order partitions are bounded by suppliers-per-order (single
    digits), so no skew wall; shuffle 3 is the per-supplier count of
    qualifying orders (≤1 row per order enters it).  The order-status
    filter applies at order grain via a projected semi join, never
    joining the full fact to orders.
    """
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    failed = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    # NOT broadcast: 'F' orders are ~1/3 of an order-grain fact — the semi
    # join must shuffle on orderkey (the same key the level-1 aggregate
    # needs), never ship the order set to every executor.
    sup_last = (
        li.join(failed, li.l_orderkey == failed.o_orderkey, "left_semi")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("l_shipdate").alias("s_last"))
    )
    w = Window.partitionBy("l_orderkey")
    flagged = sup_last.select(
        "l_orderkey",
        "l_suppkey",
        "s_last",
        F.count(F.lit(1)).over(w).alias("n_supp"),
        F.max("s_last").over(w).alias("o_last"),
    ).withColumn(
        "n_at_max",
        F.sum(F.when(F.col("s_last") == F.col("o_last"), 1).otherwise(0)).over(w),
    )
    winners = flagged.filter(
        (F.col("n_supp") >= 2)
        & (F.col("n_at_max") == 1)
        & (F.col("s_last") == F.col("o_last"))
    )
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        winners.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == supplier.s_suppkey)
        .select("s_suppkey", "s_name", "numwait")
    )


SOLE_LATE_SHIPPER_ORACLE = """
WITH sup_last AS (
    SELECT l.l_orderkey, l.l_suppkey, max(l.l_shipdate) AS s_last
    FROM lineitem l
    WHERE l.l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
    GROUP BY 1, 2
),
ord_stats AS (
    SELECT l_orderkey, count(*) AS n_supp, max(s_last) AS o_last,
           sum(CASE WHEN s_last = max_last THEN 1 ELSE 0 END) AS n_at_max
    FROM (SELECT *, max(s_last) OVER (PARTITION BY l_orderkey) AS max_last
          FROM sup_last)
    GROUP BY 1
),
winners AS (
    SELECT sl.l_suppkey
    FROM sup_last sl
    JOIN ord_stats os ON sl.l_orderkey = os.l_orderkey
    WHERE os.n_supp >= 2 AND os.n_at_max = 1 AND sl.s_last = os.o_last
)
SELECT s.s_suppkey, s.s_name, count(*) AS numwait
FROM winners w
JOIN supplier s ON w.l_suppkey = s.s_suppkey
GROUP BY 1, 2
"""


QUERIES: dict[str, QuerySpec] = {
    "forecast_revenue_delta": QuerySpec(
        forecast_revenue_delta,
        FORECAST_REVENUE_DELTA_ORACLE,
        "Q6: all-pushdown scan aggregate, zero shuffled rows",
    ),
    "important_parts": QuerySpec(
        important_parts,
        IMPORTANT_PARTS_ORACLE,
        "Q11: HAVING vs same-aggregate global scalar, scale-invariant",
    ),
    "late_shipment_priority": QuerySpec(
        late_shipment_priority,
        LATE_SHIPMENT_PRIORITY_ORACLE,
        "Q12: fact-fact join + conditional two-way counts",
    ),
    "promo_revenue_share": QuerySpec(
        promo_revenue_share,
        PROMO_REVENUE_SHARE_ORACLE,
        "Q14: conditional share over broadcast dim attribute",
    ),
    "supplier_diversity": QuerySpec(
        supplier_diversity,
        SUPPLIER_DIVERSITY_ORACLE,
        "Q16: grouped COUNT DISTINCT behind broadcast anti-join",
    ),
    "red_part_supply": QuerySpec(
        red_part_supply,
        RED_PART_SUPPLY_ORACLE,
        "Q20: dim-filtered semi chain + grouped threshold HAVING",
    ),
    "sole_late_shipper": QuerySpec(
        sole_late_shipper,
        SOLE_LATE_SHIPPER_ORACLE,
        "Q21: per-order argmax-uniqueness, two-level aggregation",
    ),
}
