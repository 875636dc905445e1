"""Decision-support query pack #2: the TPC-H-derived join/aggregation
shapes the round-1 packs did not yet cover — fact→fact EXISTS (semi),
outer-join histograms, decorrelated scalar subqueries, HAVING + join-back
top-k, disjunctive multi-clause pushdown, and scalar-aggregate + anti-join.

These extend the reference's join archetype (J1/J2, ``Third Experiment/
Claude Opus 4.py:154-179``) and SQL-report archetype (A4, ``First
experiment/Claude Sonnet 4.py:861-867``) to the correlated-subquery
shapes a warehouse user writes next.  Every correlated subquery is
decorrelated by hand into the aggregate-then-join form — that is also
exactly what Catalyst's ``RewriteCorrelatedScalarSubquery`` would emit,
so the DataFrame plan below IS the optimized plan, stated explicitly.

Scale notes per query; the recurring themes:
- EXISTS → left-semi join: only the probe side's join KEY shuffles, and
  map-side partial distinct collapses duplicate keys before the exchange.
- scalar subquery over a filtered dimension slice → broadcast of a
  bounded aggregate table (one row per part of one brand / one global
  row), never a second fact shuffle.
- threshold comparisons against averages are stated in multiplied-out
  decimal form (``2·qty·cnt < sum``) so both engines compare exact
  fixed-point integers — no double rounding at the boundary
  (SURVEY.md §7.3.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipelines_using_llm_spark.functions.exact import dec
from data_pipelines_using_llm_spark.operators.caching import barrier
from data_pipelines_using_llm_spark.registry import QuerySpec
from data_pipelines_using_llm_spark.sources.tables import load_table

Q4_START, Q4_END = "1996-01-01", "1996-04-01"
Q17_BRAND = "Brand#23"
Q18_QTY_THRESHOLD = 250
Q22_CUTOFF = "1999-07-01"


def _disc_price():
    return dec("l_extendedprice", "decimal(12,2)") * (
        F.lit(1).cast("decimal(3,2)") - dec("l_discount", "decimal(3,2)")
    )


def order_priority_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders in one quarter having at least one returned
    lineitem, counted per priority class — ``EXISTS`` decorrelated to a
    left-SEMI join between two FACT tables (the round-1 semi joins were
    dim←fact; this is the fact←fact variant where neither side
    broadcasts).

    Scale: the semi probe projects ONLY ``l_orderkey`` (ReadSchema is one
    column) and Spark plans a partial-distinct before the exchange, so
    the shuffle carries distinct returned-order keys, not 100 TB of
    lineitems; the orders side is pruned by the pushed-down quarter
    predicate before its exchange.  Output is |priorities| rows.
    """
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit(Q4_START).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(Q4_END).cast("timestamp"))
        )
        .select("o_orderkey", "o_orderpriority")
    )
    returned = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        orders.join(returned, orders.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .select(F.col("o_orderpriority").alias("order_priority"), "order_count")
    )


ORDER_PRIORITY_RETURNS_ORACLE = f"""
SELECT o_orderpriority AS order_priority,
       count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '{Q4_START} 00:00:00'
  AND o_orderdate <  TIMESTAMP '{Q4_END} 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
"""


def customer_order_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of customers by how many orders they
    placed, INCLUDING the zero-order customers an inner join would drop.

    Decorrelation: aggregate orders per custkey FIRST (fact collapses to
    ≤|customer| rows), then LEFT-join customer to the counts and
    ``coalesce(0)``.  Joining raw orders and counting after the outer
    join — the naive Q13 plan — would shuffle every order row through
    the join; aggregating first shuffles each side once at
    customer-cardinality.  The second aggregation (histogram) reduces to
    ~tens of distinct counts, all map-side.
    """
    per_cust = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    return (
        cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left")
        .select(F.coalesce(F.col("cnt"), F.lit(0)).alias("n_orders"))
        .groupBy("n_orders")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


CUSTOMER_ORDER_HISTOGRAM_ORACLE = """
SELECT n_orders, count(*) AS n_customers
FROM (
    SELECT c_custkey, coalesce(cnt, 0) AS n_orders
    FROM customer
    LEFT JOIN (SELECT o_custkey, count(*) AS cnt
               FROM orders GROUP BY o_custkey) oc
      ON c_custkey = o_custkey
) per_cust
GROUP BY n_orders
"""


def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue lost to small-quantity orders of one
    brand — the correlated scalar subquery ``l_quantity < 0.5 *
    avg(l_quantity per part)`` decorrelated into aggregate-then-join.

    Scale: the brand slice of ``part`` broadcasts; the per-part average
    table is one row per part OF THAT BRAND (bounded, broadcasts too),
    so lineitem is scanned once and never shuffled — both joins are
    broadcast-hash.  The average comparison is multiplied out to
    ``2·qty·cnt < sum_qty`` over DECIMALs: quantities are fixed-point,
    so both engines compare exact integers and the boundary rows agree
    bit-for-bit (no double division anywhere).
    """
    brand_parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == Q17_BRAND)
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").join(
        F.broadcast(brand_parts), F.col("l_partkey") == F.col("p_partkey")
    )
    per_part = li.groupBy(F.col("l_partkey").alias("pp_key")).agg(
        F.sum(dec("l_quantity", "decimal(12,2)")).alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"),
    )
    return (
        li.join(F.broadcast(per_part), F.col("l_partkey") == F.col("pp_key"))
        .filter(
            dec("l_quantity", "decimal(12,2)") * 2 * F.col("cnt") < F.col("sum_qty")
        )
        .agg(
            (F.sum(dec("l_extendedprice", "decimal(12,2)")).cast("double") / 7.0).alias(
                "avg_yearly"
            ),
            F.count(F.lit(1)).alias("n_small_lineitems"),
        )
    )


SMALL_QUANTITY_REVENUE_ORACLE = f"""
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
           AS avg_yearly,
       count(*) AS n_small_lineitems
FROM lineitem
JOIN (SELECT p_partkey FROM part WHERE p_brand = '{Q17_BRAND}') bp
  ON l_partkey = bp.p_partkey
JOIN (SELECT l_partkey AS pp_key,
             sum(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty,
             count(*) AS cnt
      FROM lineitem
      JOIN (SELECT p_partkey FROM part WHERE p_brand = '{Q17_BRAND}') bp2
        ON l_partkey = bp2.p_partkey
      GROUP BY l_partkey) pp
  ON l_partkey = pp.pp_key
WHERE CAST(l_quantity AS DECIMAL(12,2)) * 2 * cnt < sum_qty
"""


def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers who placed the very largest orders by
    total quantity — GROUP BY + HAVING on the fact, then join BACK to
    orders/customer for the report columns, top-10.

    Scale: the HAVING aggregation collapses lineitem to one row per
    qualifying order BEFORE any join (at TPC-H selectivity that is a few
    rows per million orders), so the join back to orders broadcasts the
    aggregate side; customer is a broadcast dim; the final top-10 is
    TakeOrderedAndProject.  The naive plan — join first, aggregate after
    — would shuffle the full fact twice.
    """
    big = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity", "decimal(12,2)")).alias("sum_qty_dec"))
        .filter(F.col("sum_qty_dec") > F.lit(Q18_QTY_THRESHOLD).cast("decimal(12,2)"))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            F.col("o_orderkey").alias("order_key"),
            F.date_trunc("day", F.col("o_orderdate")).alias("order_date"),
            F.col("o_totalprice").alias("total_price"),
            F.col("sum_qty_dec").cast("double").alias("sum_qty"),
        )
        .orderBy(F.col("total_price").desc(), F.col("order_key"))
        .limit(10)
    )


LARGE_VOLUME_CUSTOMERS_ORACLE = f"""
SELECT c_name,
       c_custkey,
       o_orderkey AS order_key,
       date_trunc('day', o_orderdate) AS order_date,
       o_totalprice AS total_price,
       CAST(sum_qty_dec AS DOUBLE) AS sum_qty
FROM orders
JOIN (SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty_dec
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > CAST({Q18_QTY_THRESHOLD} AS DECIMAL(12,2))) big
  ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY total_price DESC, order_key
LIMIT 10
"""

Q19_CLAUSES = [
    ("Brand#12", 1, 15, 1, 20),
    ("Brand#23", 1, 25, 10, 30),
    ("Brand#34", 1, 35, 20, 40),
]


def disjunctive_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR of brand/size/quantity
    clause conjunctions — the disjunctive-predicate plan test.

    Scale: part broadcasts, so the disjunction evaluates inside the
    lineitem scan's stage; the quantity bounds additionally admit a
    REDUNDANT conjunct (``l_quantity BETWEEN min-of-mins AND
    max-of-maxes``) that, unlike the OR itself, is a plain range
    predicate Spark pushes into the parquet scan — row groups outside
    the envelope never leave disk.  Semantically a no-op (the OR
    implies it), so the oracle stays the pure disjunction.
    """
    qty_lo = min(c[3] for c in Q19_CLAUSES)
    qty_hi = max(c[4] for c in Q19_CLAUSES)
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity").between(qty_lo, qty_hi)  # pushdown envelope
    )
    clause = None
    for brand, size_lo, size_hi, q_lo, q_hi in Q19_CLAUSES:
        c = (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(size_lo, size_hi)
            & F.col("l_quantity").between(q_lo, q_hi)
        )
        clause = c if clause is None else (clause | c)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(clause)
        .agg(
            F.sum(_disc_price()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


_Q19_OR = " OR ".join(
    f"""(p_brand = '{b}' AND p_size BETWEEN {slo} AND {shi}
         AND l_quantity BETWEEN {qlo} AND {qhi})"""
    for b, slo, shi, qlo, qhi in Q19_CLAUSES
)

DISJUNCTIVE_PROMO_REVENUE_ORACLE = f"""
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
               * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
           AS revenue,
       count(*) AS n_lineitems
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE {_Q19_OR}
"""


def idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: per-nation count and balance of above-average-
    balance customers with NO recent orders — global scalar aggregate +
    anti-join, combined.

    Scale: the global average is a one-row decimal aggregate broadcast
    by a cross-join (never a shuffle); the comparison is multiplied out
    (``bal·cnt > sum``) so it is exact fixed-point on both engines.  The
    anti-join probe projects only recent orders' ``o_custkey`` (partial-
    distinct before the exchange).  Output is |nations| rows.
    """
    cust = load_table(spark, sf_dir, "customer")
    positive = cust.filter(F.col("c_acctbal") > 0)
    avg_row = positive.agg(
        F.sum(dec("c_acctbal", "decimal(14,2)")).alias("bal_sum"),
        F.count(F.lit(1)).alias("bal_cnt"),
    )
    recent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit(Q22_CUTOFF).cast("timestamp"))
        .select("o_custkey")
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        cust.crossJoin(F.broadcast(avg_row))
        .filter(dec("c_acctbal", "decimal(14,2)") * F.col("bal_cnt") > F.col("bal_sum"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(dec("c_acctbal", "decimal(14,2)")).cast("double").alias("total_balance"),
        )
        .select(F.col("n_name").alias("nation"), "n_customers", "total_balance")
    )


IDLE_RICH_CUSTOMERS_ORACLE = f"""
WITH stats AS (
    SELECT sum(CAST(c_acctbal AS DECIMAL(14,2))) AS bal_sum,
           count(*) AS bal_cnt
    FROM customer WHERE c_acctbal > 0
)
SELECT n_name AS nation,
       count(*) AS n_customers,
       CAST(sum(CAST(c_acctbal AS DECIMAL(14,2))) AS DOUBLE) AS total_balance
FROM customer, stats
JOIN nation ON c_nationkey = n_nationkey
WHERE CAST(c_acctbal AS DECIMAL(14,2)) * bal_cnt > bal_sum
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '{Q22_CUTOFF} 00:00:00')
GROUP BY n_name
"""


Q8_REGION = "AMERICA"
Q8_NATION = "NATION_6"
Q8_TYPE = "ECONOMY"
Q10_START, Q10_END = "1997-10-01", "1998-01-01"


def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one supplier nation's share of revenue, by year,
    within one region's market for one part type — a join where NATION
    plays two roles (customer side restricts the market, supplier side
    labels the share), plus a conditional-ratio aggregate.

    Scale: part slice, supplier→nation, and nation→region all broadcast;
    customer-in-region is a fifth of customers (NOT broadcastable at
    100 TB) so orders⋈customer and lineitem⋈orders are the two
    unavoidable fact shuffles.  The share is a ratio of two exact
    decimal sums cast to double — one aggregation pass, identical bits
    on both engines.
    """
    region = (
        load_table(spark, sf_dir, "region")
        .filter(F.col("r_name") == Q8_REGION)
        .select("r_regionkey")
    )
    nation = load_table(spark, sf_dir, "nation")
    market_cust = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                nation.join(
                    F.broadcast(region), nation.n_regionkey == region.r_regionkey
                ).select("n_nationkey")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    supp_nation = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    econ_parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == Q8_TYPE)
        .select("p_partkey")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem")
    rev = _disc_price()
    zero = F.lit(0).cast("decimal(16,4)")
    return (
        li.join(F.broadcast(econ_parts), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(supp_nation), li.l_suppkey == F.col("s_suppkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(market_cust, orders.o_custkey == F.col("c_custkey"))
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == Q8_NATION, rev).otherwise(zero)
                ).cast("double")
                / F.sum(rev).cast("double")
            ).alias("market_share"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


NATION_MARKET_SHARE_ORACLE = f"""
SELECT year(o_orderdate) AS order_year,
       CAST(sum(CASE WHEN n2.n_name = '{Q8_NATION}'
                     THEN CAST(l_extendedprice AS DECIMAL(12,2))
                          * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))
                     ELSE CAST(0 AS DECIMAL(16,4)) END) AS DOUBLE)
       / CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                  * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
           AS market_share,
       count(*) AS n_lineitems
FROM lineitem
JOIN part     ON l_partkey = p_partkey AND p_type = '{Q8_TYPE}'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region   ON n1.n_regionkey = r_regionkey AND r_name = '{Q8_REGION}'
GROUP BY year(o_orderdate)
"""


def returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: the 20 customers who returned the most revenue in
    one quarter — selective fact filters on both sides, broadcast
    customer+nation report columns, top-k.

    Scale: the quarter predicate prunes orders at the scan and the
    R-flag prunes lineitem; their join is the one shuffle.  Customer is
    joined AFTER the aggregation (one row per customer with returns in
    the quarter — bounded by the quarter's active customers), so the
    report join broadcasts the aggregate, not the dimension.  Top-20 is
    TakeOrderedAndProject.
    """
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit(Q10_START).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(Q10_END).cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    returned = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    per_cust = (
        returned.join(orders, returned.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        cust.join(F.broadcast(per_cust), cust.c_custkey == F.col("o_custkey"))
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.col("c_acctbal").alias("acctbal"),
            F.col("n_name").alias("nation"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


RETURNED_ITEM_CUSTOMERS_ORACLE = f"""
SELECT c_custkey,
       c_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
           AS revenue,
       c_acctbal AS acctbal,
       n_name AS nation
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '{Q10_START} 00:00:00'
  AND o_orderdate <  TIMESTAMP '{Q10_END} 00:00:00'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


Q9_PART_MARK = "red"
Q15_START, Q15_END = "1996-01-01", "1996-04-01"


def nation_year_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation × order year for parts
    matching a name mark — the one fact-fact exchange (lineitem⋈orders on
    orderkey) ringed by three broadcast dimensions.  The testdata schema
    has no ``partsupp``, so unit cost is the part's retail price (the
    join/aggregation shape — Q9's point — is unchanged).

    Scale: the ``p_name LIKE`` filter reaches the part scan, and the
    broadcast part join prunes lineitem BEFORE the orderkey exchange, so
    the shuffle carries only marked-part lineitems; orders ships just
    (orderkey, year).  Profit is exact decimal arithmetic summed
    order-independently, cast to double once (functions/exact.py).
    """
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like(f"%{Q9_PART_MARK}%")
    )
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("o_year")
    )
    li = load_table(spark, sf_dir, "lineitem")
    profit = _disc_price() - dec("p_retailprice", "decimal(12,2)") * dec(
        "l_quantity", "decimal(12,2)"
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("n_name").alias("nation"), "o_year")
        .agg(F.sum(profit).cast("double").alias("profit"))
    )


NATION_YEAR_PROFIT_ORACLE = f"""
SELECT n.n_name AS nation,
       year(o.o_orderdate) AS o_year,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(3,2)))
                - CAST(p.p_retailprice AS DECIMAL(12,2))
                  * CAST(l.l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS profit
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE p.p_name LIKE '%{Q9_PART_MARK}%'
GROUP BY 1, 2
"""


def top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with maximum revenue over one
    quarter — grouped revenue, a one-row global max, and an equality
    join-back.  The tie-safe formulation (all argmax rows, no LIMIT 1)
    and the DECIMAL equality comparison are what make it deterministic
    enough to hash-match across engines.

    Scale: revenue is one map-side-partial aggregation of the
    quarter-pruned lineitem scan keyed by suppkey; the max is a one-row
    broadcast; supplier names arrive by broadcast join.  No fact
    re-scan, no window over the full aggregate.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q15_START))
        & (F.col("l_shipdate") < F.lit(Q15_END))
    )
    # barrier: rev feeds BOTH the global max and the join-back — without
    # it the quarter-pruned fact aggregation is computed twice
    rev = barrier(li.groupBy("l_suppkey").agg(F.sum(_disc_price()).alias("rev_dec")))
    top = rev.agg(F.max("rev_dec").alias("max_rev"))
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(top), rev.rev_dec == top.max_rev)
        .join(F.broadcast(supplier), rev.l_suppkey == supplier.s_suppkey)
        .select(
            F.col("s_suppkey"),
            F.col("s_name"),
            F.col("rev_dec").cast("double").alias("total_revenue"),
        )
    )


TOP_REVENUE_SUPPLIER_ORACLE = f"""
WITH rev AS (
    SELECT l_suppkey,
           sum(CAST(l_extendedprice AS DECIMAL(12,2))
               * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS rev_dec
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '{Q15_START}' AND l_shipdate < TIMESTAMP '{Q15_END}'
    GROUP BY 1
)
SELECT s.s_suppkey, s.s_name, CAST(r.rev_dec AS DOUBLE) AS total_revenue
FROM rev r
JOIN (SELECT max(rev_dec) AS max_rev FROM rev) m ON r.rev_dec = m.max_rev
JOIN supplier s ON r.l_suppkey = s.s_suppkey
"""


QUERIES: dict[str, QuerySpec] = {
    "nation_year_profit": QuerySpec(
        nation_year_profit,
        NATION_YEAR_PROFIT_ORACLE,
        "Q9: nation x year profit, one fact-fact exchange + broadcast dims",
    ),
    "top_revenue_supplier": QuerySpec(
        top_revenue_supplier,
        TOP_REVENUE_SUPPLIER_ORACLE,
        "Q15: quarter top-revenue supplier, tie-safe argmax join-back",
    ),
    "order_priority_returns": QuerySpec(
        order_priority_returns,
        ORDER_PRIORITY_RETURNS_ORACLE,
        "Q4: fact-fact EXISTS via left-semi, per-priority counts",
    ),
    "customer_order_histogram": QuerySpec(
        customer_order_histogram,
        CUSTOMER_ORDER_HISTOGRAM_ORACLE,
        "Q13: zero-preserving outer-join order-count histogram",
    ),
    "small_quantity_revenue": QuerySpec(
        small_quantity_revenue,
        SMALL_QUANTITY_REVENUE_ORACLE,
        "Q17: decorrelated per-part average threshold, broadcast-only joins",
    ),
    "large_volume_customers": QuerySpec(
        large_volume_customers,
        LARGE_VOLUME_CUSTOMERS_ORACLE,
        "Q18: HAVING on fact agg, join-back report, top-10",
    ),
    "disjunctive_promo_revenue": QuerySpec(
        disjunctive_promo_revenue,
        DISJUNCTIVE_PROMO_REVENUE_ORACLE,
        "Q19: OR-of-conjunctions with a pushable range envelope",
    ),
    "idle_rich_customers": QuerySpec(
        idle_rich_customers,
        IDLE_RICH_CUSTOMERS_ORACLE,
        "Q22: global scalar aggregate + anti-join, per-nation rollup",
    ),
    "nation_market_share": QuerySpec(
        nation_market_share,
        NATION_MARKET_SHARE_ORACLE,
        "Q8: dual-role nation join, conditional-ratio share by year",
    ),
    "returned_item_customers": QuerySpec(
        returned_item_customers,
        RETURNED_ITEM_CUSTOMERS_ORACLE,
        "Q10: quarter returns report, aggregate-then-join, top-20",
    ),
}
