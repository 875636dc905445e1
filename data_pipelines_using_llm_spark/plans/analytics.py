"""Deeper analytics query pack: the two classic multi-join decision-support
shapes the reference's join archetype (J1/J2, ``Third Experiment/Claude
Opus 4.py:154-179``) grows into at warehouse scale, batch sessionization
(the batch twin of ``streaming/stream_user_sessions``), distinctive-term
extraction over ``documents``, and the approximate-distinct scale path.

Scale notes are per-query; the common theme is: broadcast every dimension,
let the one unavoidable fact-fact shuffle be the only exchange, and keep
every expression JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipelines_using_llm_spark.functions.exact import dec, exact_avg, exact_sum
from data_pipelines_using_llm_spark.plans.text_queries import SQL_TOKENS
from data_pipelines_using_llm_spark.operators import text as TX
from data_pipelines_using_llm_spark.registry import QuerySpec
from data_pipelines_using_llm_spark.sources.tables import load_table

_CUTOFF = "1998-06-01"
SESSION_GAP_MIN = 30
TOP_TERMS_K = 3


def _disc_price():
    return dec("l_extendedprice", "decimal(12,2)") * (
        F.lit(1).cast("decimal(3,2)") - dec("l_discount", "decimal(3,2)")
    )


def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective filters on BOTH fact sides + a broadcast
    dimension semi-filter + top-k — the canonical "orders not yet shipped"
    report.

    Scale: the customer filter broadcasts (one market segment), so the
    orders fact never shuffles for it; orders⋈lineitem is the single
    sort-merge exchange, with both scans pruned by pushed-down date
    predicates; the final top-10 is TakeOrderedAndProject (no global
    sort materialization).  Tie-break on order_key keeps the LIMIT
    deterministic across engines.
    """
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < F.lit(_CUTOFF).cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderdate")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(_CUTOFF).cast("timestamp")
    )
    return (
        li.join(
            orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey),
            li.l_orderkey == orders.o_orderkey,
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .select(
            F.col("l_orderkey").alias("order_key"),
            F.date_trunc("day", F.col("o_orderdate")).alias("order_date"),
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), F.col("order_key"))
        .limit(10)
    )


SHIPPING_PRIORITY_ORACLE = f"""
SELECT l_orderkey AS order_key,
       date_trunc('day', o_orderdate) AS order_date,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
           AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '{_CUTOFF} 00:00:00'
  AND l_shipdate  > TIMESTAMP '{_CUTOFF} 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, order_key
LIMIT 10
"""


def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: six-way join with the two-key co-nationality
    constraint (customer and supplier in the SAME nation) — the join no
    single equi-key expresses, so it lands on the composite
    (suppkey, nationkey) condition.

    Scale: region/nation/supplier/customer all broadcast (dimensions);
    lineitem⋈orders is again the only true shuffle.  The co-nationality
    predicate rides on the supplier broadcast join instead of forcing an
    extra exchange.
    """
    region = (
        load_table(spark, sf_dir, "region")
        .filter(F.col("r_name") == "ASIA")
        .select("r_regionkey")
    )
    nation = load_table(spark, sf_dir, "nation").join(
        F.broadcast(region),
        F.col("n_regionkey") == F.col("r_regionkey"),
    )
    cust = load_table(spark, sf_dir, "customer").join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", "c_nationkey", "n_name")
    orders = (
        load_table(spark, sf_dir, "orders")
        # range predicate, not year() == 1997 — a function over the column
        # defeats parquet predicate pushdown / row-group pruning
        .filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    enriched_orders = orders.join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey
    )
    return (
        li.join(enriched_orders, li.l_orderkey == enriched_orders.o_orderkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (F.col("c_nationkey") == supp.s_nationkey),
        )
        .groupBy("n_name")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
    )


LOCAL_SUPPLIER_VOLUME_ORACLE = """
SELECT n_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
           AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
"""


def user_sessions_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization in batch: a new session starts after a
    >30-minute silence.  lag → flag → running sum is the standard
    two-window formulation; the batch twin of the streaming
    ``session_window`` query (``streaming/stream_queries.py``).

    Scale: both windows share the same (user_id × ts) partitioning, so
    Spark plans ONE exchange + sort and runs both window functions over
    it; the final groupBy re-uses the user_id clustering.  Event-id
    tie-break makes ordering total, so the flag column is deterministic.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    new_session = F.when(
        gap_us.isNull() | (gap_us > SESSION_GAP_MIN * 60 * 1_000_000), 1
    ).otherwise(0)
    running = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        ev.withColumn("session_idx", F.sum(new_session).over(running))
        .groupBy("user_id", "session_idx")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            exact_sum("value").alias("sum_value"),
        )
    )


USER_SESSIONS_ORACLE = f"""
WITH flagged AS (
    SELECT user_id, ts, event_id, value,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                     > {SESSION_GAP_MIN} * 60 * 1000000
                THEN 1 ELSE 0 END AS new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
numbered AS (
    SELECT user_id, ts, value,
           CAST(sum(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS session_idx
    FROM flagged
)
SELECT user_id, session_idx,
       min(ts) AS session_start,
       max(ts) AS session_end,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM numbered
GROUP BY user_id, session_idx
"""


def doc_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinctive terms per document: top-``TOP_TERMS_K`` tokens by term
    frequency among terms whose document frequency is <= half the corpus
    (the TF-IDF ranking with the idf *filter* kept integer-exact instead
    of a float idf weight — log() differs in the last ulp across libm
    implementations, integer tf/df comparisons never do).

    Scale: tf and df are both map-side partial aggregates over the
    exploded token stream; df joins back by term (dict-sized → broadcast
    under AQE); corpus size N joins as a broadcast one-row aggregate, not
    a driver-side collect.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(TX.tokens(F.lower(F.col("text")))).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = (
        toks.distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    n_docs = d.agg(F.count(F.lit(1)).alias("n_docs"))
    ranked = (
        tf.join(df, "term")
        .join(F.broadcast(n_docs))
        .filter(F.col("df") * 2 <= F.col("n_docs"))
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(
                    F.col("tf").desc(), F.col("term")
                )
            ),
        )
    )
    return ranked.filter(F.col("rank") <= TOP_TERMS_K).select(
        "doc_id", "term", "tf", "df", "rank"
    )


ZIPF_TOP_R = 200


def term_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit of the corpus term-frequency distribution: OLS of
    ``ln(count)`` on ``ln(rank)`` over the top ``ZIPF_TOP_R`` terms — a
    natural corpus should fit with slope ≈ −1; a templated/synthetic or
    boilerplate-polluted corpus bends the curve, making the slope a
    one-number corpus-health screen next to the Gopher repetition
    signals.

    Determinism: term counts are exact integers; ranks are
    ``row_number`` with a full (count DESC, term) tie-break; the four
    OLS power sums fold over the rank-sorted top-R array in identical
    order on both engines (4-element array accumulator, as
    plans/statistics.py Holt), with ln() under the PMI round(…, 6)
    convention.

    Scale: one exploded-token groupBy (map-side combined), a top-R
    TakeOrdered that is dict-sized, and a fold over 200 elements —
    the fact table is scanned once.
    """
    d = load_table(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(TX.tokens(F.lower(F.col("text")))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    ranked = (
        counts.withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.col("n").desc(), F.col("term"))
            ),
        )
        .filter(F.col("rank") <= ZIPF_TOP_R)
    )
    arr = ranked.groupBy().agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("rank", "n"))),
            lambda s: F.array(
                F.log(s["rank"].cast("double")), F.log(s["n"].cast("double"))
            ),
        ).alias("xy")
    )
    sums = F.aggregate(
        F.col("xy"),
        F.array(F.lit(0.0), F.lit(0.0), F.lit(0.0), F.lit(0.0)),
        lambda acc, e: F.array(
            F.element_at(acc, 1) + F.element_at(e, 1),
            F.element_at(acc, 2) + F.element_at(e, 2),
            F.element_at(acc, 3) + F.element_at(e, 1) * F.element_at(e, 2),
            F.element_at(acc, 4) + F.element_at(e, 1) * F.element_at(e, 1),
        ),
    )
    n = F.size("xy").cast("double")
    sx, sy = F.element_at(sums, 1), F.element_at(sums, 2)
    sxy, sx2 = F.element_at(sums, 3), F.element_at(sums, 4)
    slope = (n * sxy - sx * sy) / (n * sx2 - sx * sx)
    return arr.select(
        F.size("xy").alias("n_terms"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round((sy - slope * sx) / n, 6).alias("zipf_intercept"),
    )


def _term_zipf_oracle() -> str:
    toks = SQL_TOKENS.format(col="lower(text)")
    return f"""
WITH counts AS (
    SELECT term, count(*) AS n
    FROM (SELECT unnest({toks}) AS term FROM documents)
    GROUP BY term
),
ranked AS (
    SELECT term, n,
           row_number() OVER (ORDER BY n DESC, term) AS rank
    FROM counts QUALIFY rank <= {ZIPF_TOP_R}
),
arr AS (
    SELECT list_transform(
               array_agg([CAST(rank AS BIGINT), n] ORDER BY rank),
               e -> [ln(CAST(e[1] AS DOUBLE)), ln(CAST(e[2] AS DOUBLE))]
           ) AS xy
    FROM ranked
),
f AS (
    SELECT len(xy) AS n_terms,
           list_reduce(
               list_prepend([CAST(0.0 AS DOUBLE), 0.0, 0.0, 0.0],
                            list_transform(xy, e -> [e[1], e[2],
                                                     CAST(0.0 AS DOUBLE), 0.0])),
               (acc, e) -> [acc[1] + e[1], acc[2] + e[2],
                            acc[3] + e[1] * e[2], acc[4] + e[1] * e[1]]
           ) AS s
    FROM arr
)
SELECT CAST(n_terms AS INT) AS n_terms,
       round((n_terms * s[3] - s[1] * s[2])
             / (n_terms * s[4] - s[1] * s[1]), 6) AS zipf_slope,
       round((s[2] - (n_terms * s[3] - s[1] * s[2])
                     / (n_terms * s[4] - s[1] * s[1]) * s[1]) / n_terms, 6)
           AS zipf_intercept
FROM f
"""


def _top_terms_oracle() -> str:
    toks = SQL_TOKENS.format(col="lower(text)")
    return f"""
WITH toks AS (
    SELECT doc_id, unnest({toks}) AS term FROM documents
),
tf AS (
    SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
),
df AS (
    SELECT term, count(*) AS df
    FROM (SELECT DISTINCT doc_id, term FROM toks) GROUP BY term
),
n AS (SELECT count(*) AS n_docs FROM documents)
SELECT doc_id, term, tf, df, rank FROM (
    SELECT tf.doc_id, tf.term, tf.tf, df.df,
           row_number() OVER (
               PARTITION BY tf.doc_id ORDER BY tf.tf DESC, tf.term
           ) AS rank
    FROM tf JOIN df USING (term) CROSS JOIN n
    WHERE df.df * 2 <= n.n_docs
)
WHERE rank <= {TOP_TERMS_K}
"""


HIST_BUCKETS = 32
HIST_STEP_CENTS = 1600  # 16.00-wide buckets; events.value < 512


def value_histogram_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable fixed-bucket histogram rollup — the quantile sibling of
    the HLL reach rollup: per-(type, day) 32-bucket value histograms are
    the STORED state (integer cell counts, merged by addition — the same
    mergeability contract as ``reach_sketch_rollup``), and any coarser
    grain answers quantile queries from the merged cells without
    re-scanning values.  Median estimate = midpoint of the first bucket
    whose cumulative count reaches half — by construction within one
    bucket width (16.0) of the exact interpolated median, which is
    emitted alongside with the bound flag (the ``approx_user_reach``
    gate pattern: exact value hash-gated, approximation quality
    asserted).

    Determinism: buckets are exact integer arithmetic on cents
    (``DIV``, no float division), cells are counts, the midpoint is an
    exact double multiple of 8 — only the exact-median column touches
    interpolation, and both engines share its ``p*(n-1)`` definition
    (see ``value_percentiles``).
    """
    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    bucket = F.least(
        F.expr(
            f"CAST(CAST(value AS DECIMAL(9,2)) * 100 AS BIGINT)"
            f" DIV {HIST_STEP_CENTS}"
        ),
        F.lit(HIST_BUCKETS - 1),
    ).cast("int")
    daily = (
        e.select(
            "event_type",
            F.date_trunc("day", "ts").alias("day"),
            bucket.alias("bucket"),
        )
        .groupBy("event_type", "day", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    merged = daily.groupBy("event_type", "bucket").agg(F.sum("n").alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = Window.partitionBy("event_type")
    ranked = merged.select(
        "event_type",
        "bucket",
        "n",
        F.sum("n").over(w).alias("cum"),
        F.sum("n").over(tot).alias("n_values"),
    ).filter(F.col("cum") * 2 >= F.col("n_values"))
    est = ranked.groupBy("event_type", "n_values").agg(
        F.min("bucket").alias("p50_bucket")
    )
    exact = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("exact_p50")
    )
    step = HIST_STEP_CENTS / 100.0
    return (
        est.join(exact, "event_type")
        .select(
            "event_type",
            "n_values",
            (F.col("p50_bucket") * F.lit(step) + F.lit(step / 2)).alias(
                "est_p50"
            ),
            F.round("exact_p50", 6).alias("exact_p50"),
            (
                F.abs(
                    F.col("p50_bucket") * F.lit(step)
                    + F.lit(step / 2)
                    - F.col("exact_p50")
                )
                <= F.lit(step)
            ).cast("int").alias("within_bucket"),
        )
    )


VALUE_HISTOGRAM_ROLLUP_ORACLE = f"""
WITH e AS (SELECT event_type, ts, value FROM events WHERE value IS NOT NULL),
daily AS (
    SELECT event_type, date_trunc('day', ts) AS day,
           least(CAST(CAST(value AS DECIMAL(9,2)) * 100 AS BIGINT)
                 // {HIST_STEP_CENTS}, {HIST_BUCKETS - 1}) AS bucket,
           count(*) AS n
    FROM e GROUP BY 1, 2, 3
),
merged AS (
    SELECT event_type, bucket, sum(n) AS n FROM daily GROUP BY 1, 2
),
ranked AS (
    SELECT event_type, bucket, n,
           sum(n) OVER (PARTITION BY event_type ORDER BY bucket) AS cum,
           sum(n) OVER (PARTITION BY event_type) AS n_values
    FROM merged
),
est AS (
    SELECT event_type, n_values, min(bucket) AS p50_bucket
    FROM ranked WHERE cum * 2 >= n_values GROUP BY 1, 2
),
exact AS (
    SELECT event_type, quantile_cont(value, 0.5) AS exact_p50
    FROM e GROUP BY 1
)
SELECT est.event_type, CAST(est.n_values AS BIGINT) AS n_values,
       est.p50_bucket * {HIST_STEP_CENTS / 100.0}
           + {HIST_STEP_CENTS / 200.0} AS est_p50,
       round(exact.exact_p50, 6) AS exact_p50,
       CAST(abs(est.p50_bucket * {HIST_STEP_CENTS / 100.0}
                + {HIST_STEP_CENTS / 200.0} - exact.exact_p50)
            <= {HIST_STEP_CENTS / 100.0} AS INT) AS within_bucket
FROM est JOIN exact USING (event_type)
"""


_REACH_RSD = 0.02  # sketch rsd; the gate flag allows 0.05 (2.5 sigma slack)
_REACH_TOL = 0.05


def approx_user_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The approximate-distinct scale path: per-event-type user reach via
    HyperLogLog++ (`approx_count_distinct`) gated cross-engine the same
    way as ``value_percentiles_approx``: the output carries the EXACT
    count (hash-comparable) plus a ``reach_within_5pct`` flag computed
    from the sketch on the Spark side and emitted as the literal
    expectation (1) by the DuckDB oracle — a drifting sketch flips the
    flag and fails the hash gate.  The sketch estimate itself stays out
    of the hashed columns because HLL register layouts differ across
    engines by design.

    The sketch runs at rsd=0.02 while the flag allows 5% relative error:
    measured worst-case error on this corpus is 0.4% (sf0.001-0.1), so
    the flag is deterministic-green with a 12x margin, and HLL++ is
    deterministic for fixed data (no RNG) — the gate cannot flake.

    Scale: exact count_distinct(user_id) needs a per-type shuffle of
    every distinct user; the HLL sketch is a fixed ~KB per group merged
    map-side — at 100 TB the sketch is the only viable reach metric.
    The exact count here is the verification harness, not the production
    path (same contract as the percentile band check).
    """
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", _REACH_RSD).alias("approx_users"),
        F.count_distinct(F.col("user_id")).alias("exact_users"),
        F.count(F.lit(1)).alias("n_events"),
    )
    within = (
        F.abs(F.col("approx_users") - F.col("exact_users"))
        / F.col("exact_users")
        <= _REACH_TOL
    )
    return agg.select(
        "event_type",
        "exact_users",
        "n_events",
        F.when(within, 1).otherwise(0).cast("long").alias("reach_within_5pct"),
    )


APPROX_USER_REACH_ORACLE = """
SELECT event_type,
       count(DISTINCT user_id) AS exact_users,
       count(*) AS n_events,
       CAST(1 AS BIGINT) AS reach_within_5pct
FROM events
GROUP BY event_type
"""


def reach_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MERGEABLE-sketch rollup ``approx_user_reach`` doesn't show:
    per-(event_type, day) HLL sketches union-merged up to
    (event_type, month) WITHOUT rescanning the fact — the reason
    sketches exist at 100 TB (daily sketches are kilobytes; re-counting
    distinct users per rollup grain re-shuffles the world).

    Uses Spark's Apache DataSketches HLL surface (``hll_sketch_agg`` →
    ``hll_union_agg`` → ``hll_sketch_estimate``), which is exactly the
    materialized-rollup pattern: persist daily sketches, answer any
    coarser-grain reach query by merging them.

    Gate contract (same as ``approx_user_reach`` /
    ``value_percentiles_approx``): hashed columns are the EXACT monthly
    distinct count, the merged-day count, and a ``merged_within_5pct``
    flag computed from the sketch on the Spark side and emitted as the
    literal expectation by the oracle — sketch drift flips the flag and
    fails the hash gate; the binary sketch itself stays out (register
    layouts are engine-specific by design).  DataSketches HLL is
    deterministic for fixed input, so the flag cannot flake; measured
    worst-case merged error on this corpus is <2% vs the 5% tolerance.

    The exact count is the verification harness, not the production
    path — at scale only the daily-sketch aggregation and the tiny
    merge run.
    """
    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))
    month = F.date_trunc("month", F.col("day"))
    daily = ev.select(
        "event_type", day.alias("day"), "user_id"
    ).groupBy("event_type", "day").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    monthly = daily.groupBy("event_type", month.alias("month")).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
        F.count(F.lit(1)).alias("n_days"),
    )
    exact = (
        ev.select(
            "event_type", F.date_trunc("month", F.col("ts")).alias("month"), "user_id"
        )
        .groupBy("event_type", "month")
        .agg(F.count_distinct("user_id").alias("exact_users"))
    )
    within = (
        F.abs(F.col("approx_users") - F.col("exact_users"))
        / F.col("exact_users")
        <= _REACH_TOL
    )
    return monthly.join(exact, ["event_type", "month"]).select(
        "event_type",
        "month",
        "exact_users",
        "n_days",
        F.when(within, 1).otherwise(0).cast("long").alias("merged_within_5pct"),
    )


REACH_SKETCH_ROLLUP_ORACLE = """
SELECT event_type,
       date_trunc('month', ts) AS month,
       count(DISTINCT user_id) AS exact_users,
       count(DISTINCT date_trunc('day', ts)) AS n_days,
       CAST(1 AS BIGINT) AS merged_within_5pct
FROM events
GROUP BY 1, 2
"""


def events_zorder_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key per event over the
    (user_id, event-hour) plane — the multi-column data-layout primitive
    behind OPTIMIZE...ZORDER (functions/zorder.py; wired into
    ``sinks/writers.py::compact_table``).  Files sorted by this key hold
    narrow ranges in BOTH dimensions, so parquet min/max skipping prunes
    on either predicate alone — the property a lexicographic
    (user_id, hour) sort gives only for user_id.

    Scale: bucket bounds are a ONE-ROW broadcast aggregate; bucketize +
    interleave are pure BIGINT shift/mask expressions (codegen, no
    doubles, engine-exact); computing the key is shuffle-free.  The
    clustering effectiveness (per-file range narrowing vs lexicographic
    sort) is measured in tests/test_sinks.py.
    """
    from data_pipelines_using_llm_spark.functions import zorder as Z

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.call_function(
            "div", F.unix_timestamp(F.col("ts")), F.lit(3600).cast("long")
        ).alias("hour"),
    )
    bounds = ev.agg(
        F.min("user_id").alias("ulo"),
        F.max("user_id").alias("uhi"),
        F.min("hour").alias("hlo"),
        F.max("hour").alias("hhi"),
    )
    keyed = ev.crossJoin(F.broadcast(bounds)).select(
        "event_id",
        Z.bucketize(F.col("user_id"), F.col("ulo"), F.col("uhi")).alias(
            "user_bucket"
        ),
        Z.bucketize(F.col("hour"), F.col("hlo"), F.col("hhi")).alias(
            "hour_bucket"
        ),
    )
    return keyed.select(
        "event_id",
        "user_bucket",
        "hour_bucket",
        Z.interleave_bits(F.col("user_bucket"), F.col("hour_bucket")).alias(
            "zvalue"
        ),
    )


def _zorder_oracle() -> str:
    from data_pipelines_using_llm_spark.functions import zorder as Z

    bu = Z.sql_bucketize("user_id", "ulo", "uhi")
    bh = Z.sql_bucketize("hour", "hlo", "hhi")
    return f"""
WITH e AS (
    -- date_diff counts hour boundaries = floor(seconds/3600); a plain
    -- CAST(epoch(..)) would ROUND sub-second timestamps and drift by one
    -- bucket at hour edges (Spark's unix_timestamp truncates)
    SELECT event_id, user_id,
           date_diff('hour', TIMESTAMP '1970-01-01 00:00:00', ts) AS hour
    FROM events
),
b AS (SELECT min(user_id) AS ulo, max(user_id) AS uhi,
             min(hour) AS hlo, max(hour) AS hhi FROM e),
k AS (SELECT event_id, {bu} AS user_bucket, {bh} AS hour_bucket FROM e, b)
SELECT event_id, user_bucket, hour_bucket,
       {Z.sql_interleave('user_bucket', 'hour_bucket')} AS zvalue
FROM k
"""


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def user_activity_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long → wide): per-user event counts, one column per event
    type, as SINGLE-PASS conditional aggregation.

    Deliberately not ``df.pivot()``: with undeclared values pivot runs a
    schema-discovery distinct job over the fact table, and even with
    declared values Spark plans it as TWO aggregations with an extra
    exchange between them (verified via explain; the plan gate in
    tests/test_plans.py asserts this formulation keeps one).  Conditional
    counts give the identical wide result with one shuffle and map-side
    combine — and a fixed output schema, which a 100 TB pipeline needs
    for plan reuse downstream.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        *[
            F.count(F.when(F.col("event_type") == t, F.lit(1))).alias(t)
            for t in EVENT_TYPES
        ]
    )


USER_ACTIVITY_PIVOT_ORACLE = f"""
SELECT user_id,
       {", ".join(
           f"count(CASE WHEN event_type = '{t}' THEN 1 END) AS {t}"
           for t in EVENT_TYPES
       )}
FROM events
GROUP BY user_id
"""


def churned_purchasers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference (§2.9 — absent from the reference, completing the
    set-op family next to ``union_splice``): users who purchased in the
    first half of the observed month but not in the second half.

    ``exceptAll`` on the projected key column; at scale both sides shrink
    to distinct user_ids before the except's shuffle (aggregate pushdown
    via the explicit ``distinct()``).
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    mid = F.lit("2024-01-16").cast("timestamp")
    first_half = ev.filter(F.col("ts") < mid).select("user_id").distinct()
    second_half = ev.filter(F.col("ts") >= mid).select("user_id").distinct()
    return first_half.exceptAll(second_half)


CHURNED_PURCHASERS_ORACLE = """
SELECT DISTINCT user_id FROM events
WHERE event_type = 'purchase' AND ts < TIMESTAMP '2024-01-16 00:00:00'
EXCEPT
SELECT DISTINCT user_id FROM events
WHERE event_type = 'purchase' AND ts >= TIMESTAMP '2024-01-16 00:00:00'
"""


def event_type_daily_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (the 2-D twin of ``revenue_rollup``'s ROLLUP):
    counts and value sums for every (event_type × day) combination plus
    both one-way margins and the grand total in ONE aggregation pass —
    Spark expands the grouping sets before the exchange, so partial
    aggregation still applies map-side.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("day", F.date_trunc("day", F.col("ts")))
        .cube("event_type", "day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            exact_sum("value").alias("sum_value"),
        )
    )


EVENT_TYPE_DAILY_CUBE_ORACLE = """
SELECT event_type, date_trunc('day', ts) AS day,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY CUBE (event_type, date_trunc('day', ts))
"""


def value_distribution_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ranking-function window family beyond row_number (§2.7 has only
    W1): quartile bucket, percent_rank and cume_dist of event values
    within each event type.  The order key is (value, event_id) — a total
    order, so ntile's bucket boundaries and every rank are deterministic
    and engine-independent (ties broken identically everywhere).

    Scale: ``event_type`` has ~5 distinct values, so a
    ``Window.partitionBy("event_type")`` plan funnels |events|/5 rows
    through each sort task — fine at sf0.1, a skew wall at 100x.  With a
    total order, all three functions are pure expressions of the exact
    per-group rank and group size, so this uses ``operators.ranking``'s
    range-partitioned exact rank (balanced tasks at any scale) and
    derives bit-identical results — the oracle below is still the plain
    window form.
    """
    from data_pipelines_using_llm_spark.operators.ranking import (
        cume_dist_from_rank,
        ntile_from_rank,
        percent_rank_from_rank,
        with_exact_rank,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    ranked = with_exact_rank(
        ev,
        [F.col("value").asc(), F.col("event_id").asc()],
        group_by=["event_type"],
        rank_col="g_rank",
        group_n_col="g_n",
    )
    rank, n = F.col("g_rank"), F.col("g_n")
    return ranked.select(
        "event_id",
        "event_type",
        "value",
        ntile_from_rank(rank, n, 4).alias("quartile"),
        percent_rank_from_rank(rank, n).alias("pct_rank"),
        cume_dist_from_rank(rank, n).alias("cume"),
    )


VALUE_DISTRIBUTION_RANKS_ORACLE = """
SELECT event_id, event_type, value,
       ntile(4)       OVER w AS quartile,
       percent_rank() OVER w AS pct_rank,
       cume_dist()    OVER w AS cume
FROM events
WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
"""


SAMPLE_MOD = 20


def sampled_type_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 1-in-``SAMPLE_MOD`` systematic sample (key-modulus,
    reproducible on any engine — unlike ``df.sample``'s RNG, which can
    never hash-match an oracle) feeding a per-type profile.  The scale
    point: the sample predicate is a pushed-down scan filter, so the
    pipeline reads 5% of rows before any shuffle.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_id") % SAMPLE_MOD == 0
    )
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        exact_sum("value").alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


SAMPLED_TYPE_PROFILE_ORACLE = f"""
SELECT event_type,
       count(*) AS n_sampled,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
       min(value) AS min_value,
       max(value) AS max_value
FROM events
WHERE event_id % {SAMPLE_MOD} = 0
GROUP BY event_type
"""


Z_THRESHOLD = 2.5


def value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score outlier detection per event type: rows whose value is more
    than ``Z_THRESHOLD`` standard deviations from the group mean.  The
    moments come from one decimal-exact grouped pass (the
    ``summary_stats_events`` convention — order-independent, so mean/std
    are bit-identical on both engines) and broadcast back onto the fact
    stream: the detector is one scan + one tiny broadcast join, no second
    shuffle of the data.  The filter applies to the ROUNDED z on both
    sides (cross-engine rule: never compare at an unrounded boundary).
    """
    ev = load_table(spark, sf_dir, "events")
    d = F.col("value").cast("decimal(18,2)")
    n = F.count("value")
    sx = F.sum(d).cast("double")
    sx2 = F.sum(d * d).cast("double")
    stats = ev.groupBy("event_type").agg(
        (sx / n).alias("mean_value"),
        F.sqrt((sx2 - sx * sx / n) / (n - F.lit(1))).alias("std_value"),
    )
    z = F.round(
        (F.col("value") - F.col("mean_value")) / F.col("std_value"), 6
    )
    return (
        ev.join(F.broadcast(stats), "event_type")
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) > Z_THRESHOLD)
        .select("event_id", "event_type", "value", "z")
    )


VALUE_OUTLIERS_ORACLE = f"""
WITH s AS (
    SELECT event_type,
           count(value) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sx,
           CAST(sum(CAST(value AS DECIMAL(18,2))
                    * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sx2
    FROM events GROUP BY event_type
)
SELECT event_id, event_type, value,
       round((value - sx / n) / sqrt((sx2 - sx * sx / n) / (n - 1)), 6) AS z
FROM events JOIN s USING (event_type)
WHERE abs(round((value - sx / n) / sqrt((sx2 - sx * sx / n) / (n - 1)), 6))
      > {Z_THRESHOLD}
"""


def nation_trade_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (no reference counterpart — the J1/J2 join archetype
    grown to warehouse scale): bilateral trade volume between every
    (supplier nation, customer nation) pair by ship year.

    Scale: lineitem⋈orders is the single fact-fact shuffle (on the join
    key both tables would be bucketed by in a real deployment); supplier,
    customer, and both nation lookups broadcast, so the enriched fact
    never re-shuffles until the final tiny (25x25xyears) aggregation,
    which partial-aggregates map-side.  Revenue sums are decimal-exact
    (functions/exact.py), so the matrix hash-matches DuckDB.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = load_table(spark, sf_dir, "nation")
    supp_nat = nat.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cust_nat = nat.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp_nat), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cust_nat), F.col("c_nationkey") == F.col("cn_key"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year")
        )
        .agg(
            F.sum(_disc_price()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


NATION_TRADE_MATRIX_ORACLE = """
SELECT sn.n_name AS supp_nation,
       cn.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS ship_year,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))))
            AS DOUBLE) AS revenue,
       count(*) AS n_lineitems
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey  = s_suppkey
JOIN customer ON o_custkey  = c_custkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
GROUP BY sn.n_name, cn.n_name, year(l_shipdate)
"""


def signup_activation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed RANGE JOIN (interval predicate — nothing in the reference
    joins on anything but equality): for every signup, how many clicks
    the same user made within the following hour.

    Scale shape: a naive range join is |signups| x |user clicks|; here
    both sides get an hour-bucket key (a click at most one hour after a
    signup lands in the signup's bucket or the next one), so the join is
    an EQUI-join on (user_id, bucket) with the range predicate as a
    post-filter — work proportional to real temporal collisions, and
    each qualifying (signup, click) pair matches in exactly one bucket
    (the click's own), so no dedup is needed.  Signups with zero clicks
    survive via the final left join against the per-signup counts.
    """
    ev = load_table(spark, sf_dir, "events")
    signups = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        "user_id",
        F.col("ts").alias("sts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("cts"),
        F.floor(F.unix_timestamp("ts") / 3600).alias("bucket"),
    )
    s_buckets = signups.withColumn(
        "bucket",
        F.explode(
            F.array(
                F.floor(F.unix_timestamp("sts") / 3600),
                F.floor(F.unix_timestamp("sts") / 3600) + 1,
            )
        ),
    )
    counts = (
        s_buckets.join(clicks, ["user_id", "bucket"])
        .filter(
            (F.col("cts") > F.col("sts"))
            & (F.col("cts") <= F.col("sts") + F.expr("INTERVAL 1 HOUR"))
        )
        .groupBy("signup_id")
        .agg(F.count(F.lit(1)).alias("n_clicks_1h"))
    )
    return signups.join(counts, "signup_id", "left").select(
        "signup_id",
        "user_id",
        F.coalesce(F.col("n_clicks_1h"), F.lit(0).cast("long")).alias(
            "n_clicks_1h"
        ),
    )


SIGNUP_ACTIVATION_ORACLE = """
WITH s AS (
    SELECT event_id AS signup_id, user_id, ts AS sts
    FROM events WHERE event_type = 'signup'
),
c AS (SELECT user_id, ts AS cts FROM events WHERE event_type = 'click'),
j AS (
    SELECT signup_id, count(*) AS n_clicks_1h
    FROM s JOIN c
      ON c.user_id = s.user_id
     AND c.cts > s.sts
     AND c.cts <= s.sts + INTERVAL 1 HOUR
    GROUP BY signup_id
)
SELECT s.signup_id, s.user_id, coalesce(j.n_clicks_1h, 0) AS n_clicks_1h
FROM s LEFT JOIN j USING (signup_id)
"""


def cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 flavor (argmin-per-group over a computed metric — the
    corpus has no correlated-subquery shape at all): for every part, the
    supplier with the lowest average unit price across its lineitems.

    Scale: one shuffle aggregates (part, supplier) partials map-side;
    the argmin is a per-part window over the (tiny) aggregate — the
    classic replacement for Q2's correlated MIN subquery.  Averages are
    decimal-exact, and the rank tiebreaks on supplier key, so the argmin
    is deterministic and engine-independent.
    """
    li = load_table(spark, sf_dir, "lineitem")
    per_pair = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(
            exact_avg("l_extendedprice", "decimal(12,2)").alias("avg_price"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )
    w = Window.partitionBy("l_partkey").orderBy("avg_price", "l_suppkey")
    return (
        per_pair.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("l_partkey").alias("part_key"),
            F.col("l_suppkey").alias("best_supp_key"),
            F.round("avg_price", 4).alias("best_avg_price"),
            F.col("n_lines").alias("n_lines"),
        )
    )


CHEAPEST_SUPPLIER_ORACLE = """
WITH per_pair AS (
    SELECT l_partkey, l_suppkey,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
               / count(l_extendedprice) AS avg_price,
           count(*) AS n_lines
    FROM lineitem
    GROUP BY l_partkey, l_suppkey
)
SELECT l_partkey AS part_key, l_suppkey AS best_supp_key,
       round(avg_price, 4) AS best_avg_price, n_lines
FROM (SELECT *, row_number() OVER (PARTITION BY l_partkey
                                   ORDER BY avg_price, l_suppkey) AS rn
      FROM per_pair)
WHERE rn = 1
"""


def user_sessions_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via the BUILT-IN ``session_window`` merging
    aggregation — the declarative twin of ``user_sessions_batch``'s
    lag→flag→running-sum formulation.

    Scale: session_window compiles to Spark's special merging-session
    aggregate — ONE shuffle on user_id with in-sort window merging, no
    second window pass; at 100 TB this halves the sort work of the
    manual formulation.  Boundary semantics differ from the manual
    query by design: a gap of EXACTLY the gap duration starts a new
    session here (windows must strictly overlap to merge), so the
    oracle mirrors ``>=`` where the manual one uses ``>``.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "user_id",
            F.session_window("ts", f"{SESSION_GAP_MIN} minutes").alias("sw"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            exact_sum("value").alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


USER_SESSIONS_NATIVE_ORACLE = f"""
WITH flagged AS (
    SELECT user_id, ts, event_id, value,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                     >= {SESSION_GAP_MIN} * 60 * 1000000
                THEN 1 ELSE 0 END AS new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
numbered AS (
    SELECT user_id, ts, value,
           sum(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS session_idx
    FROM flagged
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL {SESSION_GAP_MIN} MINUTE AS session_end,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM numbered
GROUP BY user_id, session_idx
"""


def event_stats_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape (``unpivot``/melt — the inverse of
    ``user_activity_pivot``): per-type summary stats as (type, stat,
    value) tidy rows.

    Scale: unpivot is a zero-shuffle projection (each input row emits k
    output rows in place); the only exchange is the upstream aggregate.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    wide = ev.groupBy("event_type").agg(
        (F.sum(F.col("value").cast("decimal(18,2)")).cast("double") / F.count("value")).alias(
            "mean_value"
        ),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )
    return wide.unpivot(
        ids=["event_type"],
        values=["mean_value", "min_value", "max_value"],
        variableColumnName="stat",
        valueColumnName="stat_value",
    )


EVENT_STATS_LONG_ORACLE = """
WITH wide AS (
    SELECT event_type,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value) AS mean_value,
           min(value) AS min_value,
           max(value) AS max_value
    FROM events WHERE value IS NOT NULL GROUP BY event_type
)
SELECT event_type, 'mean_value' AS stat, mean_value AS stat_value FROM wide
UNION ALL
SELECT event_type, 'min_value', min_value FROM wide
UNION ALL
SELECT event_type, 'max_value', max_value FROM wide
"""


# GROUPING SETS finer than ROLLUP/CUBE (`revenue_rollup` /
# `event_type_daily_cube`): explicit lattice points, with grouping()
# disambiguating real NULLs from subtotal rows.  The SQL text runs
# VERBATIM on both engines — the oracle IS the query.  Scale: one
# aggregation whose Expand operator emits one row per grouping set —
# map-side partials still apply per set.
GROUPING_SETS_SQL = """
WITH base AS (
    SELECT r_name, year(o_orderdate) AS order_year,
           CAST(o_totalprice AS DECIMAL(12,2)) AS price
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
)
SELECT coalesce(r_name, 'ALL') AS region_name,
       coalesce(CAST(order_year AS STRING), 'ALL') AS order_year,
       grouping(r_name) AS g_region,
       grouping(order_year) AS g_year,
       CAST(sum(price) AS DOUBLE) AS revenue,
       count(*) AS n_orders
FROM base
GROUP BY GROUPING SETS ((r_name, order_year), (r_name), ())
"""


def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_pipelines_using_llm_spark.sources.tables import register_views

    register_views(spark, sf_dir, names=("orders", "customer", "nation", "region"))
    return spark.sql(GROUPING_SETS_SQL)


def revenue_gini_lorenz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration report: the Gini coefficient of per-customer
    order revenue plus the Lorenz decile table (share and cumulative
    share of revenue held by each customer decile) — the "do 10% of
    customers drive 60% of revenue" concentration question, and the
    same machinery that audits training-corpus domain concentration.

    Exactness: per-customer revenue is exact integer cents; the Gini
    reduces to Σ i·xᵢ over revenue-ascending ranks, computed in
    DECIMAL(38,0) (rank×cents ~1e16 sums past int64 at scale); every
    output double is one expression over exact integers, textually
    mirrored.  Ranks are deterministic: ties broken by customer key.

    Scale: the corpus collapses to one row per CUSTOMER first (map-side
    combinable) — the global rank window then sorts customers, not
    orders.  At 100 TB replace the single-partition row_number with the
    distributed prefix-sum rank of operators/ranking.py (the
    doc_token_budget machinery); the decile aggregation and 10-row
    Lorenz window are trivial either way.
    """
    o = load_table(spark, sf_dir, "orders")
    pc = o.groupBy("o_custkey").agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("long")
        .alias("cents")
    )
    w = Window.orderBy("cents", "o_custkey")
    ranked = pc.withColumn("i", F.row_number().over(w))
    tot = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("cents").cast("decimal(18,0)")).alias("sx"),
        F.sum(
            F.col("i").cast("decimal(18,0)")
            * F.col("cents").cast("decimal(18,0)")
        ).alias("six"),
    )
    gini = F.round(
        2.0
        * F.col("six").cast("double")
        / (F.col("n").cast("double") * F.col("sx").cast("double"))
        - (F.col("n").cast("double") + 1.0) / F.col("n").cast("double"),
        6,
    )
    dec10 = (
        ranked.crossJoin(F.broadcast(tot))
        .select(
            F.ceil(F.col("i") * 10 / F.col("n")).cast("int").alias("decile"),
            "cents",
            "n",
            "sx",
            "six",
        )
        .groupBy("decile", "n", "sx", "six")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("cents").cast("decimal(18,0)")).alias("dc"),
        )
    )
    w_cum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return dec10.select(
        "decile",
        "n_customers",
        F.round(
            F.col("dc").cast("double") / F.col("sx").cast("double"), 6
        ).alias("revenue_share"),
        F.round(
            F.sum(F.col("dc").cast("double")).over(w_cum)
            / F.col("sx").cast("double"),
            6,
        ).alias("cum_revenue_share"),
        gini.alias("gini"),
    )


REVENUE_GINI_LORENZ_ORACLE = """
WITH pc AS (
    SELECT o_custkey,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
               AS cents
    FROM orders GROUP BY 1
),
ranked AS (
    SELECT cents,
           row_number() OVER (ORDER BY cents, o_custkey) AS i
    FROM pc
),
tot AS (
    SELECT count(*) AS n,
           sum(CAST(cents AS DECIMAL(18,0))) AS sx,
           sum(CAST(i AS DECIMAL(18,0)) * CAST(cents AS DECIMAL(18,0)))
               AS six
    FROM ranked
),
dec10 AS (
    SELECT CAST(ceil(i * 10.0 / n) AS INT) AS decile,
           count(*) AS n_customers,
           sum(CAST(cents AS DECIMAL(18,0))) AS dc
    FROM ranked, tot
    GROUP BY 1
)
SELECT decile, n_customers,
       round(CAST(dc AS DOUBLE) / CAST(sx AS DOUBLE), 6) AS revenue_share,
       round(sum(CAST(dc AS DOUBLE)) OVER (ORDER BY decile
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             / CAST(sx AS DOUBLE), 6) AS cum_revenue_share,
       round(2.0 * CAST(six AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE))
             - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE), 6) AS gini
FROM dec10, tot
"""


QUERIES = {
    "user_sessions_native": QuerySpec(
        user_sessions_native,
        USER_SESSIONS_NATIVE_ORACLE,
        "built-in session_window merging aggregation",
    ),
    "event_stats_long": QuerySpec(
        event_stats_long, EVENT_STATS_LONG_ORACLE, "unpivot/melt wide stats to tidy rows"
    ),
    "grouping_sets_revenue": QuerySpec(
        grouping_sets_revenue, GROUPING_SETS_SQL, "explicit GROUPING SETS lattice, verbatim SQL"
    ),
    "cheapest_supplier_per_part": QuerySpec(
        cheapest_supplier_per_part,
        CHEAPEST_SUPPLIER_ORACLE,
        "Q2-flavor argmin per group",
    ),
    "nation_trade_matrix": QuerySpec(
        nation_trade_matrix,
        NATION_TRADE_MATRIX_ORACLE,
        "Q7-shape bilateral trade rollup",
    ),
    "signup_activation": QuerySpec(
        signup_activation,
        SIGNUP_ACTIVATION_ORACLE,
        "bucketed range join (interval predicate)",
    ),
    "shipping_priority": QuerySpec(
        shipping_priority, SHIPPING_PRIORITY_ORACLE, "Q3-shape fact-fact top-k"
    ),
    "local_supplier_volume": QuerySpec(
        local_supplier_volume,
        LOCAL_SUPPLIER_VOLUME_ORACLE,
        "Q5-shape 6-way join, co-nationality",
    ),
    "user_sessions_batch": QuerySpec(
        user_sessions_batch, USER_SESSIONS_ORACLE, "gap-based sessionization"
    ),
    "term_zipf_fit": QuerySpec(
        term_zipf_fit,
        _term_zipf_oracle(),
        "Zipf's-law OLS fit over top-200 term frequencies",
    ),
    "doc_top_terms": QuerySpec(
        doc_top_terms, _top_terms_oracle(), "distinctive terms (integer-exact TF/DF)"
    ),
    "approx_user_reach": QuerySpec(
        approx_user_reach,
        APPROX_USER_REACH_ORACLE,
        "HLL sketch reach vs exact, error-bound flag (cross-engine gate)",
    ),
    "value_histogram_rollup": QuerySpec(
        value_histogram_rollup,
        VALUE_HISTOGRAM_ROLLUP_ORACLE,
        "mergeable 32-bucket histogram rollup: median from cells + bound flag",
    ),
    "reach_sketch_rollup": QuerySpec(
        reach_sketch_rollup,
        REACH_SKETCH_ROLLUP_ORACLE,
        "daily HLL sketches union-merged to monthly reach (mergeable-sketch rollup)",
    ),
    "events_zorder_index": QuerySpec(
        events_zorder_index,
        _zorder_oracle(),
        "Morton z-order clustering key (bucketize + bit interleave)",
    ),
    "user_activity_pivot": QuerySpec(
        user_activity_pivot,
        USER_ACTIVITY_PIVOT_ORACLE,
        "single-pass conditional-agg pivot",
    ),
    "churned_purchasers": QuerySpec(
        churned_purchasers, CHURNED_PURCHASERS_ORACLE, "set difference (EXCEPT)"
    ),
    "event_type_daily_cube": QuerySpec(
        event_type_daily_cube, EVENT_TYPE_DAILY_CUBE_ORACLE, "CUBE grouping sets"
    ),
    "value_distribution_ranks": QuerySpec(
        value_distribution_ranks,
        VALUE_DISTRIBUTION_RANKS_ORACLE,
        "ntile / percent_rank / cume_dist",
    ),
    "sampled_type_profile": QuerySpec(
        sampled_type_profile,
        SAMPLED_TYPE_PROFILE_ORACLE,
        "deterministic systematic sample",
    ),
    "value_outliers": QuerySpec(
        value_outliers, VALUE_OUTLIERS_ORACLE, "z-score outlier detection"
    ),
    "revenue_gini_lorenz": QuerySpec(
        revenue_gini_lorenz,
        REVENUE_GINI_LORENZ_ORACLE,
        "Gini coefficient + Lorenz decile table of customer revenue",
    ),
}
