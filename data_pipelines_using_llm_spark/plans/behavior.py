"""Behavior-analytics pack: funnel progression, cohort retention,
event-sequence transitions, and anomaly flagging over the ``events``
stream table — the product-analytics layer a pipeline platform serves
after the reference's per-day/per-hour count reports (A5/A7,
``Second Experiment/GPT 5.py:141-152``).

Cross-engine exactness: stage/retention/transition counts are integers;
every derived rate is one double expression over exact integer sums,
rounded to 6 decimals with the formula textually mirrored in the DuckDB
oracle (anomaly z-scores additionally guard ``var > 0`` identically on
both sides so neither engine divides by zero).

Scale notes per query are in the docstrings; the common theme is that
each query is one user-partitioned window pass and/or one grouped
aggregation — no self-joins, no driver loops, and the chained funnel
windows share a single (user_id) exchange+sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipelines_using_llm_spark.functions.exact import dec, exact_sum
from data_pipelines_using_llm_spark.operators.caching import barrier
from data_pipelines_using_llm_spark.plans.relational import (
    HOURLY_TREND_DENSE_ORACLE,
    hourly_trend_dense,
)
from data_pipelines_using_llm_spark.registry import QuerySpec
from data_pipelines_using_llm_spark.sources.tables import load_table

FUNNEL_STEPS = ("view", "click", "purchase")
ANOMALY_Z = 2.5


def _funnel_stamps(ev: DataFrame) -> DataFrame:
    """Per-event rows stamped with the user's funnel milestones: t1 =
    first view, t2 = first click AFTER t1, t3 = first purchase AFTER t2 —
    three chained conditional-min windows over the SAME (user_id)
    partitioning, so the whole stamping costs one exchange + one sort."""
    w = Window.partitionBy("user_id")
    d = ev.withColumn(
        "t1", F.min(F.when(F.col("event_type") == FUNNEL_STEPS[0], F.col("ts"))).over(w)
    )
    d = d.withColumn(
        "t2",
        F.min(
            F.when(
                (F.col("event_type") == FUNNEL_STEPS[1]) & (F.col("ts") > F.col("t1")),
                F.col("ts"),
            )
        ).over(w),
    )
    d = d.withColumn(
        "t3",
        F.min(
            F.when(
                (F.col("event_type") == FUNNEL_STEPS[2]) & (F.col("ts") > F.col("t2")),
                F.col("ts"),
            )
        ).over(w),
    )
    return d


def purchase_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users who viewed, then clicked AFTER the first
    view, then purchased AFTER that click — strict temporal ordering,
    not mere event co-occurrence (the distinction that makes it a funnel
    rather than three filters).

    Scale: the milestone stamping (``_funnel_stamps``) is one
    exchange+sort shared by all three Window nodes (plan-gated); the
    final stage is a single global aggregate of per-user booleans.
    No joins, no per-stage passes over the fact.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    d = _funnel_stamps(ev)
    n1 = F.count_distinct(F.when(F.col("t1").isNotNull(), F.col("user_id")))
    n2 = F.count_distinct(F.when(F.col("t2").isNotNull(), F.col("user_id")))
    n3 = F.count_distinct(F.when(F.col("t3").isNotNull(), F.col("user_id")))
    return d.agg(
        n1.alias("n_viewed"),
        n2.alias("n_clicked_after_view"),
        n3.alias("n_purchased_after_click"),
        F.round(n2.cast("double") / n1.cast("double"), 6).alias("view_to_click_rate"),
        F.round(n3.cast("double") / n2.cast("double"), 6).alias("click_to_purchase_rate"),
    )


PURCHASE_FUNNEL_ORACLE = f"""
WITH w1 AS (
    SELECT user_id, event_type, ts,
           min(CASE WHEN event_type = '{FUNNEL_STEPS[0]}' THEN ts END)
               OVER (PARTITION BY user_id) AS t1
    FROM events
),
w2 AS (
    SELECT *, min(CASE WHEN event_type = '{FUNNEL_STEPS[1]}' AND ts > t1 THEN ts END)
                  OVER (PARTITION BY user_id) AS t2
    FROM w1
),
w3 AS (
    SELECT *, min(CASE WHEN event_type = '{FUNNEL_STEPS[2]}' AND ts > t2 THEN ts END)
                  OVER (PARTITION BY user_id) AS t3
    FROM w2
)
SELECT count(DISTINCT CASE WHEN t1 IS NOT NULL THEN user_id END) AS n_viewed,
       count(DISTINCT CASE WHEN t2 IS NOT NULL THEN user_id END) AS n_clicked_after_view,
       count(DISTINCT CASE WHEN t3 IS NOT NULL THEN user_id END) AS n_purchased_after_click,
       round(CAST(count(DISTINCT CASE WHEN t2 IS NOT NULL THEN user_id END) AS DOUBLE)
             / CAST(count(DISTINCT CASE WHEN t1 IS NOT NULL THEN user_id END) AS DOUBLE), 6)
           AS view_to_click_rate,
       round(CAST(count(DISTINCT CASE WHEN t3 IS NOT NULL THEN user_id END) AS DOUBLE)
             / CAST(count(DISTINCT CASE WHEN t2 IS NOT NULL THEN user_id END) AS DOUBLE), 6)
           AS click_to_purchase_rate
FROM w3
"""


def cohort_retention_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity day,
    counted as active per day-offset since that first day — the
    engagement-decay report (day-grain because the synthetic corpus
    spans one month; the week-grain variant is the same plan).

    Scale: one (user_id) window to stamp each event with its user's
    first day (single exchange), then one grouped count-distinct on
    (cohort_day, day_no).  Day offset is exact integer epoch math, and
    cohort_day stays a TIMESTAMP (not DATE) for cross-engine stringify
    parity.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    w = Window.partitionBy("user_id")
    cohort = F.date_trunc("day", F.min("ts").over(w))
    day = F.date_trunc("day", F.col("ts"))
    d = ev.select(
        "user_id",
        cohort.alias("cohort_day"),
        ((F.unix_timestamp(day) - F.unix_timestamp(cohort)) / 86400)
        .cast("long")
        .alias("day_no"),
    )
    return d.groupBy("cohort_day", "day_no").agg(
        F.count_distinct("user_id").alias("active_users")
    )


COHORT_RETENTION_DAILY_ORACLE = """
WITH stamped AS (
    SELECT user_id,
           date_trunc('day', min(ts) OVER (PARTITION BY user_id)) AS cohort_day,
           date_trunc('day', ts) AS day
    FROM events
)
SELECT cohort_day,
       CAST((epoch(day) - epoch(cohort_day)) / 86400 AS BIGINT) AS day_no,
       count(DISTINCT user_id) AS active_users
FROM stamped
GROUP BY 1, 2
"""


def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order transition matrix: for each (from_type, to_type)
    pair of consecutive events within a user's timeline, the count and
    the row-normalized transition rate — the Markov-chain view of user
    behavior (next-action prediction baseline, bot-loop detection).

    Scale: one ``lead`` window over (user_id, ts, event_id) — the same
    single exchange+sort as any per-user sequence op — then a grouped
    count.  The rate denominator reuses the grouped counts via a
    (from_type) window over the |types|² aggregate, which is
    broadcast-sized; no second pass over the fact.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    counts = d.groupBy("from_type", "to_type").agg(F.count(F.lit(1)).alias("n_transitions"))
    wf = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n_transitions",
        F.round(
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(wf).cast("double"),
            6,
        ).alias("transition_rate"),
    )


def event_transition_2step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-step transition probabilities — the Markov-chain square
    ``P²(i,k) = Σⱼ P(i,j)·P(j,k)`` over the first-order matrix of
    :func:`event_transition_matrix`: where a user lands two actions from
    now, the lookahead a next-next-action recommender or bot-loop
    detector reads directly.

    The matrix multiply is declared relationally: self-join the rate
    matrix on the middle state (|types|² rows — broadcast-sized however
    large the corpus; the FACT table is touched exactly once by the
    first-order count).  Determinism: each P²(i,k) sums ≤ |types| double
    products, folded in sorted middle-state order on both engines; the
    rates themselves are unrounded exact divisions of identical integer
    counts, so the result is bit-identical cross-engine with no
    rounding.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    counts = d.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    wf = Window.partitionBy("from_type")
    rates = counts.select(
        "from_type",
        "to_type",
        (F.col("n").cast("double") / F.sum("n").over(wf).cast("double")).alias(
            "p"
        ),
    )
    a = rates.select(
        F.col("from_type").alias("from_type"),
        F.col("to_type").alias("mid_type"),
        F.col("p").alias("p1"),
    )
    b = rates.select(
        F.col("from_type").alias("mid_type"),
        F.col("to_type").alias("to_type"),
        F.col("p").alias("p2"),
    )
    return (
        a.join(b, "mid_type")
        .groupBy("from_type", "to_type")
        .agg(
            F.aggregate(
                F.array_sort(
                    F.collect_list(
                        F.struct("mid_type", (F.col("p1") * F.col("p2")).alias("prod"))
                    )
                ),
                F.lit(0.0),
                lambda acc, s: acc + s["prod"],
            ).alias("p_2step"),
            F.count(F.lit(1)).alias("n_paths"),
        )
    )


EVENT_TRANSITION_2STEP_ORACLE = """
WITH seq AS (
    SELECT event_type AS from_type,
           lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS to_type
    FROM events
),
counts AS (
    SELECT from_type, to_type, count(*) AS n
    FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2
),
rates AS (
    SELECT from_type, to_type,
           CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY from_type)
                                    AS DOUBLE) AS p
    FROM counts
)
SELECT a.from_type, b.to_type,
       list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE),
                        array_agg(a.p * b.p ORDER BY a.to_type)),
           (acc, x) -> acc + x) AS p_2step,
       count(*) AS n_paths
FROM rates a JOIN rates b ON b.from_type = a.to_type
GROUP BY 1, 2
"""


EVENT_TRANSITION_MATRIX_ORACLE = """
WITH seq AS (
    SELECT event_type AS from_type,
           lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
    FROM events
),
counts AS (
    SELECT from_type, to_type, count(*) AS n_transitions
    FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2
)
SELECT from_type, to_type, n_transitions,
       round(CAST(n_transitions AS DOUBLE)
             / CAST(sum(n_transitions) OVER (PARTITION BY from_type) AS DOUBLE), 6)
           AS transition_rate
FROM counts
"""


def hourly_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anomalous hours: z-score of each hour's event count against its
    type's mean/std over the COMPLETE hour spine (composes
    ``hourly_trend_dense`` — without densification, quiet hours are
    invisible and the variance is biased high).

    Scale: the dense series is |hours|×|types| rows — tiny next to the
    fact — so the per-type moment aggregate and the z-score join are
    post-aggregation work.  Moments come from exact integer power sums
    (Σc, Σc²) cast to double once, with the z expression and the
    ``var > 0`` guard textually mirrored in the oracle; the flag filter
    compares the ROUNDED z so boundary rows agree bit-for-bit.
    """
    # barrier: dense fans out to BOTH the stats aggregate and the z-score
    # join — without it Catalyst inlines the whole spine+counts subplan
    # twice, and the fact-table aggregation runs twice per query
    dense = barrier(hourly_trend_dense(spark, sf_dir))
    stats = dense.groupBy(F.col("event_type").alias("t")).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("n_events").cast("double").alias("s"),
        F.sum(F.col("n_events") * F.col("n_events")).cast("double").alias("s2"),
    )
    j = dense.join(F.broadcast(stats), dense.event_type == stats.t)
    mean = F.col("s") / F.col("n")
    var = F.col("s2") / F.col("n") - mean * mean
    z = F.round((F.col("n_events").cast("double") - mean) / F.sqrt(var), 6)
    return (
        j.filter(var > F.lit(0.0))
        .select("hour", "event_type", "n_events", z.alias("z_score"))
        .filter(F.abs(F.col("z_score")) >= F.lit(ANOMALY_Z))
    )


HOURLY_ANOMALIES_ORACLE = f"""
WITH dense AS ({{dense}}),
stats AS (
    SELECT event_type AS t,
           CAST(count(*) AS DOUBLE) AS n,
           CAST(sum(n_events) AS DOUBLE) AS s,
           CAST(sum(n_events * n_events) AS DOUBLE) AS s2
    FROM dense GROUP BY 1
),
scored AS (
    SELECT hour, event_type, n_events,
           round((CAST(n_events AS DOUBLE) - s / n)
                 / sqrt(s2 / n - (s / n) * (s / n)), 6) AS z_score
    FROM dense JOIN stats ON event_type = t
    WHERE s2 / n - (s / n) * (s / n) > 0.0
)
SELECT * FROM scored WHERE abs(z_score) >= {ANOMALY_Z}
"""


def conversion_latency_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hours-to-convert distribution: for users who completed the full
    ordered funnel, the first-view → first-qualifying-purchase latency,
    bucketed by hour — the "how long does conversion take" report that
    sizes attribution windows.

    Scale: reuses the single-exchange funnel stamping, collapses to one
    row per converted user (the t1/t3 stamps are constant within a
    user), then a grouped count over hour buckets computed with exact
    integer epoch math.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    d = _funnel_stamps(ev).filter(F.col("t3").isNotNull())
    per_user = d.groupBy("user_id").agg(F.min("t1").alias("t1"), F.min("t3").alias("t3"))
    # floor() stated explicitly on BOTH sides: Spark's long cast truncates
    # where DuckDB's rounds, and epoch() keeps fractional seconds where
    # unix_timestamp() drops them — both divergences bite here because the
    # hour ratio is fractional (unlike the exact-integer day offsets of
    # cohort_retention_daily)
    secs = F.unix_timestamp("t3") - F.unix_timestamp("t1")
    bucket = F.floor(secs / 3600).cast("long")
    return (
        per_user.select(bucket.alias("hours_to_convert"))
        .groupBy("hours_to_convert")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


CONVERSION_LATENCY_HIST_ORACLE = f"""
WITH w1 AS (
    SELECT user_id, event_type, ts,
           min(CASE WHEN event_type = '{FUNNEL_STEPS[0]}' THEN ts END)
               OVER (PARTITION BY user_id) AS t1
    FROM events
),
w2 AS (
    SELECT *, min(CASE WHEN event_type = '{FUNNEL_STEPS[1]}' AND ts > t1 THEN ts END)
                  OVER (PARTITION BY user_id) AS t2
    FROM w1
),
w3 AS (
    SELECT *, min(CASE WHEN event_type = '{FUNNEL_STEPS[2]}' AND ts > t2 THEN ts END)
                  OVER (PARTITION BY user_id) AS t3
    FROM w2
),
per_user AS (
    SELECT user_id, min(t1) AS t1, min(t3) AS t3
    FROM w3 WHERE t3 IS NOT NULL GROUP BY 1
)
SELECT CAST(floor((CAST(floor(epoch(t3)) AS BIGINT) - CAST(floor(epoch(t1)) AS BIGINT)) / 3600)
            AS BIGINT) AS hours_to_convert,
       count(*) AS n_users
FROM per_user
GROUP BY 1
"""


def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation over the orders fact: per-customer Recency
    (days since last order, against the corpus max date), Frequency
    (order count), Monetary (decimal-exact spend) quartiled with
    ``ntile(4)``, reported as counts + average spend per (r,f,m) cell.

    Determinism: ntile's equal-split assignment depends only on row
    ORDER, so every ordering carries a ``c_custkey`` tiebreak; spend
    ordering uses the DECIMAL value (exact), and the cell average is
    derived from the decimal sum.  Both engines implement ntile
    identically (equal buckets, remainder to the leaders).

    Scale: one grouped aggregation over orders, then three EXACT
    distributed rankings over the |customers| aggregate via
    ``operators.ranking`` (range-repartition + partition-offset ranks)
    instead of three unpartitioned ``ntile`` windows — same
    bit-identical quartiles (the oracle below is still plain ntile),
    but no single-task global sort anywhere in the plan, so the
    segmentation survives a customer table 1000x this size.  The as-of
    date is a one-row broadcast.
    """
    from data_pipelines_using_llm_spark.operators.ranking import (
        ntile_from_rank,
        with_exact_rank,
    )

    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(dec("o_totalprice")).alias("spend_dec"),
    )
    asof = orders.agg(F.max("o_orderdate").alias("asof_ts"))
    d = per_cust.join(F.broadcast(asof))
    recency = (
        (F.unix_timestamp("asof_ts") - F.unix_timestamp("last_order")) / 86400
    ).cast("long")
    d = d.select(
        "o_custkey", "frequency", "spend_dec", recency.alias("recency_days")
    )
    d = with_exact_rank(
        d,
        [F.col("recency_days").asc(), F.col("o_custkey").asc()],
        rank_col="r_rank",
        group_n_col="n_cust",
    )
    d = with_exact_rank(
        d,
        [F.col("frequency").desc(), F.col("o_custkey").asc()],
        rank_col="f_rank",
    )
    d = with_exact_rank(
        d,
        [F.col("spend_dec").desc(), F.col("o_custkey").asc()],
        rank_col="m_rank",
    )
    n = F.col("n_cust")
    scored = d.select(
        "spend_dec",
        ntile_from_rank(F.col("r_rank"), n, 4).alias("r_score"),
        ntile_from_rank(F.col("f_rank"), n, 4).alias("f_score"),
        ntile_from_rank(F.col("m_rank"), n, 4).alias("m_score"),
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).alias("n_customers"),
        # round at 6, not 2: a cents-sum / count average CAN land exactly
        # on a half-cent (Spark rounds the shortest decimal repr, DuckDB
        # the binary value — they disagree there), but cannot land on a
        # 1e-6 half-boundary
        F.round(
            F.sum("spend_dec").cast("double") / F.count(F.lit(1)), 6
        ).alias("avg_spend"),
    )


CUSTOMER_RFM_SEGMENTS_ORACLE = """
WITH per_cust AS (
    SELECT o_custkey,
           max(o_orderdate) AS last_order,
           count(*) AS frequency,
           sum(CAST(o_totalprice AS DECIMAL(18,2))) AS spend_dec
    FROM orders GROUP BY 1
),
mx AS (SELECT max(o_orderdate) AS asof_ts FROM orders),
d AS (
    SELECT o_custkey, frequency, spend_dec,
           CAST((epoch(asof_ts) - epoch(last_order)) / 86400 AS BIGINT) AS recency_days
    FROM per_cust CROSS JOIN mx
),
scored AS (
    SELECT spend_dec,
           ntile(4) OVER (ORDER BY recency_days, o_custkey) AS r_score,
           ntile(4) OVER (ORDER BY frequency DESC, o_custkey) AS f_score,
           ntile(4) OVER (ORDER BY spend_dec DESC, o_custkey) AS m_score
    FROM d
)
SELECT r_score, f_score, m_score,
       count(*) AS n_customers,
       round(CAST(sum(spend_dec) AS DOUBLE) / count(*), 6) AS avg_spend
FROM scored
GROUP BY 1, 2, 3
"""


def hourly_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC downsampling: per (hour, event_type) bars — open/close =
    value of the first/last event (deterministic ``(ts, event_id)``
    tiebreak), high/low = extrema, plus count and a decimal-exact mean —
    the metric-downsampling operator that turns a raw event stream into
    chartable bars.

    Scale: two row_number windows sharing ONE (hour, type) exchange
    (opposite sort orders; the second sort is partition-local), then the
    grouped aggregate rides the same clustering — no join, no second
    pass.  Extrema/firsts are exact; only the mean divides, rounded at 6
    on both engines.
    """
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            "event_type",
            "ts",
            "event_id",
            "value",
        )
    )
    w_a = Window.partitionBy("hour", "event_type").orderBy("ts", "event_id")
    w_d = Window.partitionBy("hour", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    r = ev.select(
        "hour",
        "event_type",
        "value",
        F.row_number().over(w_a).alias("rn_a"),
        F.row_number().over(w_d).alias("rn_d"),
    )
    return r.groupBy("hour", "event_type").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
        F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(
            F.sum(dec("value")).cast("double") / F.count(F.lit(1)), 6
        ).alias("mean_value"),
    )


HOURLY_OHLC_BARS_ORACLE = """
WITH r AS (
    SELECT date_trunc('hour', ts) AS hour, event_type, value,
           row_number() OVER (PARTITION BY date_trunc('hour', ts), event_type
                              ORDER BY ts, event_id) AS rn_a,
           row_number() OVER (PARTITION BY date_trunc('hour', ts), event_type
                              ORDER BY ts DESC, event_id DESC) AS rn_d
    FROM events WHERE value IS NOT NULL
)
SELECT hour, event_type,
       max(CASE WHEN rn_a = 1 THEN value END) AS open,
       max(CASE WHEN rn_d = 1 THEN value END) AS close,
       max(value) AS high,
       min(value) AS low,
       count(*) AS n_events,
       round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6)
           AS mean_value
FROM r
GROUP BY 1, 2
"""


PEAK_BACK_MIN = 30
PEAK_FWD_MIN = 90


def peak_window_traffic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join archetype: per (event_type, day) the peak
    event (max value, event_id tiebreak) defines a variable-length
    attention window ``[peak_ts - 30min, peak_ts + 90min)``; every event
    of that type falling inside the window is attributed to it — the
    "what happened around the spike" report.

    Spark has no range-join operator, so this uses BIN-AND-FILTER, the
    scalable formulation: windows explode to the hour buckets they
    cover (a 2h window touches <= 3 buckets — fanout is bounded by
    ``len/bucket + 1``, independent of data volume), events compute
    their bucket for free, and the join becomes a plain EQUI-join on
    (event_type, hour_bucket) followed by the residual ``ts ∈ [start,
    end)`` predicate.  No inequality-only join condition ever reaches
    the optimizer, so no BroadcastNestedLoop/cartesian fallback
    (plan-gated); the window table is days x types — broadcast-sized
    here, and still shuffle-joinable at any scale since the bucket key
    is equi.  The oracle states the inequality join directly.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    w = Window.partitionBy("event_type", F.date_trunc("day", "ts")).orderBy(
        F.col("value").desc(), F.col("event_id").asc()
    )
    peaks = (
        ev.select(
            "event_type",
            "ts",
            "value",
            "event_id",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("ts").alias("peak_ts"),
            (F.col("ts") - F.expr(f"INTERVAL {PEAK_BACK_MIN} MINUTES")).alias(
                "w_start"
            ),
            (F.col("ts") + F.expr(f"INTERVAL {PEAK_FWD_MIN} MINUTES")).alias(
                "w_end"
            ),
        )
    )
    buckets = peaks.select(
        "event_type",
        "peak_ts",
        "w_start",
        "w_end",
        F.explode(
            F.sequence(
                F.date_trunc("hour", "w_start"),
                F.date_trunc("hour", "w_end"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("hb"),
    )
    tagged = ev.withColumn("hb", F.date_trunc("hour", "ts"))
    joined = tagged.join(F.broadcast(buckets), ["event_type", "hb"]).filter(
        (F.col("ts") >= F.col("w_start")) & (F.col("ts") < F.col("w_end"))
    )
    return joined.groupBy("event_type", "peak_ts").agg(
        F.count(F.lit(1)).alias("n_events"),
        exact_sum("value").alias("window_value"),
    )


PEAK_WINDOW_TRAFFIC_ORACLE = f"""
WITH ranked AS (
    SELECT event_type, ts, value,
           row_number() OVER (
               PARTITION BY event_type, date_trunc('day', ts)
               ORDER BY value DESC, event_id
           ) AS rn
    FROM events
    WHERE ts IS NOT NULL AND value IS NOT NULL
),
peaks AS (
    SELECT event_type,
           ts AS peak_ts,
           ts - INTERVAL {PEAK_BACK_MIN} MINUTE AS w_start,
           ts + INTERVAL {PEAK_FWD_MIN} MINUTE AS w_end
    FROM ranked WHERE rn = 1
)
SELECT e.event_type,
       p.peak_ts,
       count(*) AS n_events,
       CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS window_value
FROM events e
JOIN peaks p
  ON p.event_type = e.event_type
 AND e.ts >= p.w_start AND e.ts < p.w_end
WHERE e.ts IS NOT NULL AND e.value IS NOT NULL
GROUP BY e.event_type, p.peak_ts
"""


def audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise audience overlap between event types: for every type
    pair, the EXACT distinct-user intersection, union, and Jaccard —
    the report behind "do clickers also purchase?" segmentation and
    campaign-reach planning (the exact version of what Theta sketches
    estimate).

    Scale: the corpus collapses to distinct (type, user) once — the
    only corpus-sized shuffle.  The pair intersection is a self-join
    keyed on ``user_id`` whose per-user fanout is bounded by the TYPE
    count a user can have (≤ |types|, here ≤ C(6,2) = 15 pairs/user) —
    no quadratic blowup is possible; per-type audience sizes join back
    as a |types|-row broadcast.  Output is |types|² rows regardless of
    corpus size.
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    )
    ut = e.select("event_type", "user_id").distinct()
    sizes = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a = ut.select(F.col("event_type").alias("type_a"), "user_id")
    b = ut.select(F.col("event_type").alias("type_b"), "user_id")
    both = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    sa = sizes.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    return (
        both.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            "n_both",
            (F.col("n_a") + F.col("n_b") - F.col("n_both")).alias("n_union"),
            F.round(
                F.col("n_both").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_both")).cast(
                    "double"
                ),
                6,
            ).alias("jaccard"),
        )
    )


AUDIENCE_OVERLAP_ORACLE = """
WITH ut AS (
    SELECT DISTINCT event_type, user_id FROM events
    WHERE user_id IS NOT NULL AND event_type IS NOT NULL
),
sizes AS (SELECT event_type, count(*) AS n FROM ut GROUP BY 1),
both_t AS (
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           count(*) AS n_both
    FROM ut a JOIN ut b ON a.user_id = b.user_id
    WHERE a.event_type < b.event_type
    GROUP BY 1, 2
)
SELECT type_a, type_b, sa.n AS n_a, sb.n AS n_b, n_both,
       sa.n + sb.n - n_both AS n_union,
       round(CAST(n_both AS DOUBLE)
             / CAST(sa.n + sb.n - n_both AS DOUBLE), 6) AS jaccard
FROM both_t
JOIN sizes sa ON sa.event_type = type_a
JOIN sizes sb ON sb.event_type = type_b
"""


CONCURRENCY_WINDOW_MIN = 5  # an event is "active" for 5 minute-buckets


def event_concurrency_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak 5-minute event concurrency per day: each event is active for
    ``CONCURRENCY_WINDOW_MIN`` minute-buckets starting at its own
    minute; the report is each day's busiest minute (count of active
    events, earliest minute on ties) — the capacity-planning sweep-line
    ("how hot does the hottest minute get") without pairwise interval
    logic.

    Scale: attribution is a map-side ``explode`` of exactly 5
    calendar-minute rows per event that partial-aggregates into the
    minute histogram before the exchange (the shuffle carries
    |distinct minutes| × partitions rows, calendar-bounded); the daily
    peak is a second tiny aggregation via ``max(struct(...))`` argmax —
    no window over raw events, no self-join, no interval join.  The
    minute histogram is itself mergeable, so the same plan rolls up
    incrementally (sinks/rollup.py discipline).
    """
    e = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    cov = e.select(
        F.explode(
            F.sequence(
                F.date_trunc("minute", F.col("ts")),
                F.date_trunc("minute", F.col("ts"))
                + F.expr(f"INTERVAL {CONCURRENCY_WINDOW_MIN - 1} MINUTES"),
                F.expr("INTERVAL 1 MINUTE"),
            )
        ).alias("minute")
    )
    mc = cov.groupBy("minute").agg(F.count(F.lit(1)).alias("c"))
    peak = (
        mc.groupBy(F.date_trunc("day", F.col("minute")).alias("day"))
        .agg(
            F.max(
                F.struct(
                    F.col("c").alias("c"),
                    (-F.unix_timestamp("minute")).alias("neg_ts"),
                )
            ).alias("p")
        )
        .select(
            "day",
            F.col("p.c").alias("peak_5min_events"),
            F.timestamp_seconds(-F.col("p.neg_ts")).alias("peak_minute"),
        )
    )
    return peak


EVENT_CONCURRENCY_PEAK_ORACLE = f"""
WITH cov AS (
    SELECT unnest(generate_series(
               date_trunc('minute', ts),
               date_trunc('minute', ts)
                   + INTERVAL '{CONCURRENCY_WINDOW_MIN - 1} minutes',
               INTERVAL '1 minute')) AS minute
    FROM events WHERE ts IS NOT NULL
),
mc AS (SELECT minute, count(*) AS c FROM cov GROUP BY 1),
d AS (SELECT date_trunc('day', minute) AS day, max(c) AS pc
      FROM mc GROUP BY 1)
SELECT d.day, d.pc AS peak_5min_events, min(mc.minute) AS peak_minute
FROM d JOIN mc ON date_trunc('day', mc.minute) = d.day AND mc.c = d.pc
GROUP BY d.day, d.pc
"""


def user_entropy_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavioral diversity and burstiness: Shannon entropy of
    the user's event-type mix (bots repeat one action → entropy ≈ 0;
    humans mix → higher) and the Fano factor of their daily event
    counts (variance/mean; Poisson-regular ≈ 1, bursty ≫ 1) — the two
    classic per-actor features of bot/abuse detection.

    Exactness: entropy uses the identity H = ln(n) − (Σ nₜ·ln nₜ)/n so
    every ln argument is an exact INTEGER (never a ratio that divides
    differently per engine); the per-user Σ nₜ·ln nₜ is accumulated as
    QUANTIZED int64 (``floor(x·2^30)`` — the PageRank-fold discipline,
    operators/graph.py) so the double sum is order-free and map-side
    combinable, never last-ulp order noise.  The Fano factor comes from
    exact integer power sums of daily counts (Σc, Σc²).  Both are one
    double expression over exact integers, rounded and textually
    mirrored (2^-30 quantization is metric error ~1e-9, not
    cross-engine disagreement).

    Scale: two grouped aggregations, each map-side combinable — (user,
    type) counts roll up to users, (user, day) counts roll up to users
    — then one equi-join keyed on user (both sides already user-
    partitioned; no broadcast needed, no skew beyond per-user activity
    which the groupBys already bounded).  Output is |users| rows.
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    )
    tc = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("nt")
    )
    ent_scale = float(1 << 30)
    ent = tc.groupBy("user_id").agg(
        F.sum("nt").alias("n_events"),
        F.count(F.lit(1)).alias("n_types"),
        (
            F.sum(
                F.floor(
                    F.col("nt").cast("double")
                    * F.log(F.col("nt").cast("double"))
                    * F.lit(ent_scale)
                ).cast("long")
            ).cast("double")
            / F.lit(ent_scale)
        ).alias("snln"),
    )
    dc = (
        e.groupBy("user_id", F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum("c").alias("sc"),
            F.sum(F.col("c") * F.col("c")).alias("sc2"),
        )
    )
    n = F.col("n_events").cast("double")
    nd = F.col("n_days").cast("double")
    mean_c = F.col("sc").cast("double") / nd
    var_c = F.col("sc2").cast("double") / nd - mean_c * mean_c
    return ent.join(dc, "user_id").select(
        "user_id",
        "n_events",
        "n_types",
        "n_days",
        F.round(F.log(n) - F.col("snln") / n, 6).alias("type_entropy"),
        F.round(var_c / mean_c, 6).alias("fano_factor"),
    )


USER_ENTROPY_PROFILE_ORACLE = """
WITH tc AS (
    SELECT user_id, event_type, count(*) AS nt FROM events
    WHERE user_id IS NOT NULL AND event_type IS NOT NULL
    GROUP BY 1, 2
),
ent AS (
    SELECT user_id, CAST(sum(nt) AS BIGINT) AS n_events,
           count(*) AS n_types,
           CAST(sum(CAST(floor(CAST(nt AS DOUBLE) * ln(CAST(nt AS DOUBLE))
                               * 1073741824e0) AS BIGINT)) AS DOUBLE)
               / 1073741824e0 AS snln
    FROM tc GROUP BY 1
),
dc AS (
    SELECT user_id, count(*) AS n_days,
           CAST(sum(c) AS BIGINT) AS sc,
           CAST(sum(c * c) AS BIGINT) AS sc2
    FROM (
        SELECT user_id, CAST(ts AS DATE) AS d, count(*) AS c FROM events
        WHERE user_id IS NOT NULL AND event_type IS NOT NULL
        GROUP BY 1, 2
    ) GROUP BY 1
)
SELECT ent.user_id, n_events, n_types, n_days,
       round(ln(CAST(n_events AS DOUBLE))
             - snln / CAST(n_events AS DOUBLE), 6) AS type_entropy,
       round((CAST(sc2 AS DOUBLE) / CAST(n_days AS DOUBLE)
              - (CAST(sc AS DOUBLE) / CAST(n_days AS DOUBLE))
                * (CAST(sc AS DOUBLE) / CAST(n_days AS DOUBLE)))
             / (CAST(sc AS DOUBLE) / CAST(n_days AS DOUBLE)), 6)
           AS fano_factor
FROM ent JOIN dc ON dc.user_id = ent.user_id
"""


QUERIES = {
    "purchase_funnel": QuerySpec(
        purchase_funnel, PURCHASE_FUNNEL_ORACLE, "ordered view->click->purchase funnel"
    ),
    "cohort_retention_daily": QuerySpec(
        cohort_retention_daily,
        COHORT_RETENTION_DAILY_ORACLE,
        "first-activity-day cohort retention matrix",
    ),
    "event_transition_matrix": QuerySpec(
        event_transition_matrix,
        EVENT_TRANSITION_MATRIX_ORACLE,
        "first-order event-type transition matrix",
    ),
    "event_transition_2step": QuerySpec(
        event_transition_2step,
        EVENT_TRANSITION_2STEP_ORACLE,
        "Markov-chain square: two-step transition probabilities",
    ),
    "hourly_anomalies": QuerySpec(
        hourly_anomalies,
        HOURLY_ANOMALIES_ORACLE.format(dense=HOURLY_TREND_DENSE_ORACLE),
        "z-score anomaly flags on dense hourly series",
    ),
    "conversion_latency_hist": QuerySpec(
        conversion_latency_hist,
        CONVERSION_LATENCY_HIST_ORACLE,
        "hours-to-convert funnel latency histogram",
    ),
    "customer_rfm_segments": QuerySpec(
        customer_rfm_segments,
        CUSTOMER_RFM_SEGMENTS_ORACLE,
        "RFM quartile segmentation with deterministic ntile",
    ),
    "hourly_ohlc_bars": QuerySpec(
        hourly_ohlc_bars,
        HOURLY_OHLC_BARS_ORACLE,
        "OHLC bar downsampling per hour x type",
    ),
    "peak_window_traffic": QuerySpec(
        peak_window_traffic,
        PEAK_WINDOW_TRAFFIC_ORACLE,
        "bin-and-filter range join: events inside per-day peak windows",
    ),
    "audience_overlap": QuerySpec(
        audience_overlap,
        AUDIENCE_OVERLAP_ORACLE,
        "exact pairwise distinct-user overlap + Jaccard between types",
    ),
    "event_concurrency_peak": QuerySpec(
        event_concurrency_peak,
        EVENT_CONCURRENCY_PEAK_ORACLE,
        "per-day peak 5-minute concurrency via minute-bucket sweep-line",
    ),
    "user_entropy_profile": QuerySpec(
        user_entropy_profile,
        USER_ENTROPY_PROFILE_ORACLE,
        "per-user type entropy + daily Fano factor (bot-detection pair)",
    ),
}
