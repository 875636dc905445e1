"""Statistical analysis pack: correlation, trend regression, and higher
moments over the ``events`` stream table — the "is this metric drifting /
seasonal / skewed" questions a data-quality platform answers next after
the reference's mean/min/max summaries (A2/A6, ``Second Experiment/
GPT 5.py:141-142``).

Cross-engine exactness (SURVEY.md §7.3.2): every statistic is derived
from order-independent DECIMAL power sums (Σx, Σx², Σx³, Σxy over
fixed-point values and integer time coordinates), cast to double ONCE,
with the final double expression textually mirrored in the DuckDB oracle
— so both engines compute bit-identical results.  Never ``corr()`` /
``skewness()`` built-ins on doubles: those fold in scan order and differ
in the last ulp between engines (and between runs on different partition
counts).

Scale: each query is ONE grouped aggregation pass over events — map-side
partial decimal sums, |event_type| rows out.  No joins, no second pass;
the power-sum trick is exactly what makes single-pass moments mergeable
across 1000 executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipelines_using_llm_spark.registry import QuerySpec
from data_pipelines_using_llm_spark.sources.tables import load_table

TREND_EPOCH = "1995-01-01"


def value_hour_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation between hour-of-day and value per event_type —
    the "is this metric diurnal" probe.  x (hour) is an exact integer,
    y (value) is fixed-point: all five power sums are exact, and the
    correlation is one double expression over them.
    """
    d = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    x = F.hour("ts").cast("long")
    y = F.col("value").cast("decimal(18,2)")
    n = F.count(F.lit(1)).cast("double")
    sx = F.sum(x).cast("double")
    sy = F.sum(y).cast("double")
    sxy = F.sum(y * x).cast("double")
    sx2 = F.sum(x * x).cast("double")
    sy2 = F.sum(y * y).cast("double")
    return d.groupBy("event_type").agg(
        (
            (n * sxy - sx * sy)
            / (F.sqrt(n * sx2 - sx * sx) * F.sqrt(n * sy2 - sy * sy))
        ).alias("hour_value_corr"),
        F.count(F.lit(1)).alias("n_events"),
    )


VALUE_HOUR_CORRELATION_ORACLE = """
WITH s AS (
    SELECT event_type,
           CAST(count(*) AS DOUBLE) AS n,
           CAST(sum(CAST(hour(ts) AS BIGINT)) AS DOUBLE) AS sx,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sy,
           CAST(sum(CAST(value AS DECIMAL(18,2)) * CAST(hour(ts) AS BIGINT)) AS DOUBLE) AS sxy,
           CAST(sum(CAST(hour(ts) AS BIGINT) * CAST(hour(ts) AS BIGINT)) AS DOUBLE) AS sx2,
           CAST(sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sy2,
           count(*) AS n_events
    FROM events WHERE value IS NOT NULL GROUP BY event_type
)
SELECT event_type,
       (n * sxy - sx * sy)
       / (sqrt(n * sx2 - sx * sx) * sqrt(n * sy2 - sy * sy)) AS hour_value_corr,
       n_events
FROM s
"""


def value_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares slope of value against DAYS since a fixed epoch, per
    event_type — the single-pass drift detector (regr_slope semantics,
    stated as exact power sums).  Day index is an exact small integer, so
    Σx² stays far inside BIGINT even at 100 TB row counts; the slope is
    value-units per day.
    """
    d = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    x = F.datediff(F.col("ts"), F.lit(TREND_EPOCH).cast("timestamp")).cast("long")
    y = F.col("value").cast("decimal(18,2)")
    n = F.count(F.lit(1)).cast("double")
    sx = F.sum(x).cast("double")
    sy = F.sum(y).cast("double")
    sxy = F.sum(y * x).cast("double")
    sx2 = F.sum(x * x).cast("double")
    return d.groupBy("event_type").agg(
        ((n * sxy - sx * sy) / (n * sx2 - sx * sx)).alias("slope_per_day"),
        F.count(F.lit(1)).alias("n_events"),
    )


VALUE_TREND_SLOPE_ORACLE = f"""
WITH s AS (
    SELECT event_type,
           CAST(count(*) AS DOUBLE) AS n,
           CAST(sum(CAST(datediff('day', TIMESTAMP '{TREND_EPOCH} 00:00:00', ts) AS BIGINT)) AS DOUBLE) AS sx,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sy,
           CAST(sum(CAST(value AS DECIMAL(18,2))
                    * CAST(datediff('day', TIMESTAMP '{TREND_EPOCH} 00:00:00', ts) AS BIGINT)) AS DOUBLE) AS sxy,
           CAST(sum(CAST(datediff('day', TIMESTAMP '{TREND_EPOCH} 00:00:00', ts) AS BIGINT)
                    * CAST(datediff('day', TIMESTAMP '{TREND_EPOCH} 00:00:00', ts) AS BIGINT)) AS DOUBLE) AS sx2,
           count(*) AS n_events
    FROM events WHERE value IS NOT NULL GROUP BY event_type
)
SELECT event_type,
       (n * sxy - sx * sy) / (n * sx2 - sx * sx) AS slope_per_day,
       n_events
FROM s
"""


def value_skewness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population skewness per event_type from exact power sums Σx, Σx²,
    Σx³ — third central moment over variance^1.5, the single-pass
    "is the tail one-sided" probe.

    Values are < 10^7 with 2 decimals, so DECIMAL(9,2) cubes peak at
    precision 29 — inside both engines' exact decimal range; the sums
    stay exact rationals and cast to identical doubles.
    """
    d = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    v = F.col("value").cast("decimal(9,2)")
    n = F.count(F.lit(1)).cast("double")
    s1 = F.sum(v).cast("double")
    s2 = F.sum(v * v).cast("double")
    s3 = F.sum(v * v * v).cast("double")
    mean = s1 / n
    m2 = s2 / n - mean * mean
    m3 = s3 / n - 3 * mean * (s2 / n) + 2 * mean * mean * mean
    return d.groupBy("event_type").agg(
        (m3 / F.pow(m2, F.lit(1.5))).alias("skewness_pop"),
        F.count(F.lit(1)).alias("n_events"),
    )


VALUE_SKEWNESS_ORACLE = """
WITH s AS (
    SELECT event_type,
           CAST(count(*) AS DOUBLE) AS n,
           CAST(sum(CAST(value AS DECIMAL(9,2))) AS DOUBLE) AS s1,
           CAST(sum(CAST(value AS DECIMAL(9,2)) * CAST(value AS DECIMAL(9,2))) AS DOUBLE) AS s2,
           CAST(sum(CAST(value AS DECIMAL(9,2)) * CAST(value AS DECIMAL(9,2))
                    * CAST(value AS DECIMAL(9,2))) AS DOUBLE) AS s3,
           count(*) AS n_events
    FROM events WHERE value IS NOT NULL GROUP BY event_type
)
SELECT event_type,
       (s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * (s1 / n) * (s1 / n) * (s1 / n))
       / pow(s2 / n - (s1 / n) * (s1 / n), 1.5) AS skewness_pop,
       n_events
FROM s
"""


EWMA_ALPHA = 0.2


def user_value_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially weighted moving average of event values —
    the recursive-state sequential computation (``s_t = α·v_t +
    (1-α)·s_{t-1}``, seeded with the first value) that no associative
    aggregate can express.

    Implemented as a SORTED FOLD: collect the (ts, event_id, value)
    sequence per user, sort, seed with element 1, fold the tail.  The
    fold order matches the oracle's ``array_agg(... ORDER BY ts,
    event_id)`` + ``list_reduce`` (whose first element is the init), so
    the recursion produces bit-identical doubles cross-engine.  At
    100 TB the per-user array is bounded by one user's activity — the
    same per-key-sequence assumption every sessionizer makes; for
    unbounded keys use :func:`user_value_ewma_chunked`, which bounds the
    array per time chunk and carries the seed forward.

    Determinism note: the sort comparator consults ``(ts, event_id)``
    ONLY — exactly the oracle's ``ORDER BY ts, event_id`` — with
    ``value`` as pure payload, so the fold order is identical
    cross-engine by construction rather than by relying on
    ``event_id`` uniqueness.
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("value").isNotNull()
    )

    def _by_ts_then_id(a, b):
        return (
            F.when(a["ts"] < b["ts"], F.lit(-1))
            .when(a["ts"] > b["ts"], F.lit(1))
            .when(a["event_id"] < b["event_id"], F.lit(-1))
            .when(a["event_id"] > b["event_id"], F.lit(1))
            .otherwise(F.lit(0))
        )

    arr = e.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "value")), _by_ts_then_id
        ).alias("seq")
    )
    ewma = F.aggregate(
        F.expr("slice(seq, 2, size(seq) - 1)"),
        F.element_at(F.col("seq"), 1)["value"],
        lambda acc, s: F.lit(EWMA_ALPHA) * s["value"]
        + F.lit(1 - EWMA_ALPHA) * acc,
    )
    return arr.select(
        "user_id",
        F.size("seq").alias("n_events"),
        F.round(ewma, 6).alias("ewma_value"),
    )


def user_value_ewma_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-and-carry EWMA — the bounded-memory batch variant of
    :func:`user_value_ewma` for keys whose full history cannot sit in
    one task (a power-user key with 10⁸ events OOMs the sorted fold).

    Shape: split the timeline into week chunks (the chunk list is a
    tiny control-plane collect bounded by the data's time span, same
    discipline as PageRank's convergence probe), then fold the chunks in
    order — each round is one grouped sort-fold over ONE chunk's events
    joined full-outer with the carried state, so per-key task memory is
    bounded by the key's activity within a single chunk, never its
    lifetime.  The carry is persisted per round (operators/caching.py::
    barrier) so round N+1 starts from materialized state instead of
    re-deriving N rounds of lineage — exactly what streaming
    ``transformWithState`` does incrementally, expressed as batch.

    Bit-equality with the unchunked fold (same oracle, and asserted
    exactly in tests/test_graph.py): a left fold over a concatenation is
    the fold of the second part seeded with the fold of the first —
    ``fold(a ++ b, seed) = fold(b, fold(a, seed))`` — and chunk
    boundaries (week of ts) respect the (ts, event_id) sort order, so
    the float operations happen in the identical sequence.
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("value").isNotNull()
    )
    weeks = sorted(
        r["w"]
        for r in e.select(F.date_trunc("week", "ts").alias("w"))
        .distinct()
        .collect()
    )
    from data_pipelines_using_llm_spark.operators.caching import barrier

    step = lambda acc, s: (  # noqa: E731 — shared by both fold branches
        F.lit(EWMA_ALPHA) * s["value"] + F.lit(1 - EWMA_ALPHA) * acc
    )
    carry: DataFrame | None = None
    for w in weeks:
        arr = (
            e.filter(F.date_trunc("week", "ts") == F.lit(w))
            .groupBy("user_id")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "value"))
                ).alias("seq")
            )
        )
        if carry is None:
            folded = arr.select(
                "user_id",
                F.size("seq").cast("long").alias("n_ev"),
                F.aggregate(
                    F.expr("slice(seq, 2, size(seq) - 1)"),
                    F.element_at(F.col("seq"), 1)["value"],
                    step,
                ).alias("state"),
            )
        else:
            j = arr.join(carry, "user_id", "full_outer")
            seeded = F.when(
                F.col("state").isNotNull(),
                F.aggregate(F.col("seq"), F.col("state"), step),
            ).otherwise(
                F.aggregate(
                    F.expr("slice(seq, 2, size(seq) - 1)"),
                    F.element_at(F.col("seq"), 1)["value"],
                    step,
                )
            )
            folded = j.select(
                "user_id",
                (
                    F.coalesce(F.col("n_ev"), F.lit(0))
                    + F.when(F.col("seq").isNull(), F.lit(0)).otherwise(
                        F.size("seq").cast("long")
                    )
                ).alias("n_ev"),
                F.when(F.col("seq").isNull(), F.col("state"))
                .otherwise(seeded)
                .alias("state"),
            )
        carry = barrier(folded)
    if carry is None:  # no qualifying events at all
        return spark.createDataFrame(
            [], "user_id bigint, n_events int, ewma_value double"
        )
    return carry.select(
        "user_id",
        F.col("n_ev").cast("int").alias("n_events"),
        F.round("state", 6).alias("ewma_value"),
    )


USER_VALUE_EWMA_ORACLE = f"""
WITH seq AS (
    SELECT user_id,
           array_agg(value ORDER BY ts, event_id) AS vals
    FROM events
    WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
    GROUP BY user_id
)
SELECT user_id,
       CAST(len(vals) AS INT) AS n_events,
       round(list_reduce(vals,
             (acc, x) -> {EWMA_ALPHA!r} * x + {1 - EWMA_ALPHA!r} * acc), 6)
           AS ewma_value
FROM seq
"""


HOLT_ALPHA = 0.5  # exactly representable: every smoothing product is one
HOLT_BETA = 0.5  # IEEE multiply by 0.5, bit-identical on any engine


def revenue_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear (level + trend) exponential smoothing over each
    order priority's daily-revenue series, with a one-step-ahead
    forecast — the two-component recursive state
    (``l_t = α·y_t + (1-α)(l_{t-1}+b_{t-1})``,
    ``b_t = β(l_t - l_{t-1}) + (1-β)b_{t-1}``) that generalizes the
    single-state EWMA and that no associative aggregate can express.

    Implemented as a SORTED FOLD whose accumulator is a 2-element
    ``[l, b]`` ARRAY: the daily series is exact decimal revenue
    (order-independent), the fold seeds with ``[y₂, y₂-y₁]`` and
    consumes y₃.., and both engines state the identical arithmetic in
    the identical sequence (elements are lifted into ``[y, 0.0]``
    because DuckDB's ``list_reduce`` requires accumulator and element
    types to match).  The state is an array, NOT a struct, by necessity:
    DuckDB 1.0.0's ``list_reduce`` miscomputes the SECOND field of a
    struct accumulator from the second iteration on (first field right,
    second stale — reproduced on a 3-step fold); the list-typed state
    folds correctly and Spark mirrors it verbatim.  Series with fewer
    than 3 days are excluded on both sides.

    Scale: per-key state is the (days × 16 bytes) series — the same
    bounded-sequence contract as `user_value_ewma`, with the same
    chunk-and-carry escape hatch (the fold of a concatenation is the
    fold of the tail seeded with the fold of the head — the struct
    state carries across chunks exactly like the scalar one).
    """
    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.date_trunc("day", "o_orderdate").alias("d"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("y")
        )
    )
    arr = (
        daily.groupBy("priority")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("d", "y"))),
                lambda s: s["y"],
            ).alias("ys")
        )
        .filter(F.size("ys") >= 3)
    )
    a, b = HOLT_ALPHA, HOLT_BETA
    lifted = F.transform(
        F.expr("slice(ys, 3, size(ys) - 2)"),
        lambda y: F.array(y, F.lit(0.0)),
    )
    init = F.array(
        F.element_at("ys", 2),
        F.element_at("ys", 2) - F.element_at("ys", 1),
    )
    al = lambda c: F.element_at(c, 1)  # noqa: E731 — state accessors
    ab = lambda c: F.element_at(c, 2)  # noqa: E731
    state = F.aggregate(
        lifted,
        init,
        lambda acc, x: F.array(
            F.lit(a) * al(x) + F.lit(1 - a) * (al(acc) + ab(acc)),
            F.lit(b)
            * (
                (F.lit(a) * al(x) + F.lit(1 - a) * (al(acc) + ab(acc)))
                - al(acc)
            )
            + F.lit(1 - b) * ab(acc),
        ),
    )
    return arr.select(
        "priority",
        F.size("ys").alias("n_days"),
        F.round(al(state), 6).alias("level"),
        F.round(ab(state), 6).alias("trend"),
        F.round(al(state) + ab(state), 6).alias("forecast_next"),
    )


REVENUE_HOLT_FORECAST_ORACLE = f"""
WITH daily AS (
    SELECT o_orderpriority AS priority,
           date_trunc('day', o_orderdate) AS d,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS y
    FROM orders GROUP BY 1, 2
),
s AS (
    SELECT priority, array_agg(y ORDER BY d) AS ys
    FROM daily GROUP BY priority
),
f AS (
    SELECT priority, len(ys) AS n_days,
           list_reduce(
               list_prepend(
                   [ys[2], ys[2] - ys[1]],
                   list_transform(ys[3:], y -> [y, CAST(0.0 AS DOUBLE)])
               ),
               (acc, x) -> [
                   {HOLT_ALPHA!r} * x[1]
                       + {1 - HOLT_ALPHA!r} * (acc[1] + acc[2]),
                   {HOLT_BETA!r}
                       * (({HOLT_ALPHA!r} * x[1]
                           + {1 - HOLT_ALPHA!r} * (acc[1] + acc[2]))
                          - acc[1])
                       + {1 - HOLT_BETA!r} * acc[2]
               ]
           ) AS st
    FROM s WHERE len(ys) >= 3
)
SELECT priority,
       CAST(n_days AS INT) AS n_days,
       round(st[1], 6) AS level,
       round(st[2], 6) AS trend,
       round(st[1] + st[2], 6) AS forecast_next
FROM f
"""


# PSI drift screen: fixed-width value bins and the month-half split point.
PSI_BIN_WIDTH = 50
PSI_N_BINS = 10
PSI_SPLIT_DAY = 16  # ts day-of-month < 16 -> reference half, else current


def value_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of the event-value distribution,
    reference half-month vs current half-month — the standard ML-model
    monitoring metric for input drift (PSI = Σ (q−p)·ln(q/p); < 0.1
    stable, 0.1–0.25 moderate shift, > 0.25 action).

    Emitted per bin (bin id, both counts, both shares, the PSI
    contribution), so the report shows WHERE the distribution moved, not
    just that it did; the scalar PSI is the column sum.  Bins with a
    zero count on either side get a NULL contribution (flagged, not
    smoothed — at 100 TB a silently-Laplace-smoothed PSI hides exactly
    the novel-value drift you built the screen for).

    Plan: one grouped aggregation of the fact to ≤ PSI_N_BINS × 2 cells
    (conditional count pivot), then per-bin expressions against one-row
    broadcast totals.  ln() follows the PMI convention
    (plans/association.py): round(…, 6) on both engines.
    """
    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    binned = e.select(
        F.least(
            F.floor(F.col("value") / PSI_BIN_WIDTH), F.lit(PSI_N_BINS - 1)
        ).alias("bin"),
        (F.dayofmonth("ts") < PSI_SPLIT_DAY).alias("is_ref"),
    )
    cells = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("is_ref"), 1).otherwise(0)).alias("n_ref"),
        F.sum(F.when(~F.col("is_ref"), 1).otherwise(0)).alias("n_cur"),
    )
    totals = cells.agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    p = F.col("n_ref").cast("double") / F.col("t_ref").cast("double")
    q = F.col("n_cur").cast("double") / F.col("t_cur").cast("double")
    return cells.join(F.broadcast(totals)).select(
        "bin",
        "n_ref",
        "n_cur",
        F.round(p, 6).alias("share_ref"),
        F.round(q, 6).alias("share_cur"),
        F.when(
            (F.col("n_ref") > 0) & (F.col("n_cur") > 0),
            F.round((q - p) * F.log(q / p), 6),
        ).alias("psi_contrib"),
    )


VALUE_PSI_DRIFT_ORACLE = f"""
WITH binned AS (
    SELECT least(CAST(floor(value / {PSI_BIN_WIDTH}) AS BIGINT),
                 {PSI_N_BINS - 1}) AS bin,
           day(ts) < {PSI_SPLIT_DAY} AS is_ref
    FROM events WHERE value IS NOT NULL
),
cells AS (
    SELECT bin,
           CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
           CAST(sum(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
    FROM binned GROUP BY 1
),
tot AS (SELECT sum(n_ref) AS t_ref, sum(n_cur) AS t_cur FROM cells)
SELECT bin, n_ref, n_cur,
       round(CAST(n_ref AS DOUBLE) / CAST(t_ref AS DOUBLE), 6) AS share_ref,
       round(CAST(n_cur AS DOUBLE) / CAST(t_cur AS DOUBLE), 6) AS share_cur,
       CASE WHEN n_ref > 0 AND n_cur > 0 THEN
           round((CAST(n_cur AS DOUBLE) / CAST(t_cur AS DOUBLE)
                  - CAST(n_ref AS DOUBLE) / CAST(t_ref AS DOUBLE))
                 * ln((CAST(n_cur AS DOUBLE) / CAST(t_cur AS DOUBLE))
                      / (CAST(n_ref AS DOUBLE) / CAST(t_ref AS DOUBLE))), 6)
       END AS psi_contrib
FROM cells CROSS JOIN tot
"""


# CUSUM tuning: slack k = CUSUM_K_SIGMA·σ absorbs normal wander, alarm at
# h = CUSUM_H_SIGMA·σ — the classic (0.5σ, 4σ) tabular-CUSUM settings.
# Halves/quarters are exactly representable so every product is one IEEE
# multiply, bit-identical on both engines.
CUSUM_K_SIGMA = 0.5
CUSUM_H_SIGMA = 4.0


def revenue_cusum_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided tabular CUSUM change-point detection over each order
    priority's daily-revenue series (Page 1954): the sequential
    recursion ``s⁺_t = max(0, s⁺_{t-1} + (y_t − μ − k))`` /
    ``s⁻_t = max(0, s⁻_{t-1} + (μ − k − y_t))`` with an alert whenever
    either statistic crosses ``h`` — the standard drift detector for
    pipeline-volume monitoring, and (like EWMA/Holt) a recursion no
    associative aggregate can express.

    Three-stage deterministic computation, every stage a fold over the
    SAME sorted daily array so both engines run identical arithmetic in
    identical order: (1) μ as a sorted-order sum / n; (2) σ as the
    population root-mean-square deviation (sorted fold of squared
    residuals); (3) the CUSUM recursion with a 3-element array state
    ``[s⁺, s⁻, n_alerts]``.  Daily revenue is exact decimal before the
    double cast, as in :func:`revenue_holt_forecast`.

    Scale: the per-key array is the bounded daily series (days × 16
    bytes); the chunk-and-carry escape hatch applies unchanged (the
    state is the fold of the head).
    """
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.date_trunc("day", "o_orderdate").alias("d"),
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("y")
    )
    arr = (
        daily.groupBy("priority")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("d", "y"))),
                lambda s: s["y"],
            ).alias("ys")
        )
        .filter(F.size("ys") >= 3)
    )
    fold_sum = lambda col: F.aggregate(  # noqa: E731 — sorted-order sum
        col, F.lit(0.0), lambda acc, y: acc + y
    )
    stats = arr.select(
        "priority",
        "ys",
        (fold_sum(F.col("ys")) / F.size("ys")).alias("mu"),
    ).select(
        "priority",
        "ys",
        "mu",
        F.sqrt(
            F.aggregate(
                F.col("ys"),
                F.lit(0.0),
                lambda acc, y: acc
                + (y - F.col("mu")) * (y - F.col("mu")),
            )
            / F.size("ys")
        ).alias("sigma"),
    )
    kk = F.lit(CUSUM_K_SIGMA) * F.col("sigma")
    h = F.lit(CUSUM_H_SIGMA) * F.col("sigma")
    sp = lambda acc, y: F.greatest(  # noqa: E731
        F.lit(0.0), F.element_at(acc, 1) + (y - F.col("mu") - kk)
    )
    sn = lambda acc, y: F.greatest(  # noqa: E731
        F.lit(0.0), F.element_at(acc, 2) + (F.col("mu") - kk - y)
    )
    state = F.aggregate(
        F.col("ys"),
        F.array(F.lit(0.0), F.lit(0.0), F.lit(0.0)),
        lambda acc, y: F.array(
            sp(acc, y),
            sn(acc, y),
            F.element_at(acc, 3)
            + F.when((sp(acc, y) > h) | (sn(acc, y) > h), F.lit(1.0)).otherwise(
                F.lit(0.0)
            ),
        ),
    )
    # NO round() on the doubles: the fold is bit-identical cross-engine
    # (proven by construction and by bitwise comparison at sf0.001), and
    # rounding is what would DIVERGE — a value landing on a 1e-6 half-way
    # tie rounds differently under Spark's BigDecimal HALF_UP vs DuckDB's
    # multiply-by-1e6-then-round (observed: 238828.5504505 -> .550450 vs
    # .550451).  Identical bits need no stabilization.
    return stats.select(
        "priority",
        F.size("ys").alias("n_days"),
        F.col("mu"),
        F.col("sigma"),
        F.element_at(state, 1).alias("cusum_pos"),
        F.element_at(state, 2).alias("cusum_neg"),
        F.element_at(state, 3).cast("long").alias("n_alert_days"),
    )


REVENUE_CUSUM_ALERTS_ORACLE = f"""
WITH daily AS (
    SELECT o_orderpriority AS priority,
           date_trunc('day', o_orderdate) AS d,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS y
    FROM orders GROUP BY 1, 2
),
s AS (
    SELECT priority, array_agg(y ORDER BY d) AS ys
    FROM daily GROUP BY priority
),
m AS (
    SELECT priority, ys,
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE), ys),
                       (acc, y) -> acc + y) / len(ys) AS mu
    FROM s WHERE len(ys) >= 3
),
v AS (
    SELECT priority, ys, mu,
           sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), ys),
                            (acc, y) -> acc + (y - mu) * (y - mu))
                / len(ys)) AS sigma
    FROM m
),
f AS (
    SELECT priority, ys, mu, sigma,
           list_reduce(
               list_prepend([CAST(0.0 AS DOUBLE), 0.0, 0.0],
                            list_transform(ys, y -> [y, 0.0, 0.0])),
               (acc, x) -> [
                   greatest(0.0, acc[1]
                       + (x[1] - mu - {CUSUM_K_SIGMA!r} * sigma)),
                   greatest(0.0, acc[2]
                       + (mu - {CUSUM_K_SIGMA!r} * sigma - x[1])),
                   acc[3] + CASE WHEN
                       greatest(0.0, acc[1]
                           + (x[1] - mu - {CUSUM_K_SIGMA!r} * sigma))
                           > {CUSUM_H_SIGMA!r} * sigma
                       OR greatest(0.0, acc[2]
                           + (mu - {CUSUM_K_SIGMA!r} * sigma - x[1]))
                           > {CUSUM_H_SIGMA!r} * sigma
                       THEN 1.0 ELSE 0.0 END
               ]
           ) AS st
    FROM v
)
SELECT priority,
       CAST(len(ys) AS INT) AS n_days,
       mu,
       sigma,
       st[1] AS cusum_pos,
       st[2] AS cusum_neg,
       CAST(st[3] AS BIGINT) AS n_alert_days
FROM f
"""


def rolling_median_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day rolling EXACT median of daily order revenue — the robust
    sibling of ``rolling_daily_revenue``'s moving average (a single
    outlier day drags a mean; it cannot drag a median).

    Exactness: daily revenue is carried as integer CENTS (exact decimal
    sum x 100), and the median of the <= 7-row frame is computed from
    the sorted frame array as ``(arr[(n+1)/2] + arr[n/2+1]) / 2.0`` —
    for odd n both indexes hit the middle element, for even n they
    bracket it; the half-sum of two exact integers is an exact double.
    DuckDB's ``median`` over BIGINT interpolates identically.

    Scale: same argument as ``rolling_daily_revenue``
    (plans/relational.py:366) — the global-ordered window runs on ONE
    row per day, bounded by the calendar, after a map-side-combinable
    corpus aggregation; the frame array holds <= 7 bigints.
    """
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).alias("order_date")
    ).agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("long")
        .alias("day_cents")
    )
    w = Window.orderBy("order_date").rowsBetween(-6, 0)
    arr = F.array_sort(F.collect_list("day_cents").over(w))
    n = F.size(arr)
    lo = F.element_at(arr, F.floor((n + 1) / 2).cast("int"))
    hi = F.element_at(arr, F.floor(n / 2 + 1).cast("int"))
    return daily.select(
        "order_date",
        "day_cents",
        ((lo + hi) / 2.0).alias("median_7d_cents"),
    )


ROLLING_MEDIAN_REVENUE_ORACLE = """
WITH daily AS (
    SELECT date_trunc('day', o_orderdate) AS order_date,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
               AS day_cents
    FROM orders GROUP BY 1
)
SELECT order_date, day_cents,
       median(day_cents) OVER (ORDER BY order_date
           ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS median_7d_cents
FROM daily
"""


QUERIES: dict[str, QuerySpec] = {
    "value_hour_correlation": QuerySpec(
        value_hour_correlation,
        VALUE_HOUR_CORRELATION_ORACLE,
        "Pearson corr(hour, value) per type from exact power sums",
    ),
    "value_trend_slope": QuerySpec(
        value_trend_slope,
        VALUE_TREND_SLOPE_ORACLE,
        "regr_slope of value on day index, single pass, exact sums",
    ),
    "value_skewness": QuerySpec(
        value_skewness,
        VALUE_SKEWNESS_ORACLE,
        "population skewness from exact Σx/Σx²/Σx³",
    ),
    "user_value_ewma": QuerySpec(
        user_value_ewma,
        USER_VALUE_EWMA_ORACLE,
        "per-user EWMA via deterministic sorted fold (recursive state)",
    ),
    "user_value_ewma_chunked": QuerySpec(
        user_value_ewma_chunked,
        USER_VALUE_EWMA_ORACLE,
        "bounded-memory EWMA: week chunks, carried seed, same oracle",
    ),
    "revenue_holt_forecast": QuerySpec(
        revenue_holt_forecast,
        REVENUE_HOLT_FORECAST_ORACLE,
        "Holt level+trend smoothing: struct-state sorted fold + forecast",
    ),
    "revenue_cusum_alerts": QuerySpec(
        revenue_cusum_alerts,
        REVENUE_CUSUM_ALERTS_ORACLE,
        "two-sided CUSUM change detection over daily revenue series",
    ),
    "value_psi_drift": QuerySpec(
        value_psi_drift,
        VALUE_PSI_DRIFT_ORACLE,
        "per-bin Population Stability Index drift report",
    ),
    "rolling_median_revenue": QuerySpec(
        rolling_median_revenue,
        ROLLING_MEDIAN_REVENUE_ORACLE,
        "7-day rolling exact median over integer cents",
    ),
}
