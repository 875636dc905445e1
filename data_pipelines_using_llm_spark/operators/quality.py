"""Data-quality operators (SURVEY.md §2.13 Q1–Q7) — the reference's
signature capability, re-expressed as single-pass aggregations.

The reference runs one Spark job per metric column
(``filter(col(c).isNull()).count()`` loops at
``First experiment/Claude Opus 4.py:182-183``,
``Second Experiment/Claude 4 Sonnet.py:186-189``) — 7+ jobs per quality
gate, each a full re-scan.  At 100 TB that is 7 extra table scans.  Every
profile here is ONE ``agg(...)`` pass (the pattern the strongest reference
variant already uses: ``Third Experiment/GPT 5.py:210-216``), so a quality
gate costs one scan regardless of column count.

NaN and NULL are reported separately (the reference conflates them at
``Second Experiment/Claude Opus 4.py:157`` — SURVEY.md §4.3.5).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, FloatType


def _null_count(c: str) -> Column:
    # count(*) - count(c) == # of NULLs; stays a BIGINT in every engine,
    # unlike sum(case when ...) which widens in some oracles.
    return (F.count(F.lit(1)) - F.count(F.col(c))).alias(f"{c}_nulls")


def null_profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Q1: one-row, one-pass per-column null counts + total.

    Reference semantics: ``First experiment/Claude Opus 4.py:176-202`` (a
    per-column count loop) and the vectorized variant it should have been,
    ``Third Experiment/GPT 5.py:210-216``.
    """
    cols = cols or df.columns
    aggs = [F.count(F.lit(1)).alias("total_records")]
    aggs += [_null_count(c) for c in cols]
    return df.agg(*aggs)


def nan_profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """NaN counts, kept distinct from NULLs (SURVEY.md §4.3.5)."""
    if cols is None:
        cols = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (DoubleType, FloatType))
        ]
    aggs = [
        F.sum(F.isnan(F.col(c)).cast("long")).alias(f"{c}_nans") for c in cols
    ]
    return df.agg(*aggs)


def null_rate_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-column null percentage as a tall (column, nulls, pct) report.

    The tall shape keeps the report usable when the table has hundreds of
    columns (one row each) — still one aggregation pass + a tiny explode.
    """
    wide = null_profile(df, cols)
    pairs = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"{c}_nulls").alias("nulls"),
                F.round(F.col(f"{c}_nulls") * 100.0 / F.col("total_records"), 4).alias(
                    "null_pct"
                ),
            )
            for c in cols
        ]
    )
    return (
        wide.select(F.col("total_records"), F.explode(pairs).alias("r"))
        .select("r.column", "r.nulls", "r.null_pct", "total_records")
    )


def duplicate_profile(df: DataFrame, key: list[str], top_k: int = 10) -> DataFrame:
    """Q2 top-offenders: keys occurring more than once, worst first.

    Reference: ``GROUP BY … HAVING COUNT(*) > 1 ORDER BY count DESC LIMIT k``
    (``First experiment/Claude Sonnet 4.py:296-308``).  One shuffle on the
    key; at scale the partial (map-side) aggregation means only distinct
    keys shuffle.
    """
    return (
        df.groupBy(*key)
        .agg(F.count(F.lit(1)).alias("n_copies"))
        .filter(F.col("n_copies") > 1)
        .orderBy(F.col("n_copies").desc(), *key)
        .limit(top_k)
    )


def duplicate_stats(df: DataFrame, key: list[str]) -> DataFrame:
    """Q2 scalar form: one row with total/distinct/dup-key/dup-row counts.

    Combines the reference's two counting strategies — group-count
    (``First experiment/Claude Opus 4.py:217-220``, D1) and distinct-delta
    (``Third Experiment/Qwen3-235B-A22B-2507.py:205-212``, D2) — in one
    aggregation over the grouped counts.
    """
    per_key = df.groupBy(*key).agg(F.count(F.lit(1)).alias("n"))
    return per_key.agg(
        F.sum("n").alias("total_records"),
        F.count(F.lit(1)).alias("distinct_keys"),
        F.sum(F.when(F.col("n") > 1, F.lit(1)).otherwise(F.lit(0))).cast("long").alias("dup_keys"),
        F.sum(F.when(F.col("n") > 1, F.col("n")).otherwise(F.lit(0))).cast("long").alias("dup_rows"),
        (F.sum("n") - F.count(F.lit(1))).cast("long").alias("excess_rows"),
    )


def completeness(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Q7: non-null cells / total cells, as a one-row percentage.

    Reference: ``Third Experiment/Claude Sonnet 4.py:256-265``.
    """
    cols = cols or df.columns
    non_null = None
    for c in cols:
        term = F.count(F.col(c))
        non_null = term if non_null is None else non_null + term
    return df.agg(
        F.count(F.lit(1)).alias("total_records"),
        non_null.alias("non_null_cells"),
        (F.count(F.lit(1)) * len(cols)).alias("total_cells"),
        F.round(non_null * 100.0 / (F.count(F.lit(1)) * len(cols)), 4).alias(
            "completeness_pct"
        ),
    )


def quality_report(df: DataFrame, key: list[str], metric_cols: list[str]) -> DataFrame:
    """Q4: the reference's Python-dict quality report as ONE small DataFrame.

    Shape follows ``First experiment/Claude Opus 4.py:161-167`` (totals,
    per-column nulls, dup counts, clean-record count) but is computed in a
    single pass over the table plus one shuffle for the key-dup counts —
    never one job per metric.
    """
    any_null = None
    for c in metric_cols:
        term = F.col(c).isNull()
        any_null = term if any_null is None else any_null | term

    base = df.select(
        *[F.col(c) for c in key],
        *[F.col(c) for c in metric_cols],
        any_null.cast("long").alias("_any_null"),
    )
    per_key = base.groupBy(*key).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_any_null").alias("_n_null"),
        *[_null_count(c) for c in metric_cols],
    )
    return per_key.agg(
        F.sum("_n").cast("long").alias("total_records"),
        F.count(F.lit(1)).cast("long").alias("distinct_keys"),
        (F.sum("_n") - F.count(F.lit(1))).cast("long").alias("excess_dup_rows"),
        F.sum("_n_null").cast("long").alias("rows_with_any_null"),
        (F.sum("_n") - F.sum("_n_null")).cast("long").alias("clean_records"),
        F.round((F.sum("_n") - F.sum("_n_null")) * 100.0 / F.sum("_n"), 4).alias(
            "retention_pct"
        ),
        *[F.sum(f"{c}_nulls").cast("long").alias(f"{c}_nulls") for c in metric_cols],
    )


def health_check(
    df: DataFrame,
    ts_col: str,
    metric_cols: list[str],
    freshness_hours: int = 48,
    min_completeness_pct: float = 50.0,
) -> DataFrame:
    """Q5: table health score — rowcount>0, freshness, completeness.

    Reference: ``First experiment/Claude Sonnet 4.py:699-779`` (HEALTHY if
    ≥3 of 4 checks pass).  Freshness is anchored to the max timestamp in the
    data rather than wall-clock ``NOW()`` so the check is deterministic and
    oracle-testable; the wall-clock variant is a trivial parameter swap.
    """
    n_cells = len(metric_cols)
    non_null = None
    for c in metric_cols:
        term = F.count(F.col(c))
        non_null = term if non_null is None else non_null + term
    agg = df.agg(
        F.count(F.lit(1)).alias("total_records"),
        F.max(F.col(ts_col)).alias("max_ts"),
        F.min(F.col(ts_col)).alias("min_ts"),
        F.round(non_null * 100.0 / (F.count(F.lit(1)) * n_cells), 4).alias(
            "completeness_pct"
        ),
    )
    return agg.select(
        "total_records",
        "min_ts",
        "max_ts",
        "completeness_pct",
        (F.col("total_records") > 0).alias("has_rows"),
        (
            F.col("max_ts")
            >= F.col("min_ts") + F.expr(f"INTERVAL {freshness_hours} HOURS")
        ).alias("spans_freshness_window"),
        (F.col("completeness_pct") >= F.lit(min_completeness_pct)).alias(
            "is_complete_enough"
        ),
        (
            (F.col("total_records") > 0).cast("int")
            + (
                F.col("max_ts")
                >= F.col("min_ts") + F.expr(f"INTERVAL {freshness_hours} HOURS")
            ).cast("int")
            + (F.col("completeness_pct") >= F.lit(min_completeness_pct)).cast("int")
        ).alias("checks_passed"),
    )


def monitoring_summary(
    df: DataFrame,
    bucket_col: Column,
    metric_cols: list[str],
    fixed_point: bool = True,
) -> DataFrame:
    """Q6: per-bucket monitoring aggregate (the reference's monitoring VIEW,
    ``First experiment/Claude Sonnet 4.py:651-690``): counts, null counts,
    per-metric averages.  Materializable as a temp view by the caller.

    ``fixed_point=True`` computes averages via exact decimal sums
    (order-independent, oracle-stable) — right for 2-decimal metric feeds;
    turn off for full-precision doubles.
    """
    from data_pipelines_using_llm_spark.functions.exact import exact_avg

    aggs = [F.count(F.lit(1)).alias("n_records")]
    for c in metric_cols:
        aggs.append(_null_count(c))
        if fixed_point:
            aggs.append(exact_avg(c).alias(f"{c}_avg"))
        else:
            aggs.append(F.round(F.avg(F.col(c)), 4).alias(f"{c}_avg"))
    return df.groupBy(bucket_col.alias("bucket")).agg(*aggs)
