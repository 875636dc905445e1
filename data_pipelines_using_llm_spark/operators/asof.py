"""As-of (nearest-predecessor) join — the temporal-join extension flagged
in SURVEY.md §2.5: the reference only ever inner-joins feeds on exactly
equal timestamps (`Third Experiment/Claude Opus 4.py:154-179`); an as-of
join is what you need when the feeds' clocks don't align.

Spark has no built-in as-of join, so this is the classic scalable
union+window formulation: tag both sides, union them, sort within each key
by (ts, side), and let ``last(..., ignorenulls=True)`` carry the most
recent right-side values forward onto left rows.  ONE shuffle on the key —
the same cost as a regular sort-merge join, no range explosion, no
driver-side loop.  Skewed keys behave like any windowed aggregation (AQE
handles them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    strict: bool = False,
) -> DataFrame:
    """For each left row, attach ``value_cols`` from the newest right row
    of the same ``on`` key with ``right_ts <= left_ts`` (``<`` when
    ``strict``).  Left rows with no predecessor keep nulls.

    Right-side duplicates per (key, ts) must be resolved by the caller
    (e.g. keep-latest row_number) — as-of semantics need a unique
    predecessor to be deterministic.
    """
    lt = left.withColumn("_side", F.lit(1)).withColumn("_ts", F.col(left_ts))
    rt = (
        right.select(
            F.col(on),
            F.col(right_ts).alias("_ts"),
            *[F.col(c) for c in value_cols],
        )
        .withColumn("_side", F.lit(0))
    )
    # right rows sort before left rows at equal _ts, so `<=` semantics fall
    # out of the (ts, side) order; strict mode flips the tags
    if strict:
        lt = lt.withColumn("_side", F.lit(0))
        rt = rt.withColumn("_side", F.lit(1))

    unioned = lt.unionByName(rt, allowMissingColumns=True)
    w = (
        Window.partitionBy(on)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(F.when(F.col("_side") == (1 if strict else 0), F.col(c)), ignorenulls=True)
            .over(w)
            .alias(f"_asof_{c}")
            for c in value_cols
        ],
    )
    keep_side = 0 if strict else 1
    return (
        carried.filter(F.col("_side") == keep_side)
        .drop("_side", "_ts", *value_cols)
        .select(
            *[F.col(c) for c in left.columns],
            *[F.col(f"_asof_{c}").alias(c) for c in value_cols],
        )
    )
