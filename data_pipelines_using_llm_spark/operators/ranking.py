"""Distributed EXACT order statistics without a global-sort window.

``ntile`` / ``percent_rank`` / ``cume_dist`` over a global (or
low-cardinality-group) ordering are the classic Spark scale trap: a
window with no (or a 5-value) PARTITION BY funnels the whole input
through ONE sort task per partition value — the "No Partition Defined
for Window" warning is Spark telling you the plan stops scaling right
there.  The usual dodge is ``percentile_approx`` cut points, but that
changes results (tie handling + sketch error) and breaks any
exact-oracle gate.

This module keeps the EXACT semantics and distributes the sort, using
the textbook two-phase ranking:

1. ``repartitionByRange`` on ``(group, order)`` keys — a balanced,
   sampled range shuffle, every task ~|rows|/P;
2. per-(shuffle-partition, group) local ``row_number`` — a PARTITIONED
   window, bounded task size;
3. global rank = local rank + a per-(partition, group) offset, where
   the offsets come from one tiny ``(P x |groups|)`` count table read
   on the driver (a bounded control-plane read, same class as the
   dedup convergence probes — NOT data movement).

Because the order key is required to be a TOTAL order (callers append a
unique tiebreaker column), the computed rank is bit-identical to the
window-function result no matter where the range boundaries fall, so
ntile/percent_rank/cume_dist derived from it hash-match the exact
oracle.  The range-partition assignment itself is pinned with a persist
barrier so the offsets job and the final plan see the same shuffle
output.

Sizing: the driver reads ``P x |groups|`` counter rows, so this
operator targets GLOBAL and LOW-cardinality-group rankings — exactly
the regime where a window is a bottleneck.  For high-cardinality groups
a plain ``Window.partitionBy(group)`` is already scale-safe; use that.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from data_pipelines_using_llm_spark.operators.caching import barrier

_PID = "__rank_pid"
_OFFSET = "__rank_offset"
_LOCAL = "__rank_local"
_GROUP_N = "__rank_group_n"


def with_exact_rank(
    df: DataFrame,
    order_by: list[Column],
    group_by: list[str] | None = None,
    rank_col: str = "rank",
    group_n_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Append the exact 1-based rank of each row under ``order_by``
    (within each ``group_by`` group, global if empty) plus, optionally,
    the group row count — without any unpartitioned window.

    ``order_by`` MUST be a total order within each group (append a
    unique id column); with ties the rank would depend on boundary
    placement and no longer match a window-function oracle.
    """
    group_by = list(group_by or [])
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    keys = [F.col(g) for g in group_by] + list(order_by)
    # barrier pins the shuffle blocks: the offsets job and the final
    # plan must observe the SAME partition assignment.  The counts
    # collect below is the materializing action — no separate count().
    part = barrier(
        df.repartitionByRange(num_partitions, *keys).withColumn(
            _PID, F.spark_partition_id()
        )
    )

    counts = part.groupBy(_PID, *group_by).count().collect()
    # offsets[pid][group] = rows in earlier partitions of the same group
    per_group_running: dict[tuple, int] = {}
    totals: dict[tuple, int] = {}
    offset_rows = []
    for row in sorted(counts, key=lambda r: r[_PID]):
        g = tuple(row[c] for c in group_by)
        offset_rows.append((row[_PID], *g, per_group_running.get(g, 0)))
        per_group_running[g] = per_group_running.get(g, 0) + row["count"]
        totals[g] = per_group_running[g]

    offsets = spark.createDataFrame(
        [(*r[:-1], r[-1], totals[tuple(r[1:-1])]) for r in offset_rows],
        schema=part.select(_PID, *group_by)
        .withColumn(_OFFSET, F.lit(0).cast("long"))
        .withColumn(_GROUP_N, F.lit(0).cast("long"))
        .schema,
    )

    local_w = Window.partitionBy(_PID, *group_by).orderBy(*order_by)
    # eqNullSafe join: a NULL group value must still find its offsets row
    # (SQL = would silently drop those rows).
    off = offsets
    for c in [_PID, *group_by]:
        off = off.withColumnRenamed(c, f"__off_{c}")
    cond = None
    for c in [_PID, *group_by]:
        clause = F.col(c).eqNullSafe(F.col(f"__off_{c}"))
        cond = clause if cond is None else (cond & clause)
    ranked = (
        part.withColumn(_LOCAL, F.row_number().over(local_w))
        .join(F.broadcast(off), cond)
        .withColumn(rank_col, (F.col(_OFFSET) + F.col(_LOCAL)).cast("long"))
    )
    keep = [c for c in df.columns] + [rank_col]
    if group_n_col is not None:
        ranked = ranked.withColumn(group_n_col, F.col(_GROUP_N))
        keep.append(group_n_col)
    return ranked.select(*keep)


def with_exact_running_sum(
    df: DataFrame,
    value_col: str,
    order_by: list[Column],
    group_by: list[str] | None = None,
    sum_col: str = "running_sum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append the exact INCLUSIVE running sum of ``value_col`` under
    ``order_by`` (within each group, global if empty) — the distributed
    prefix sum, built exactly like :func:`with_exact_rank`: range
    repartition, per-(partition, group) local running sum, plus a
    per-(partition, group) offset from one small aggregated read.  The
    order key must be a total order, and the value should be integral
    (BIGINT) for bit-identical cross-engine sums."""
    group_by = list(group_by or [])
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    keys = [F.col(g) for g in group_by] + list(order_by)
    part = barrier(
        df.repartitionByRange(num_partitions, *keys).withColumn(
            _PID, F.spark_partition_id()
        )
    )

    sums = part.groupBy(_PID, *group_by).agg(
        F.sum(F.col(value_col)).cast("long").alias("s")
    ).collect()
    per_group_running: dict[tuple, int] = {}
    offset_rows = []
    for row in sorted(sums, key=lambda r: r[_PID]):
        g = tuple(row[c] for c in group_by)
        offset_rows.append((row[_PID], *g, per_group_running.get(g, 0)))
        per_group_running[g] = per_group_running.get(g, 0) + (row["s"] or 0)

    offsets = spark.createDataFrame(
        offset_rows,
        schema=part.select(_PID, *group_by)
        .withColumn(_OFFSET, F.lit(0).cast("long"))
        .schema,
    )

    local_w = (
        Window.partitionBy(_PID, *group_by)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    off = offsets
    for c in [_PID, *group_by]:
        off = off.withColumnRenamed(c, f"__off_{c}")
    cond = None
    for c in [_PID, *group_by]:
        clause = F.col(c).eqNullSafe(F.col(f"__off_{c}"))
        cond = clause if cond is None else (cond & clause)
    out = (
        part.withColumn(
            _LOCAL, F.sum(F.col(value_col)).over(local_w).cast("long")
        )
        .join(F.broadcast(off), cond)
        .withColumn(sum_col, (F.col(_OFFSET) + F.col(_LOCAL)).cast("long"))
    )
    return out.select(*df.columns, sum_col)


def _idiv(a: Column, b: Column) -> Column:
    """True BIGINT division (SQL ``div``) — no double rounding at any
    magnitude, unlike ``floor(a / b)`` which goes through a 53-bit
    mantissa."""
    return F.call_function("div", a, b)


def ntile_from_rank(rank: Column, n_rows: Column, n: int) -> Column:
    """SQL ``ntile(n)`` as a pure integer expression of (rank, group
    size): the first ``N mod n`` buckets take ``N div n + 1`` rows, the
    rest ``N div n`` — identical in Spark and DuckDB, so results derived
    this way hash-match a real ntile window.  Integer ops only (no
    double division to drift)."""
    q = _idiv(n_rows, F.lit(n))
    r = n_rows % n
    big = q + 1
    head = r * big  # rows covered by the (q+1)-sized leading buckets
    return (
        F.when(rank <= head, _idiv(rank - 1, big) + 1)
        .otherwise(r + _idiv(rank - head - 1, F.greatest(q, F.lit(1))) + 1)
        .cast("int")
    )


def percent_rank_from_rank(rank: Column, n_rows: Column) -> Column:
    """``percent_rank()`` for a TOTAL order (rank == row_number):
    ``(rank - 1) / (N - 1)``, 0.0 for single-row groups — the same
    double division both engines perform internally."""
    return F.when(n_rows > 1, (rank - 1) / (n_rows - 1)).otherwise(F.lit(0.0))


def cume_dist_from_rank(rank: Column, n_rows: Column) -> Column:
    """``cume_dist()`` for a TOTAL order: ``rank / N``."""
    return rank / n_rows
