"""Incremental gold-table maintenance: fold a new batch's PARTIAL
aggregates into a persisted rollup without recomputing history.

The reference recomputes its gold monthly averages from the full silver
table every run (``Second Experiment/Claude Opus 4.py:309-312`` overwrites
``air_quality_monthly_avg`` from scratch).  At 100 TB that is a full-table
scan per refresh; the scalable shape is algebraic-aggregate maintenance:

- the stored rollup keeps MERGEABLE state per group — row counts and
  decimal sums (exact, order-independent: functions/exact.py) — never
  finalized ratios;
- a new batch contributes one tiny partial-aggregate DataFrame (its own
  groups only), merged by addition: ``(old ⊎ delta).groupBy(keys).sum``;
- derived metrics (averages) are computed AT READ TIME from sums/counts,
  so they are always consistent with the merged state.

Replay safety: ``incremental_rollup`` takes an optional ``batch_id`` and
keeps an applied-batch ledger next to the table; re-applying a batch id is
a no-op, so at-least-once schedulers (the reference's "re-run the
notebook" model) cannot double-count a batch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipelines_using_llm_spark.functions.exact import MONEY, dec
from data_pipelines_using_llm_spark.sinks.writers import (
    _has_data_files,
    _swap_in,
    write_table,
)

_LEDGER_DIR = "_applied_batches"


def rollup_batch(
    df: DataFrame, keys: list[str], sum_cols: list[str], typ: str = MONEY
) -> DataFrame:
    """The batch's partial aggregate: per-group row count + exact decimal
    sums — the mergeable state, computed with map-side partials so only
    distinct groups shuffle."""
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[F.sum(dec(c, typ)).alias(f"sum_{c}") for c in sum_cols],
    )


def merge_rollups(a: DataFrame, b: DataFrame, keys: list[str]) -> DataFrame:
    """Fold two rollup states: union then re-add per group.  Decimal sums
    add exactly, so merge order never changes a bit."""
    metric_cols = [c for c in a.columns if c not in keys]
    return (
        a.unionByName(b)
        .groupBy(*keys)
        .agg(*[F.sum(c).alias(c) for c in metric_cols])
    )


def finalize_rollup(state: DataFrame, sum_cols: list[str]) -> DataFrame:
    """Read-time view: exact sums as doubles plus derived averages —
    always consistent with the merged state."""
    out = state
    for c in sum_cols:
        out = out.withColumn(f"sum_{c}_d", F.col(f"sum_{c}").cast("double"))
        out = out.withColumn(
            f"avg_{c}", F.col(f"sum_{c}").cast("double") / F.col("n_rows")
        )
    return out.select(
        *[c for c in state.columns if not c.startswith("sum_")],
        *[F.col(f"sum_{c}_d").alias(f"sum_{c}") for c in sum_cols],
        *[f"avg_{c}" for c in sum_cols],
    )


def incremental_rollup(
    spark: SparkSession,
    batch: DataFrame,
    path: str,
    keys: list[str],
    sum_cols: list[str],
    batch_id: str | None = None,
    typ: str = MONEY,
) -> None:
    """Apply one batch to the persisted rollup at ``path``.

    Cost is |batch| + |rollup| (the rollup is group-cardinality-sized —
    tiny relative to the fact table), not |history|.  With ``batch_id``
    set, an already-applied id is skipped (ledger marker files), making
    replays no-ops."""
    ledger = os.path.join(path.rstrip("/") + "_meta", _LEDGER_DIR)
    if batch_id is not None:
        marker = os.path.join(ledger, batch_id)
        if os.path.exists(marker):
            return

    delta = rollup_batch(batch, keys, sum_cols, typ)
    if _has_data_files(path):
        state = merge_rollups(spark.read.parquet(path), delta, keys)
        tmp = path.rstrip("/") + "__tmp_rollup"
        write_table(state, tmp, mode="overwrite")
        _swap_in(path, tmp)
    else:
        write_table(delta, path, mode="overwrite")

    if batch_id is not None:
        os.makedirs(ledger, exist_ok=True)
        with open(os.path.join(ledger, batch_id), "w") as fh:
            fh.write("applied")


def read_rollup(
    spark: SparkSession, path: str, sum_cols: list[str]
) -> DataFrame:
    """The finalized (sums-as-double + averages) view of the rollup."""
    return finalize_rollup(spark.read.parquet(path), sum_cols)
