"""Context-window packing: assign documents to fixed-size training
contexts by cumulative token count.

The step between a curated corpus and a token dataloader: documents are
laid end-to-end in a deterministic order and cut into ``ctx_len``-token
windows; each document's window id and intra-window offset are pure
functions of the running sum, so any engine reproduces the same layout
(and the DuckDB oracle checks it row-for-row).

This is APPROXIMATE packing (the industry-standard concatenate-and-chunk):
a document whose tokens straddle a boundary spans adjacent windows —
``spans_boundary`` flags those rows for loaders that mask cross-document
attention.  Exact first-fit bin packing is inherently sequential and
buys little at pretraining scale.

Scale shape: ONE window (sort) per shard — ``shard_col`` bounds the sort
width, so a 100 TB corpus packs as |shards| independent sorted streams
(exactly how a distributed token-writer shards its output files).  A
global pack (shard_col=None) is a single-partition sort: fine for tests,
wrong at scale — always shard in production.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pack_contexts(
    df: DataFrame,
    id_col: str,
    token_col: str,
    ctx_len: int,
    shard_col: str | None = None,
    out_prefix: str = "pack",
) -> DataFrame:
    """Add ``<prefix>_id`` (window index within the shard), ``
    <prefix>_offset`` (token offset inside the window where this document
    starts) and ``spans_boundary`` columns.

    Documents are ordered by ``id_col`` within each shard; the exclusive
    running token sum places each document, ``floor/mod ctx_len`` convert
    placement to (window, offset).
    """
    if ctx_len <= 0:
        raise ValueError(f"ctx_len must be positive, got {ctx_len}")
    part = [shard_col] if shard_col else []
    w = (
        Window.partitionBy(*part)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_excl: Column = F.coalesce(F.sum(token_col).over(w), F.lit(0)).cast("long")
    start = cum_excl
    end = cum_excl + F.col(token_col) - 1  # last token of this document

    # BIGINT `div`, not floor(a/b): the cumulative token sum of a shard is
    # unbounded, and double division silently misplaces windows once it
    # crosses the 2^53 mantissa — integer division has no such cliff.
    def _win(c: Column) -> Column:
        return F.call_function("div", c, F.lit(ctx_len).cast("long"))

    return (
        df.withColumn(f"{out_prefix}_id", _win(start))
        .withColumn(f"{out_prefix}_offset", start % ctx_len)
        .withColumn("spans_boundary", (_win(end) > _win(start)).cast("int"))
    )


def sql_pack_contexts(
    id_expr: str,
    token_expr: str,
    ctx_len: int,
    shard_expr: str | None = None,
    out_prefix: str = "pack",
) -> str:
    """DuckDB SELECT-list fragment mirroring :func:`pack_contexts`
    (prepend the source columns yourself)."""
    part = f"PARTITION BY {shard_expr} " if shard_expr else ""
    cum = (
        f"CAST(coalesce(sum({token_expr}) OVER ({part}ORDER BY {id_expr} "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)"
    )
    # `//` = DuckDB integer division, mirroring Spark's `div` above.
    return (
        f"CAST({cum} // {ctx_len} AS BIGINT) AS {out_prefix}_id, "
        f"{cum} % {ctx_len} AS {out_prefix}_offset, "
        f"CAST(CASE WHEN ({cum} + {token_expr} - 1) // {ctx_len} "
        f"> {cum} // {ctx_len} THEN 1 ELSE 0 END AS INT) AS spans_boundary"
    )
