"""Iterative graph analytics on DataFrames — PageRank.

The iterative shape on Spark mirrors operators/similarity.py::kmeans_assign:
each round is one equi-join (rank x edges on src) + one keyed aggregation
(contributions by dst), i.e. a single shuffle per iteration on the vertex
id — the canonical distributed PageRank step (same dataflow Pregel/GraphX
lower to, declared here with DataFrame ops so Catalyst/AQE handle skew and
partitioning).

Determinism discipline: per-vertex contribution sums are SORTED folds
(``array_sort(collect_list(struct(src, c)))`` + ``aggregate``), matching
the oracle's ``array_agg(... ORDER BY src)`` + ``list_reduce`` so the
double summation order is bit-identical cross-engine.  At real scale the
fold is a plain ``sum()`` — PageRank tolerates summation-order noise —
selected with ``exact_fold=False`` (tested equivalent to ~1e-12; the
in-degree-bounded ``collect_list`` is the test-oracle choice, not the
100 TB hot path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_pipelines_using_llm_spark.operators.caching import barrier

DAMPING = 0.85


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 2,
    damping: float = DAMPING,
    dangling: str = "error",
    exact_fold: bool = True,
) -> DataFrame:
    """``iters`` rounds of PageRank over directed ``edges``.

    Dangling vertices (out-degree 0, e.g. a pure sink) would silently
    LEAK rank mass — they receive rank but contribute nothing back, so
    ranks stop summing to ~1.  The docstring contract is therefore
    enforced in code, selected by ``dangling``:

    - ``"error"`` (default): one cheap control-plane aggregate (dst
      anti-join src, count) raises ``ValueError`` if any vertex has
      out-degree 0 — callers that guarantee out-degree >= 1 by
      construction (e.g. both directions of an undirected graph, as
      plans/graph_queries.py::supplier_pagerank does) pay one tiny job
      and keep the exact sorted-fold determinism.
    - ``"redistribute"``: per iteration, the rank mass sitting on
      dangling vertices is summed (one scalar broadcast, exact decimal
      so the oracle could mirror it) and redistributed uniformly — the
      standard random-surfer completion; ranks again sum to ~1.

    Returns (node, r) with ``r`` the raw rank (sums to ~1).
    """
    if dangling not in ("error", "redistribute"):
        raise ValueError(f"dangling must be error|redistribute: {dangling!r}")
    # persist the loop-invariant graph structure ONCE (the GraphX-style
    # lineage cut): edges/deg/nodes are referenced by every iteration —
    # without the barrier each round re-runs the distinct + degree
    # shuffles from scratch, and the dangling probe would add a third
    # full derivation on top
    edges = barrier(
        edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        ).distinct()
    )
    deg = barrier(edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg")))
    nodes = barrier(
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    sinks = nodes.join(
        deg.withColumnRenamed("src", "node"), "node", "left_anti"
    )
    if dangling == "error":
        n_dangling = sinks.count()
        if n_dangling:
            raise ValueError(
                f"pagerank: {n_dangling} dangling vertex(es) (out-degree "
                "0) would leak rank mass; add reverse edges or call with "
                "dangling='redistribute'"
            )
    n_df = nodes.agg(F.count(F.lit(1)).alias("n"))
    rank = nodes.crossJoin(F.broadcast(n_df)).select(
        "node", (F.lit(1.0) / F.col("n")).alias("r")
    )
    for _ in range(iters):
        contrib = (
            edges.join(rank.withColumnRenamed("node", "src"), "src")
            .join(deg, "src")
            .select("dst", "src", (F.col("r") / F.col("deg")).alias("c"))
        )
        if exact_fold:
            # oracle-determinism path: sorted fold, bit-identical to the
            # unrolled SQL's array_agg(... ORDER BY src) + list_reduce
            summed = contrib.groupBy("dst").agg(
                F.aggregate(
                    F.array_sort(F.collect_list(F.struct("src", "c"))),
                    F.lit(0.0),
                    lambda acc, s: acc + s["c"],
                ).alias("s")
            )
        else:
            # production path: plain map-side-partial sum — PageRank
            # tolerates summation-order noise; no per-dst array, so
            # in-degree no longer bounds task memory
            summed = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
        if dangling == "redistribute":
            leak = (
                rank.join(sinks, "node", "left_semi")
                .agg(F.coalesce(F.sum("r"), F.lit(0.0)).alias("leak"))
            )
            rank = (
                nodes.join(
                    summed.withColumnRenamed("dst", "node"), "node", "left"
                )
                .crossJoin(F.broadcast(n_df))
                .crossJoin(F.broadcast(leak))
                .select(
                    "node",
                    (
                        F.lit(1 - damping) / F.col("n")
                        + F.lit(damping)
                        * (
                            F.coalesce("s", F.lit(0.0))
                            + F.col("leak") / F.col("n")
                        )
                    ).alias("r"),
                )
            )
        else:
            rank = (
                nodes.join(
                    summed.withColumnRenamed("dst", "node"), "node", "left"
                )
                .crossJoin(F.broadcast(n_df))
                .select(
                    "node",
                    (
                        F.lit(1 - damping) / F.col("n")
                        + F.lit(damping) * F.coalesce("s", F.lit(0.0))
                    ).alias("r"),
                )
            )
    return rank
