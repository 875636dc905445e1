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
fold would be a plain ``sum()`` — PageRank tolerates summation-order noise
— so the in-degree-bounded ``collect_list`` is a test-oracle choice, not
the 100 TB hot path; swap one line to switch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAMPING = 0.85


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 2,
    damping: float = DAMPING,
) -> DataFrame:
    """``iters`` rounds of PageRank over directed ``edges``.

    Callers should supply a graph where every vertex has out-degree >= 1
    (e.g. both directions of an undirected graph) — dangling-mass
    redistribution is deliberately out of scope.  Returns (node, r) with
    ``r`` the raw rank (sums to ~1 over the graph).
    """
    edges = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
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
        summed = contrib.groupBy("dst").agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("src", "c"))),
                F.lit(0.0),
                lambda acc, s: acc + s["c"],
            ).alias("s")
        )
        rank = (
            nodes.join(summed.withColumnRenamed("dst", "node"), "node", "left")
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
