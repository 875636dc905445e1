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
            sink_ranks = rank.join(sinks, "node", "left_semi")
            if exact_fold:
                # oracle-determinism path: the leak scalar is a SORTED
                # fold over (node, r) — bit-identical to the oracle's
                # array_agg(r ORDER BY node) + list_reduce.  Production
                # (exact_fold=False) uses the plain sum below: PageRank
                # tolerates the ~1e-16 summation-order noise and a
                # collect_list over ALL sinks has no business at 100 TB.
                leak = sink_ranks.agg(
                    F.aggregate(
                        F.array_sort(F.collect_list(F.struct("node", "r"))),
                        F.lit(0.0),
                        lambda acc, s: acc + s["r"],
                    ).alias("leak")
                )
            else:
                leak = sink_ranks.agg(
                    F.coalesce(F.sum("r"), F.lit(0.0)).alias("leak")
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


def triangle_counts(edges: DataFrame, u_col: str = "u", v_col: str = "v") -> DataFrame:
    """Per-vertex triangle participation counts over an undirected graph
    given as canonical edges (``u < v``, deduplicated by the caller).

    Algorithm: degree-ordered enumeration (Latapy's compact-forward /
    the MapReduce formulation of Suri & Vassilvitskii's "Counting
    Triangles and the Curse of the Last Reducer").  Every edge is
    oriented from its lower-rank endpoint to its higher-rank endpoint
    under the total order ``(degree, vertex_id)``; a triangle is then
    counted exactly once as a wedge ``x→y, x→z`` (with rank(y) <
    rank(z)) closed by the oriented edge ``y→z``.

    Why the orientation matters at 100 TB: with arbitrary orientation a
    celebrity vertex of degree d yields O(d²) wedges in one task — the
    "curse of the last reducer".  Ordering by degree bounds every
    out-degree by O(√m), so total wedge count is O(m^{3/2}) and no
    single key dominates; both wedge-build and closure are plain
    equi-joins (wedge join on the low vertex, closure on the (y, z)
    pair) that AQE can further split.  The output is
    orientation-invariant — the oracle may enumerate ``a<b<c`` directly.

    Returns (node, n_triangles) for vertices in >= 1 triangle.
    """
    e = barrier(
        edges.select(F.col(u_col).alias("u"), F.col(v_col).alias("v"))
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    with_deg = (
        e.join(deg.select(F.col("node").alias("u"), F.col("deg").alias("du")), "u")
        .join(deg.select(F.col("node").alias("v"), F.col("deg").alias("dv")), "v")
    )
    u_first = F.struct(F.col("du"), F.col("u")) < F.struct(F.col("dv"), F.col("v"))
    oriented = barrier(
        with_deg.select(
            F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("lo"),
            F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("hi"),
            F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("dhi"),
        )
    )
    e1 = oriented.select(
        F.col("lo").alias("x"), F.col("hi").alias("y"), F.col("dhi").alias("dy")
    )
    e2 = oriented.select(
        F.col("lo").alias("x"), F.col("hi").alias("z"), F.col("dhi").alias("dz")
    )
    wedges = e1.join(e2, "x").filter(
        F.struct(F.col("dy"), F.col("y")) < F.struct(F.col("dz"), F.col("z"))
    )
    closed = wedges.join(
        oriented.select(F.col("lo").alias("y"), F.col("hi").alias("z")),
        ["y", "z"],
    )
    return (
        closed.select(
            F.explode(F.array(F.col("x"), F.col("y"), F.col("z"))).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
