"""Graph-analytics query pack — PageRank over the customer↔supplier
trade network.

Nodes are customers (even ids, ``2*custkey``) and suppliers (odd ids,
``2*suppkey + 1``); an undirected edge links a customer to every supplier
that shipped one of its orders (orders ⋈ lineitem, distinct pairs, both
directions materialized so every vertex has out-degree >= 1).  Two
damped iterations, unrolled into CTEs on the oracle side exactly like
the k-means oracle (plans/similarity_queries.py::_kmeans_oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipelines_using_llm_spark.operators.graph import DAMPING, pagerank
from data_pipelines_using_llm_spark.registry import QuerySpec
from data_pipelines_using_llm_spark.sources.tables import load_table

PR_ITERS = 2

# 2^50 in E-notation so DuckDB parses it as DOUBLE (a plain decimal
# literal would be DECIMAL); must mirror operators/graph.py::QUANT_SCALE.
QUANT_SQL = "1125899906842624e0"


def supplier_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality of every customer and supplier in the trade
    graph, normalized so the graph-wide mean is 1.0."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("cnode"),
            (F.col("l_suppkey") * 2 + 1).alias("snode"),
        )
        .distinct()
    )
    edges = pairs.select(
        F.col("cnode").alias("src"), F.col("snode").alias("dst")
    ).union(pairs.select(F.col("snode").alias("src"), F.col("cnode").alias("dst")))
    pr = pagerank(edges, iters=PR_ITERS, damping=DAMPING)
    n_df = pr.agg(F.count(F.lit(1)).alias("n"))
    return pr.crossJoin(F.broadcast(n_df)).select(
        F.when(F.col("node") % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("supplier"))
        .alias("node_type"),
        (F.col("node") / 2).cast("long").alias("node_key"),
        F.round(F.col("r") * F.col("n"), 6).alias("pr_score"),
    )


def _pagerank_oracle(iters: int = PR_ITERS, damping: float = DAMPING) -> str:
    ctes = [
        """pairs AS (
    SELECT DISTINCT o.o_custkey * 2 AS cnode, l.l_suppkey * 2 + 1 AS snode
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
)""",
        """edges AS (
    SELECT cnode AS src, snode AS dst FROM pairs
    UNION ALL
    SELECT snode AS src, cnode AS dst FROM pairs
)""",
        "deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src)",
        """nodes AS (
    SELECT DISTINCT src AS node FROM edges
    UNION
    SELECT DISTINCT dst AS node FROM edges
)""",
        "nn AS (SELECT count(*) AS n FROM nodes)",
        "r0 AS (SELECT node, 1.0 / n AS r FROM nodes CROSS JOIN nn)",
    ]
    prev = "r0"
    for it in range(1, iters + 1):
        ctes.append(
            f"""c{it} AS (
    SELECT e.dst AS node,
           CAST(sum(CAST(floor(r.r / d.deg * {QUANT_SQL}) AS BIGINT))
                AS DOUBLE) / {QUANT_SQL} AS s
    FROM edges e
    JOIN {prev} r ON r.node = e.src
    JOIN deg d ON d.src = e.src
    GROUP BY e.dst
)"""
        )
        ctes.append(
            f"""r{it} AS (
    SELECT nd.node, {1 - damping!r} / nn.n + {damping!r} * coalesce(c.s, 0.0) AS r
    FROM nodes nd CROSS JOIN nn LEFT JOIN c{it} c ON c.node = nd.node
)"""
        )
        prev = f"r{it}"
    joined = ",\n".join(ctes)
    return f"""
WITH {joined}
SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_type,
       CAST(node // 2 AS BIGINT) AS node_key,
       round(r * nn.n, 6) AS pr_score
FROM {prev} CROSS JOIN nn
"""


def money_flow_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the DIRECTED money-flow graph (customer → every
    supplier that shipped one of its orders): suppliers never buy, so
    every supplier vertex is a genuine sink — the query that hash-gates
    the ``dangling="redistribute"`` random-surfer completion
    (operators/graph.py) rather than the error-on-dangling contract
    ``supplier_pagerank`` exercises.

    Per iteration the rank mass stranded on sinks is folded into one
    scalar (fixed-point quantized sum — deterministic AND map-side
    combinable) and redistributed uniformly, so ranks keep summing to ~1.  Scale
    shape is identical to ``supplier_pagerank``: one equi-join + one
    keyed aggregation per round, loop-invariant graph behind a barrier;
    the leak is a one-row broadcast.
    """
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    pr = pagerank(edges, iters=PR_ITERS, damping=DAMPING, dangling="redistribute")
    n_df = pr.agg(F.count(F.lit(1)).alias("n"))
    return pr.crossJoin(F.broadcast(n_df)).select(
        F.when(F.col("node") % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("supplier"))
        .alias("node_type"),
        (F.col("node") / 2).cast("long").alias("node_key"),
        F.round(F.col("r") * F.col("n"), 6).alias("pr_score"),
    )


def _pagerank_redistribute_oracle(
    iters: int = PR_ITERS, damping: float = DAMPING
) -> str:
    """Unrolled redistribute-mode oracle: each round adds a ``leak{it}``
    scalar CTE (fixed-point quantized sum of the previous round's rank
    over the sink set — mirroring the operator's
    ``sum(floor(r * 2^50))`` int64 fold) whose uniform share joins the
    damped update."""
    ctes = [
        """edges AS (
    SELECT DISTINCT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
)""",
        "deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src)",
        """nodes AS (
    SELECT DISTINCT src AS node FROM edges
    UNION
    SELECT DISTINCT dst AS node FROM edges
)""",
        """sinks AS (
    SELECT node FROM nodes WHERE node NOT IN (SELECT src FROM edges)
)""",
        "nn AS (SELECT count(*) AS n FROM nodes)",
        "r0 AS (SELECT node, 1.0 / n AS r FROM nodes CROSS JOIN nn)",
    ]
    prev = "r0"
    for it in range(1, iters + 1):
        ctes.append(
            f"""c{it} AS (
    SELECT e.dst AS node,
           CAST(sum(CAST(floor(r.r / d.deg * {QUANT_SQL}) AS BIGINT))
                AS DOUBLE) / {QUANT_SQL} AS s
    FROM edges e
    JOIN {prev} r ON r.node = e.src
    JOIN deg d ON d.src = e.src
    GROUP BY e.dst
)"""
        )
        ctes.append(
            f"""leak{it} AS (
    SELECT coalesce(CAST(sum(CAST(floor(r.r * {QUANT_SQL}) AS BIGINT))
               AS DOUBLE), 0.0) / {QUANT_SQL} AS leak
    FROM {prev} r JOIN sinks s ON s.node = r.node
)"""
        )
        ctes.append(
            f"""r{it} AS (
    SELECT nd.node,
           {1 - damping!r} / nn.n
           + {damping!r} * (coalesce(c.s, 0.0) + lk.leak / nn.n) AS r
    FROM nodes nd CROSS JOIN nn CROSS JOIN leak{it} lk
    LEFT JOIN c{it} c ON c.node = nd.node
)"""
        )
        prev = f"r{it}"
    joined = ",\n".join(ctes)
    return f"""
WITH {joined}
SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_type,
       CAST(node // 2 AS BIGINT) AS node_key,
       round(r * nn.n, 6) AS pr_score
FROM {prev} CROSS JOIN nn
"""


def basket_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the part co-purchase ("market basket") graph:
    parts are linked when they appear in the same order; the output is
    each part's triangle participation count — the local clustering
    signal a recommender uses to find stable product cliques.

    The graph is sparse by construction (baskets are small: edge count
    is Σ C(items_per_order, 2) ≈ 6x orders, nodes = parts), which is
    exactly the regime triangle counting is meant for — unlike the
    co-supplier projection, which is near-complete and degenerate.

    Scale: pair generation is a self-equi-join on l_orderkey (per-order
    fanout bounded by basket size); enumeration is degree-ordered
    (operators/graph.py::triangle_counts) so wedge volume is O(m^1.5)
    with no celebrity-key blowup.  The oracle enumerates a<b<c directly
    — the degree orientation is a physical optimization whose output is
    provably orientation-invariant.
    """
    from data_pipelines_using_llm_spark.operators.graph import triangle_counts

    op = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    a, b = op.alias("a"), op.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")),
        )
        .select(F.col("a.p").alias("u"), F.col("b.p").alias("v"))
        .distinct()
    )
    return triangle_counts(edges).select(
        F.col("node").alias("part_id"), "n_triangles"
    )


BASKET_TRIANGLES_ORACLE = """
WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
e AS (
    SELECT DISTINCT a.p AS u, b.p AS v
    FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
),
tri AS (
    SELECT e1.u AS a, e1.v AS b, e2.v AS c
    FROM e e1
    JOIN e e2 ON e2.u = e1.v
    JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
)
SELECT part_id, count(*) AS n_triangles
FROM (
    SELECT a AS part_id FROM tri
    UNION ALL SELECT b FROM tri
    UNION ALL SELECT c FROM tri
)
GROUP BY part_id
"""


QUERIES = {
    "supplier_pagerank": QuerySpec(
        supplier_pagerank,
        _pagerank_oracle(),
        "PageRank over the customer-supplier trade graph (2 damped rounds)",
    ),
    "basket_triangles": QuerySpec(
        basket_triangles,
        BASKET_TRIANGLES_ORACLE,
        "degree-ordered triangle census of the part co-purchase graph",
    ),
    "money_flow_pagerank": QuerySpec(
        money_flow_pagerank,
        _pagerank_redistribute_oracle(),
        "PageRank with dangling-mass redistribution over the directed "
        "customer->supplier purchase graph (every supplier is a sink)",
    ),
}
