"""Keyword-retrieval query pack over ``documents`` — BM25 top-k.

The oracle SQL is generated from the SAME constants (query set, k1, b)
as the Spark operator, with the per-(query, doc) term contributions
summed in sorted-term order on both engines so the doubles agree
bit-for-bit (see operators/retrieval.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipelines_using_llm_spark.operators import retrieval as RET
from data_pipelines_using_llm_spark.operators import similarity as SIM
from data_pipelines_using_llm_spark.registry import QuerySpec
from data_pipelines_using_llm_spark.sources.tables import load_table

# Multi-term keyword queries over the corpus vocabulary.
BM25_QUERIES: list[tuple[int, list[str]]] = [
    (0, ["hash", "join", "table"]),
    (1, ["stream", "window", "batch"]),
    (2, ["vector", "scan", "filter"]),
    (3, ["customer", "order", "merge"]),
]
BM25_K = 10


def doc_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 documents for each of four keyword queries."""
    d = load_table(spark, sf_dir, "documents")
    return RET.bm25_topk(d, "doc_id", "text", BM25_QUERIES, BM25_K)


def _bm25_oracle(k: int = BM25_K) -> str:
    rows = ", ".join(
        f"({qid}, '{t}')"
        for qid, terms in BM25_QUERIES
        for t in sorted(set(terms))
    )
    k1, b = RET.BM25_K1, RET.BM25_B
    return f"""
WITH tok AS (
    SELECT doc_id,
           unnest(list_filter(string_split_regex(trim(text), '\\s+'),
                              x -> x != '')) AS term
    FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
stats AS (SELECT count(*) AS n_docs, sum(dl) AS total_len FROM dl),
q AS (SELECT CAST(query_id AS BIGINT) AS query_id, term
      FROM (VALUES {rows}) AS t(query_id, term)),
dfreq AS (
    SELECT term, count(*) AS df FROM tf
    WHERE term IN (SELECT term FROM q) GROUP BY term
),
contrib AS (
    SELECT q.query_id, tf.doc_id, tf.term,
           (ln(1.0 + (s.n_docs - f.df + 0.5) / (f.df + 0.5))
            * (tf.tf * {k1 + 1!r}))
           / (tf.tf + {k1!r} * ({1 - b!r} + {b!r} * dl.dl
                                / (s.total_len / s.n_docs))) AS contrib
    FROM tf
    JOIN q ON q.term = tf.term
    JOIN dl ON dl.doc_id = tf.doc_id
    JOIN dfreq f ON f.term = tf.term
    CROSS JOIN stats s
),
scored AS (
    SELECT query_id, doc_id,
           round(list_reduce(list_prepend(0.0,
                     array_agg(contrib ORDER BY term)),
                 (acc, x) -> acc + x), 6) AS bm25
    FROM contrib GROUP BY query_id, doc_id
)
SELECT query_id, doc_id, bm25, CAST(rank AS INT) AS rank FROM (
    SELECT query_id, doc_id, bm25,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY bm25 DESC, doc_id) AS rank
    FROM scored
) WHERE rank <= {k}
"""


# ---- Hybrid retrieval: reciprocal-rank fusion of BM25 + embedding kNN ----

HYBRID_LIST_K = 20  # depth of each per-system rank list
HYBRID_TOP = 10  # fused results emitted per query
RRF_C = 60  # the standard RRF damping constant (Cormack et al.)
ANCHOR_MOD = 100  # semantic anchor for query q is embedding vec_id = q*100


def hybrid_rrf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid lexical+semantic retrieval via reciprocal-rank fusion.

    Each query has a lexical form (the ``BM25_QUERIES`` keyword set) and
    a semantic form (the embedding of anchor doc ``query_id * 100`` —
    doc_id and vec_id are 1:1 in the corpus).  Both systems produce a
    top-20 rank list; RRF fuses them:

        rrf(d) = sum over systems of 1 / (60 + rank_sys(d))

    with a missing entry contributing 0.  Ranks are small exact
    integers, so the fused doubles are bit-identical across engines (two
    reciprocals + one addition in a fixed lexical-then-semantic order) —
    no rounding tricks needed for the ordering to agree.

    Plan shape: the BM25 side is the inverted-index build of
    ``doc_bm25_search`` (operators/retrieval.py — query-vocabulary df
    broadcast, two exploded-token groupBys); the semantic side is
    ``similarity.knn_brute_force`` (4-row anchor set broadcast against
    the corpus, never the corpus against itself); the fusion itself is a
    full-outer join of two |queries| x 20 rank lists — trivially tiny at
    any corpus scale.
    """
    docs = load_table(spark, sf_dir, "documents")
    lex = RET.bm25_topk(
        docs, "doc_id", "text", BM25_QUERIES, HYBRID_LIST_K
    ).select("query_id", "doc_id", F.col("rank").alias("lex_rank"))

    emb = load_table(spark, sf_dir, "embeddings")
    n_q = len(BM25_QUERIES)
    sem = (
        SIM.knn_brute_force(emb, "vec_id", "embedding", ANCHOR_MOD, HYBRID_LIST_K)
        .filter(F.col("query_id") < ANCHOR_MOD * n_q)
        .select(
            (F.col("query_id") / ANCHOR_MOD).cast("long").alias("query_id"),
            F.col("neighbor_id").alias("doc_id"),
            F.col("rank").alias("sem_rank"),
        )
    )

    fused = lex.join(sem, ["query_id", "doc_id"], "full_outer")
    rrf = F.coalesce(
        F.lit(1.0) / (F.lit(RRF_C) + F.col("lex_rank")), F.lit(0.0)
    ) + F.coalesce(
        F.lit(1.0) / (F.lit(RRF_C) + F.col("sem_rank")), F.lit(0.0)
    )
    w = Window.partitionBy("query_id").orderBy(F.col("rrf_raw").desc(), "doc_id")
    return (
        fused.withColumn("rrf_raw", rrf)
        .withColumn("fused_rank", F.row_number().over(w))
        .filter(F.col("fused_rank") <= HYBRID_TOP)
        .select(
            "query_id",
            "doc_id",
            F.coalesce("lex_rank", F.lit(0)).alias("lex_rank"),
            F.coalesce("sem_rank", F.lit(0)).alias("sem_rank"),
            F.round("rrf_raw", 6).alias("rrf"),
            "fused_rank",
        )
    )


def _hybrid_oracle() -> str:
    from data_pipelines_using_llm_spark.plans.similarity_queries import (
        _SQL_BASE,
        _sql_dot,
    )

    n_q = len(BM25_QUERIES)
    return f"""
WITH lex AS (
    SELECT query_id, doc_id, rank AS lex_rank FROM ({_bm25_oracle(HYBRID_LIST_K)})
),
sem AS (
    WITH {_SQL_BASE},
    q AS (SELECT vec_id AS aid, v AS qv, nrm AS qnrm FROM n
          WHERE vec_id % {ANCHOR_MOD} = 0 AND vec_id < {ANCHOR_MOD * n_q}),
    scored AS (
        SELECT CAST(q.aid / {ANCHOR_MOD} AS BIGINT) AS query_id,
               c.vec_id AS doc_id,
               {_sql_dot('q.qv', 'c.v')} / (q.qnrm * c.nrm) AS cos
        FROM q JOIN n c ON c.vec_id != q.aid
    ),
    ranked AS (
        SELECT query_id, doc_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, doc_id) AS sem_rank
        FROM scored
    )
    SELECT query_id, doc_id, sem_rank FROM ranked WHERE sem_rank <= {HYBRID_LIST_K}
),
fused AS (
    SELECT coalesce(l.query_id, s.query_id) AS query_id,
           coalesce(l.doc_id, s.doc_id) AS doc_id,
           l.lex_rank, s.sem_rank,
           coalesce(CAST(1.0 AS DOUBLE) / ({RRF_C} + l.lex_rank), 0.0)
           + coalesce(CAST(1.0 AS DOUBLE) / ({RRF_C} + s.sem_rank), 0.0)
               AS rrf_raw
    FROM lex l FULL OUTER JOIN sem s
      ON s.query_id = l.query_id AND s.doc_id = l.doc_id
)
SELECT query_id, doc_id,
       CAST(coalesce(lex_rank, 0) AS INT) AS lex_rank,
       CAST(coalesce(sem_rank, 0) AS INT) AS sem_rank,
       round(rrf_raw, 6) AS rrf,
       CAST(fused_rank AS INT) AS fused_rank
FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY rrf_raw DESC, doc_id) AS fused_rank
    FROM fused
)
WHERE fused_rank <= {HYBRID_TOP}
"""


QUERIES = {
    "doc_bm25_search": QuerySpec(
        doc_bm25_search, _bm25_oracle(), "BM25 keyword top-k (inverted-index build)"
    ),
    "hybrid_rrf_search": QuerySpec(
        hybrid_rrf_search,
        _hybrid_oracle(),
        "reciprocal-rank fusion of BM25 + embedding kNN",
    ),
}
