"""Keyword-retrieval query pack over ``documents`` — BM25 top-k.

The oracle SQL is generated from the SAME constants (query set, k1, b)
as the Spark operator, with the per-(query, doc) term contributions
summed in sorted-term order on both engines so the doubles agree
bit-for-bit (see operators/retrieval.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from data_pipelines_using_llm_spark.operators import retrieval as RET
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


def _bm25_oracle() -> str:
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
) WHERE rank <= {BM25_K}
"""


QUERIES = {
    "doc_bm25_search": QuerySpec(
        doc_bm25_search, _bm25_oracle(), "BM25 keyword top-k (inverted-index build)"
    ),
}
