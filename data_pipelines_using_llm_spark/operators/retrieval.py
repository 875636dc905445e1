"""Distributed BM25 keyword retrieval over a document corpus.

The classic inverted-index ranking function (Robertson BM25, the
Okapi/Lucene default: k1=1.2, b=0.75), expressed as the canonical
distributed index build:

- ``explode(tokens)`` -> one shuffle on (doc, term) builds term
  frequencies; doc lengths fall out of the same exploded relation.
- document frequencies are computed ONLY for the query vocabulary
  (semi-join first), so the df table is |query terms| rows and
  broadcasts — the full-vocabulary df table is never materialized.
- corpus stats (N, total length) are a single-row aggregate, broadcast.
- per-(query, doc) scores sum term contributions with a SORTED
  sequential fold (array_sort + aggregate), so the double summation
  order is deterministic and bit-identical to the DuckDB oracle's
  ``array_agg(... ORDER BY term)`` + ``list_reduce`` — same discipline
  as operators/similarity.py::dot.
- ranking orders by the ROUNDED score (6 dp) with doc_id tiebreak:
  a last-ulp difference between engines' ``ln`` can never flip a rank
  unless it also flips the rounded value the hash compares anyway.

At 100 TB: the only corpus-sized shuffles are the two groupBys over the
exploded tokens (tf and dl) and the tf->dl doc_id join; everything
query-sided (terms, df, stats) broadcasts.  Top-k per query is a window
over |queries| x |matching docs| — bounded by making queries selective,
or by pre-aggregating per-partition top-k as in similarity.knn_arrow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_pipelines_using_llm_spark.operators.text import tokens

BM25_K1 = 1.2
BM25_B = 0.75


def bm25_topk(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    queries: list[tuple[int, list[str]]],
    k: int = 10,
) -> DataFrame:
    """Top-``k`` documents per keyword query by BM25 score.

    ``queries`` is a list of ``(query_id, [terms])``; duplicate terms
    within a query are collapsed (classic BM25 ignores query-side tf for
    short queries).  Output: (query_id, doc_id, bm25, rank).
    """
    spark = docs.sparkSession
    toks = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_len")
    )
    qdf = spark.createDataFrame(
        [(qid, t) for qid, terms in queries for t in sorted(set(terms))],
        "query_id bigint, term string",
    )
    dfreq = (
        tf.join(F.broadcast(qdf.select("term").distinct()), "term")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    den = F.col("tf") + F.lit(BM25_K1) * (
        F.lit(1 - BM25_B)
        + F.lit(BM25_B) * F.col("dl") / (F.col("total_len") / F.col("n_docs"))
    )
    contrib = (
        tf.join(F.broadcast(qdf), "term")
        .join(dl, "doc_id")
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "doc_id",
            "term",
            ((idf * (F.col("tf") * F.lit(BM25_K1 + 1))) / den).alias("contrib"),
        )
    )
    scored = contrib.groupBy("query_id", "doc_id").agg(
        F.round(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("term", "contrib"))),
                F.lit(0.0),
                lambda acc, s: acc + s["contrib"],
            ),
            6,
        ).alias("bm25")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("bm25").desc(), F.col("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "bm25", "rank")
    )
