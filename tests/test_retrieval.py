"""BM25 retrieval operator — formula and shape checks."""

from __future__ import annotations

import math

import pytest

from data_pipelines_using_llm_spark.operators.retrieval import (
    BM25_B,
    BM25_K1,
    bm25_topk,
)
from data_pipelines_using_llm_spark.plans import retrieval_queries as RQ


def _bm25_ref(tf: int, df: int, dl: int, n_docs: int, total_len: int) -> float:
    """Reference scalar BM25 contribution (same arithmetic order)."""
    idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
    return (idf * (tf * (BM25_K1 + 1))) / (
        tf + BM25_K1 * (1 - BM25_B + BM25_B * dl / (total_len / n_docs))
    )


def test_bm25_matches_hand_computation(spark):
    docs = spark.createDataFrame(
        [
            (1, "cat dog cat"),
            (2, "dog fish"),
            (3, "cat cat cat cat bird bird"),
        ],
        "doc_id bigint, text string",
    )
    out = {
        (r["query_id"], r["doc_id"]): r["bm25"]
        for r in bm25_topk(docs, "doc_id", "text", [(0, ["cat", "bird"])], 3).collect()
    }
    # corpus: N=3, total_len=11; 'cat' df=2, 'bird' df=1
    exp1 = _bm25_ref(2, 2, 3, 3, 11)
    exp3 = _bm25_ref(4, 2, 6, 3, 11) + _bm25_ref(2, 1, 6, 3, 11)
    assert out[(0, 1)] == pytest.approx(exp1, abs=1e-6)
    assert out[(0, 3)] == pytest.approx(exp3, abs=1e-6)
    assert (0, 2) not in out  # doc 2 matches no query term


def test_bm25_ranks_term_dense_docs_higher(spark):
    """More matching occurrences in a same-length doc => higher rank."""
    docs = spark.createDataFrame(
        [(1, "cat cat cat pad"), (2, "cat pad pad pad"), (3, "pad pad pad pad")],
        "doc_id bigint, text string",
    )
    rows = bm25_topk(docs, "doc_id", "text", [(7, ["cat"])], 5).collect()
    ranked = [r["doc_id"] for r in sorted(rows, key=lambda r: r["rank"])]
    assert ranked == [1, 2]


def test_bm25_query_pack_shape(spark):
    sf = "/root/testdata/sf0.001"
    rows = RQ.doc_bm25_search(spark, sf).collect()
    per_q: dict[int, list] = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r)
    assert set(per_q) == {q for q, _ in RQ.BM25_QUERIES}
    for q, rs in per_q.items():
        assert len(rs) <= RQ.BM25_K
        ranks = sorted(r["rank"] for r in rs)
        assert ranks == list(range(1, len(rs) + 1))
        by_rank = sorted(rs, key=lambda r: r["rank"])
        scores = [r["bm25"] for r in by_rank]
        assert scores == sorted(scores, reverse=True)


def test_unigram_logprob_flags_rare_token_docs(spark):
    """A doc made of corpus-rare tokens must score below a doc made of
    corpus-common tokens, and every score is a negative mean log-prob."""
    from data_pipelines_using_llm_spark.plans.text_queries import (
        doc_unigram_logprob,
    )

    sf = "/root/testdata/sf0.001"
    out = doc_unigram_logprob(spark, sf)
    rows = out.collect()
    assert rows and all(r["avg_logprob"] < 0 for r in rows)
    # cross-check n_tokens against the independent token counter
    from data_pipelines_using_llm_spark.operators import text as TX
    from data_pipelines_using_llm_spark.sources.tables import load_table

    expected = {
        r["doc_id"]: r["n"]
        for r in load_table(spark, sf, "documents")
        .select("doc_id", TX.token_count("text").alias("n"))
        .collect()
        if r["n"] > 0
    }
    got = {r["doc_id"]: r["n_tokens"] for r in rows}
    assert got == expected
    # discriminates: the corpus is zipfian, so scores genuinely spread
    scores = sorted(r["avg_logprob"] for r in rows)
    assert scores[0] < scores[-1] - 0.1
