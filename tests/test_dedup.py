"""Dedup operator hazards: simhash blocking guarantees and
connected-components convergence (oracle equivalence lives in
test_oracle.py)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from data_pipelines_using_llm_spark.operators import dedup as DD

WORDS = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu nu xi "
    "omicron pi rho sigma tau upsilon phi chi psi omega river stone cloud "
    "ember forest harbor signal copper meadow"
).split()


def _random_docs(spark, n_docs: int, n_chars: int):
    """Docs with varied content but IDENTICAL n_chars — the worst case for
    length-band blocking (every doc lands in one length bucket)."""
    rng = random.Random(7)
    rows = [
        (i, " ".join(rng.choice(WORDS) for _ in range(12)), n_chars)
        for i in range(n_docs)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, n_chars long")


def test_simhash_finds_band_boundary_pairs(spark):
    """Near-identical docs whose lengths straddle a length-band boundary
    (59 vs 61 with band 60) must pair up — the round-1 length-band
    blocking silently dropped these (ADVICE r1)."""
    text = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame(
        [(1, text, 59), (2, text, 61)], "doc_id long, text string, n_chars long"
    )
    pairs = DD.simhash_pairs(df, "doc_id", "text", "n_chars").collect()
    assert len(pairs) == 1
    assert (pairs[0]["doc_id_a"], pairs[0]["doc_id_b"]) == (1, 2)
    assert pairs[0]["hamming"] == 0


def test_simhash_blocking_bounded_under_length_skew(spark):
    """With every document the same length, length-banding degenerates to
    ONE bucket holding all n docs (quadratic); bit-band segments follow
    the content-hash distribution, so the largest (seg_id, seg_val)
    bucket stays a small fraction of the corpus."""
    n_docs = 300
    df = _random_docs(spark, n_docs, n_chars=100)
    sh = DD.simhash_df(df, "doc_id", "text")
    n_seg = 5
    banded = sh.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("seg_id"),
                        DD.simhash_segment(F.col("sh"), s).alias("seg_val"),
                    )
                    for s in range(n_seg)
                ]
            )
        ).alias("sg"),
    ).select("sg.seg_id", "sg.seg_val")
    biggest = (
        banded.groupBy("seg_id", "seg_val").count().agg(F.max("count")).collect()[0][0]
    )
    assert biggest < n_docs / 2, biggest


def test_simhash_pairs_unique_no_distinct(spark):
    """Segment-ownership must emit each qualifying pair exactly once even
    when the pair agrees on several segments (identical docs agree on all
    five)."""
    text = "one two three four five six seven eight nine ten"
    df = spark.createDataFrame(
        [(i, text, 50) for i in range(4)], "doc_id long, text string, n_chars long"
    )
    pairs = DD.simhash_pairs(df, "doc_id", "text", "n_chars")
    assert pairs.count() == 6  # C(4,2), once each
    assert pairs.groupBy("doc_id_a", "doc_id_b").count().filter("count > 1").count() == 0


def test_components_convergence_guard(spark):
    """A chain longer than the round budget must fail loudly instead of
    returning split components (ADVICE r1: latent wrong answer)."""
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 6)], "doc_id_a long, doc_id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        DD.connected_components(chain, iters=1)
    ok = DD.connected_components(chain, iters=8)
    labels = {r["component_id"] for r in ok.collect()}
    assert labels == {1}
