"""Count-Min sketch — error bounds, mergeability, collision behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipelines_using_llm_spark.operators.sketch import (
    cms_build,
    cms_estimate,
)


def _stream(spark, counts: dict[str, int]):
    rows = [(k,) for k, n in counts.items() for _ in range(n)]
    return spark.createDataFrame(rows, "term string")


def test_cms_exact_when_no_collision(spark):
    counts = {"alpha": 5, "beta": 3, "gamma": 1}
    s = _stream(spark, counts)
    est = {
        r["term"]: r["cms_est"]
        for r in cms_estimate(
            cms_build(s, "term"), s.select("term").distinct(), "term"
        ).collect()
    }
    assert est == counts  # 3 keys in 4x256 cells: collisions impossible-ish


def test_cms_overcounts_but_never_undercounts_under_collisions(spark):
    """Width 2 forces heavy collisions: estimates may exceed the truth
    (one-sided error) but must NEVER fall below it, and the total
    per-row mass equals the stream length."""
    counts = {f"k{i}": i + 1 for i in range(12)}
    s = _stream(spark, counts)
    sketch = cms_build(s, "term", depth=3, width=2)
    # every row's cells sum to the full stream length
    per_row = {
        r["row"]: r["s"]
        for r in sketch.groupBy("row").agg(F.sum("counter").alias("s")).collect()
    }
    n = sum(counts.values())
    assert per_row == {0: n, 1: n, 2: n}
    est = {
        r["term"]: r["cms_est"]
        for r in cms_estimate(
            sketch, s.select("term").distinct(), "term", depth=3, width=2
        ).collect()
    }
    assert est.keys() == counts.keys()
    assert all(est[k] >= counts[k] for k in counts)
    assert any(est[k] > counts[k] for k in counts)  # collisions really fire


def test_cms_merges_by_addition(spark):
    """Sketches of disjoint batches summed cell-wise equal the sketch of
    the union — the mergeability that makes CMS a partial aggregate."""
    a = _stream(spark, {"x": 4, "y": 2})
    b = _stream(spark, {"x": 1, "z": 7})
    merged = (
        cms_build(a, "term")
        .unionByName(cms_build(b, "term"))
        .groupBy("row", "bucket")
        .agg(F.sum("counter").alias("counter"))
    )
    whole = cms_build(a.unionByName(b), "term")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_bloom_no_false_negatives_and_merge(spark):
    """Every inserted key must probe positive (no false negatives — the
    Bloom contract), non-members may false-positive but never error,
    and filters from disjoint batches merged by OR-ing word masks must
    equal the filter built from the union."""
    from pyspark.sql import functions as F

    from data_pipelines_using_llm_spark.operators.sketch import (
        bloom_build,
        bloom_probe,
    )

    a = spark.createDataFrame([(f"k{i}",) for i in range(40)], "key string")
    b = spark.createDataFrame([(f"k{i}",) for i in range(40, 80)], "key string")
    both = a.unionByName(b)
    bloom = bloom_build(both, "key")
    members = bloom_probe(bloom, both, "key").collect()
    assert all(r["bloom_member"] == 1 for r in members)
    # mergeability: build per batch, OR the words, identical filter
    merged = (
        bloom_build(a, "key")
        .unionByName(bloom_build(b, "key"))
        .groupBy("word")
        .agg(F.bit_or("mask").alias("mask"))
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, bloom.collect())
    )
