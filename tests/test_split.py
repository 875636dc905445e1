"""Deterministic split/sample operators: stability, partition-invariance,
ratio accuracy (oracle equivalence is covered by test_oracle.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipelines_using_llm_spark.operators.split import (
    deterministic_sample,
    deterministic_split,
)


def _ids(spark, n=10_000):
    return spark.range(n).withColumnRenamed("id", "doc_id")


def test_split_partitions_every_row_exactly_once(spark):
    df = deterministic_split(_ids(spark), "doc_id")
    assert df.filter(F.col("split").isNull()).count() == 0
    assert df.count() == 10_000
    assert set(r["split"] for r in df.select("split").distinct().collect()) == {
        "train",
        "val",
        "test",
    }


def test_split_ratios_close_to_weights(spark):
    counts = {
        r["split"]: r["count"]
        for r in deterministic_split(_ids(spark), "doc_id")
        .groupBy("split")
        .count()
        .collect()
    }
    n = sum(counts.values())
    for name, w in (("train", 0.8), ("val", 0.1), ("test", 0.1)):
        assert abs(counts[name] / n - w) < 0.02, (name, counts)


def test_split_is_invariant_under_repartition(spark):
    """The property randomSplit does NOT have: assignment must be a pure
    function of the id, so repartitioning cannot move a row between
    splits (no val->train leakage on rerun)."""
    base = _ids(spark)
    a = {r["doc_id"]: r["split"] for r in deterministic_split(base, "doc_id").collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in deterministic_split(base.repartition(13), "doc_id").collect()
    }
    assert a == b


def test_split_changes_with_salt(spark):
    a = deterministic_split(_ids(spark), "doc_id", salt=17)
    b = deterministic_split(_ids(spark), "doc_id", salt=18)
    moved = (
        a.select("doc_id", F.col("split").alias("sa"))
        .join(b.select("doc_id", F.col("split").alias("sb")), "doc_id")
        .filter(F.col("sa") != F.col("sb"))
        .count()
    )
    assert moved > 1000  # a new salt reshuffles a substantial fraction


def test_split_weight_validation(spark):
    df = _ids(spark, 10)
    with pytest.raises(ValueError, match="sum to 1.0"):
        deterministic_split(df, "doc_id", weights=[("a", 0.5), ("b", 0.4)])
    with pytest.raises(ValueError, match="positive"):
        deterministic_split(df, "doc_id", weights=[("a", 1.2), ("b", -0.2)])
    with pytest.raises(ValueError, match="non-empty"):
        deterministic_split(df, "doc_id", weights=[])


def test_sample_is_stable_subset(spark):
    base = _ids(spark)
    s1 = {r["doc_id"] for r in deterministic_sample(base, "doc_id", 0.05).collect()}
    s2 = {
        r["doc_id"]
        for r in deterministic_sample(base.repartition(7), "doc_id", 0.05).collect()
    }
    assert s1 == s2
    assert abs(len(s1) / 10_000 - 0.05) < 0.01
    with pytest.raises(ValueError, match="fraction"):
        deterministic_sample(base, "doc_id", 1.5)


def test_split_assignment_plan_has_no_exchange(spark):
    """Assignment is a row-local expression: the plan must contain no
    shuffle — at 100 TB the split costs exactly one scan."""
    import contextlib
    import io

    df = deterministic_split(_ids(spark), "doc_id")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    assert "Exchange" not in buf.getvalue()


def test_stratified_sample_exact_counts_and_stability(spark):
    from data_pipelines_using_llm_spark.operators.split import (
        stratified_sample_exact,
    )

    df = (
        spark.range(1000)
        .withColumnRenamed("id", "doc_id")
        .withColumn("src", (F.col("doc_id") % 3).cast("string"))
    )
    out = stratified_sample_exact(df, "src", "doc_id", 7)
    counts = {r["src"]: r["count"] for r in out.groupBy("src").count().collect()}
    assert counts == {"0": 7, "1": 7, "2": 7}
    # stable under repartition
    again = stratified_sample_exact(df.repartition(11), "src", "doc_id", 7)
    assert {r["doc_id"] for r in out.collect()} == {
        r["doc_id"] for r in again.collect()
    }
    # k larger than a stratum returns the whole stratum, not an error
    tiny = df.filter(F.col("doc_id") < 4)
    assert stratified_sample_exact(tiny, "src", "doc_id", 100).count() == 4
    with pytest.raises(ValueError, match="positive"):
        stratified_sample_exact(df, "src", "doc_id", 0)


def test_mixture_sample_epochs_and_rates(spark):
    from data_pipelines_using_llm_spark.operators.split import mixture_sample

    df = (
        spark.range(3000)
        .withColumnRenamed("id", "doc_id")
        .withColumn("src", (F.col("doc_id") % 3).cast("string"))
    )  # 1000 rows per stratum
    out = mixture_sample(
        df, "src", "doc_id", {"0": 2.5, "1": 0.2, "2": 0.0}, default_rate=1.0
    )
    counts = {r["src"]: r["count"] for r in out.groupBy("src").count().collect()}
    # rate 2.5 -> ~2500 rows (2 or 3 epochs each), rate 0.2 -> ~200, 0 -> gone
    assert 2300 <= counts["0"] <= 2700, counts
    assert 150 <= counts["1"] <= 250, counts
    assert "2" not in counts
    # epoch numbering dense from 1; max epoch = ceil(rate)
    eps = out.filter(F.col("src") == "0").groupBy("doc_id").count().collect()
    assert {r["count"] for r in eps} <= {2, 3}
    assert out.filter((F.col("src") == "0") & (F.col("epoch") == 1)).count() == 1000
    # deterministic under repartition
    a = sorted((r["doc_id"], r["epoch"]) for r in out.collect())
    b = sorted(
        (r["doc_id"], r["epoch"])
        for r in mixture_sample(
            df.repartition(17), "src", "doc_id",
            {"0": 2.5, "1": 0.2, "2": 0.0}, default_rate=1.0,
        ).collect()
    )
    assert a == b
    with pytest.raises(ValueError, match="non-negative"):
        mixture_sample(df, "src", "doc_id", {"0": -1.0})


def test_pack_contexts_layout_invariants(spark):
    """Packing layout: offsets advance by token count mod ctx, window ids
    are non-decreasing per shard, boundary flag fires iff a document's
    tokens straddle a window edge, and the layout is repartition-stable."""
    from data_pipelines_using_llm_spark.operators.packing import pack_contexts

    df = (
        spark.range(200)
        .withColumnRenamed("id", "doc_id")
        .withColumn("shard", (F.col("doc_id") % 2).cast("string"))
        .withColumn("n_tok", (F.col("doc_id") % 37) + 1)
    )
    out = pack_contexts(df, "doc_id", "n_tok", 64, shard_col="shard").collect()
    by_shard: dict[str, list] = {}
    for r in sorted(out, key=lambda r: (r["shard"], r["doc_id"])):
        by_shard.setdefault(r["shard"], []).append(r)
    assert set(by_shard) == {"0", "1"}
    for rows in by_shard.values():
        cum = 0
        prev_pack = 0
        for r in rows:
            assert r["pack_id"] == cum // 64
            assert r["pack_offset"] == cum % 64
            end = cum + r["n_tok"] - 1
            assert r["spans_boundary"] == (1 if end // 64 > cum // 64 else 0)
            assert r["pack_id"] >= prev_pack
            prev_pack = r["pack_id"]
            cum += r["n_tok"]
    again = pack_contexts(
        df.repartition(9), "doc_id", "n_tok", 64, shard_col="shard"
    ).collect()
    assert sorted((r["doc_id"], r["pack_id"], r["pack_offset"]) for r in again) == sorted(
        (r["doc_id"], r["pack_id"], r["pack_offset"]) for r in out
    )
    with pytest.raises(ValueError, match="ctx_len"):
        pack_contexts(df, "doc_id", "n_tok", 0)


def test_temperature_mixture_uniform_is_identity(spark):
    """Equal-sized strata -> every rate is exactly 1.0 (the normalizer
    cancels algebraically), so the output is exactly one copy per row."""
    from data_pipelines_using_llm_spark.operators.split import (
        temperature_mixture,
    )

    rows = [(i, f"s{i % 4}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id bigint, src string")
    out = temperature_mixture(df, "src", "doc_id", alpha=0.7).collect()
    assert len(out) == 40
    assert all(r["rate"] == 1.0 and r["epoch"] == 1 for r in out)


def test_temperature_mixture_flattens_skew(spark):
    """alpha<1 must move the output mixture toward uniform: the dominant
    stratum's rate < 1 (downsampled), the rare stratum's rate > 1
    (replicated), and expected output size stays ~N."""
    from data_pipelines_using_llm_spark.operators.split import (
        temperature_mixture,
    )

    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id bigint, src string")
    out = temperature_mixture(df, "src", "doc_id", alpha=0.5)
    rates = {
        r["src"]: r["rate"]
        for r in out.select("src", "rate").distinct().collect()
    }
    assert rates["big"] < 1.0 < rates["small"]
    n_out = out.count()
    assert abs(n_out - 1000) < 100  # hash-threshold noise around E[N]=N
    # rerun-stability: identical membership on a different partitioning
    again = temperature_mixture(
        df.repartition(7), "src", "doc_id", alpha=0.5
    )
    assert sorted(
        (r["doc_id"], r["epoch"]) for r in again.collect()
    ) == sorted((r["doc_id"], r["epoch"]) for r in out.collect())
