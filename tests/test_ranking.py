"""operators/ranking — distributed exact order statistics.

The contract under test: ``with_exact_rank`` + the ``*_from_rank``
derivations must be BIT-IDENTICAL to the corresponding window functions
(that is what keeps the rfm / distribution-rank queries hash-green
against their plain-window oracles) while never planning an
unpartitioned window.
"""

from __future__ import annotations

from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from data_pipelines_using_llm_spark.operators.ranking import (
    cume_dist_from_rank,
    ntile_from_rank,
    percent_rank_from_rank,
    with_exact_rank,
)


def _sorted_rows(df, *cols):
    return [tuple(r) for r in df.select(*cols).orderBy(*cols).collect()]


def test_global_rank_matches_row_number(spark):
    df = spark.range(0, 997).select(
        (F.col("id") * 37 % 1000).alias("key"), F.col("id")
    )
    got = with_exact_rank(
        df, [F.col("key").asc(), F.col("id").asc()], rank_col="r",
        num_partitions=7,
    )
    want = df.select(
        "key",
        "id",
        F.row_number()
        .over(Window.orderBy(F.col("key").asc(), F.col("id").asc()))
        .cast("long")
        .alias("r"),
    )
    assert _sorted_rows(got, "id", "r") == _sorted_rows(want, "id", "r")


def test_grouped_rank_and_derivations_match_window_family(spark):
    df = spark.range(0, 500).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") * 17 % 97).alias("v"),
        F.col("id"),
    )
    got = with_exact_rank(
        df,
        [F.col("v").asc(), F.col("id").asc()],
        group_by=["g"],
        rank_col="r",
        group_n_col="n",
        num_partitions=5,
    ).select(
        "id",
        ntile_from_rank(F.col("r"), F.col("n"), 4).alias("q"),
        percent_rank_from_rank(F.col("r"), F.col("n")).alias("pr"),
        cume_dist_from_rank(F.col("r"), F.col("n")).alias("cd"),
    )
    w = Window.partitionBy("g").orderBy(F.col("v").asc(), F.col("id").asc())
    want = df.select(
        "id",
        F.ntile(4).over(w).alias("q"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )
    assert _sorted_rows(got, "id", "q", "pr", "cd") == _sorted_rows(
        want, "id", "q", "pr", "cd"
    )


def test_descending_order_and_remainder_buckets(spark):
    # N=10, n=4 -> bucket sizes 3,3,2,2: exercises the remainder split.
    df = spark.createDataFrame([Row(v=i, id=i) for i in range(10)])
    got = with_exact_rank(
        df, [F.col("v").desc(), F.col("id").asc()], rank_col="r",
        group_n_col="n", num_partitions=3,
    ).select("id", ntile_from_rank(F.col("r"), F.col("n"), 4).alias("q"))
    w = Window.orderBy(F.col("v").desc(), F.col("id").asc())
    want = df.select("id", F.ntile(4).over(w).alias("q"))
    assert _sorted_rows(got, "id", "q") == _sorted_rows(want, "id", "q")


def test_tiny_groups_smaller_than_bucket_count(spark):
    # N=2 with ntile(4): q = N div 4 = 0 -> the guarded else-branch must
    # not divide by zero; percent_rank of a 1-row group must be 0.0.
    df = spark.createDataFrame(
        [Row(g="a", v=1, id=1), Row(g="a", v=2, id=2), Row(g="b", v=9, id=3)]
    )
    got = with_exact_rank(
        df,
        [F.col("v").asc(), F.col("id").asc()],
        group_by=["g"],
        rank_col="r",
        group_n_col="n",
        num_partitions=2,
    ).select(
        "id",
        ntile_from_rank(F.col("r"), F.col("n"), 4).alias("q"),
        percent_rank_from_rank(F.col("r"), F.col("n")).alias("pr"),
    )
    rows = {r["id"]: (r["q"], r["pr"]) for r in got.collect()}
    assert rows == {1: (1, 0.0), 2: (2, 1.0), 3: (1, 0.0)}


def test_null_group_rows_survive(spark):
    df = spark.createDataFrame(
        [Row(g=None, v=2, id=1), Row(g=None, v=1, id=2), Row(g="x", v=5, id=3)]
    )
    got = with_exact_rank(
        df,
        [F.col("v").asc(), F.col("id").asc()],
        group_by=["g"],
        rank_col="r",
        num_partitions=2,
    )
    rows = {r["id"]: r["r"] for r in got.collect()}
    assert rows == {1: 2, 2: 1, 3: 1}


def test_running_sum_matches_window(spark):
    from data_pipelines_using_llm_spark.operators.ranking import (
        with_exact_running_sum,
    )

    df = spark.range(0, 300).select(
        (F.col("id") % 4).cast("string").alias("g"),
        (F.col("id") * 13 % 41).alias("v"),
        F.col("id"),
    )
    order = [F.col("v").asc(), F.col("id").asc()]
    got = with_exact_running_sum(
        df, "v", order, group_by=["g"], sum_col="cs", num_partitions=5
    )
    w = (
        Window.partitionBy("g")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = df.select("g", "v", "id", F.sum("v").over(w).cast("long").alias("cs"))
    assert _sorted_rows(got, "id", "cs") == _sorted_rows(want, "id", "cs")


def test_running_sum_global_and_empty_groups(spark):
    from pyspark.sql import Row

    from data_pipelines_using_llm_spark.operators.ranking import (
        with_exact_running_sum,
    )

    df = spark.createDataFrame([Row(v=5, id=1), Row(v=3, id=2), Row(v=7, id=3)])
    got = {
        r["id"]: r["cs"]
        for r in with_exact_running_sum(
            df, "v", [F.col("id").asc()], sum_col="cs", num_partitions=2
        ).collect()
    }
    assert got == {1: 5, 2: 8, 3: 15}


def test_no_unpartitioned_window_in_plan(spark):
    df = spark.range(100).select(F.col("id").alias("v"), "id")
    got = with_exact_rank(df, [F.col("v").asc(), F.col("id").asc()],
                          rank_col="r", num_partitions=4)
    plan = got._jdf.queryExecution().optimizedPlan().toString()
    for line in plan.splitlines():
        if "windowspecdefinition" in line.lower():
            assert "__rank_pid" in line  # every window keyed by partition id
