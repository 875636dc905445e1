"""CDC operator tests: snapshot diff classes and SCD2 lifecycle across
multiple batches (the query-level oracle covers single-batch results;
these cover the operator contract)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipelines_using_llm_spark.operators.cdc import (
    scd2_apply,
    scd2_init,
    snapshot_diff,
)


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_snapshot_diff_classes_and_null_transitions(spark):
    old = _df(
        spark,
        [(1, "a"), (2, "b"), (3, None), (4, "d")],
        "id long, v string",
    )
    new = _df(
        spark,
        [(1, "a"), (2, "B"), (3, "c"), (5, "e")],
        "id long, v string",
    )
    got = {r["id"]: r["change"] for r in snapshot_diff(old, new, ["id"]).collect()}
    # 1 unchanged (absent), 2 changed, 3 NULL→value is a change,
    # 4 removed, 5 added
    assert got == {2: "changed", 3: "changed", 4: "removed", 5: "added"}


def test_snapshot_diff_rejects_unknown_compare_col(spark):
    old = _df(spark, [(1, "a")], "id long, v string")
    with pytest.raises(ValueError, match="tracked columns missing"):
        snapshot_diff(old, old, ["id"], compare_cols=["nope"])


def test_scd2_two_batches_build_history_chain(spark):
    base = _df(
        spark,
        [(1, "gold", "2020-01-01 00:00:00"), (2, "silver", "2020-01-01 00:00:00")],
        "cust long, tier string, eff string",
    ).withColumn("eff", F.col("eff").cast("timestamp"))
    dim = scd2_init(base, "eff")

    b1 = _df(spark, [(1, "platinum", "2021-01-01 00:00:00")], "cust long, tier string, eff string")
    b1 = b1.withColumn("eff", F.col("eff").cast("timestamp"))
    dim = scd2_apply(dim, b1, keys=["cust"], effective_col="eff")

    b2 = _df(spark, [(1, "diamond", "2022-01-01 00:00:00")], "cust long, tier string, eff string")
    b2 = b2.withColumn("eff", F.col("eff").cast("timestamp"))
    dim = scd2_apply(dim, b2, keys=["cust"], effective_col="eff")

    rows = sorted(
        (
            (r["cust"], r["tier"], str(r["valid_from"]), str(r["valid_to"]), r["is_current"])
            for r in dim.collect()
        )
    )
    # cust 1: three versions chained end-to-start; cust 2: untouched
    c1 = [r for r in rows if r[0] == 1]
    assert [r[1] for r in c1] == ["diamond", "gold", "platinum"]
    gold = next(r for r in c1 if r[1] == "gold")
    plat = next(r for r in c1 if r[1] == "platinum")
    dia = next(r for r in c1 if r[1] == "diamond")
    assert gold[3] == plat[2] and plat[3] == dia[2]  # contiguous validity
    assert [r[4] for r in (gold, plat, dia)] == [False, False, True]
    c2 = [r for r in rows if r[0] == 2]
    assert len(c2) == 1 and c2[0][4] is True
    # exactly one current row per key
    cur = dim.filter("is_current").groupBy("cust").count().collect()
    assert all(r["count"] == 1 for r in cur)


def test_scd2_rejects_duplicate_update_keys(spark):
    base = _df(spark, [(1, "x", "2020-01-01 00:00:00")], "cust long, tier string, eff string")
    base = base.withColumn("eff", F.col("eff").cast("timestamp"))
    dim = scd2_init(base, "eff")
    dup = _df(
        spark,
        [(1, "y", "2021-01-01 00:00:00"), (1, "z", "2021-02-01 00:00:00")],
        "cust long, tier string, eff string",
    ).withColumn("eff", F.col("eff").cast("timestamp"))
    with pytest.raises(ValueError, match="one row per key"):
        scd2_apply(dim, dup, keys=["cust"], effective_col="eff")


def test_scd2_insert_new_key_without_history(spark):
    base = _df(spark, [(1, "x", "2020-01-01 00:00:00")], "cust long, tier string, eff string")
    base = base.withColumn("eff", F.col("eff").cast("timestamp"))
    dim = scd2_init(base, "eff")
    ins = _df(spark, [(9, "new", "2021-01-01 00:00:00")], "cust long, tier string, eff string")
    ins = ins.withColumn("eff", F.col("eff").cast("timestamp"))
    out = scd2_apply(dim, ins, keys=["cust"], effective_col="eff")
    assert out.count() == 2
    assert out.filter("cust = 9 AND is_current").count() == 1
