"""PageRank operator — hand-computed fixture + pack shape checks."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from data_pipelines_using_llm_spark.operators.graph import pagerank
from data_pipelines_using_llm_spark.plans import graph_queries as GQ
from data_pipelines_using_llm_spark.plans.statistics import (
    EWMA_ALPHA,
    user_value_ewma,
)


def test_pagerank_two_node_cycle_is_uniform(spark):
    """A 2-cycle is symmetric: ranks stay exactly 1/N forever."""
    edges = spark.createDataFrame([(1, 2), (2, 1)], "src bigint, dst bigint")
    out = {r["node"]: r["r"] for r in pagerank(edges, iters=3).collect()}
    assert out[1] == pytest.approx(0.5)
    assert out[2] == pytest.approx(0.5)


def test_pagerank_hub_ranks_highest(spark):
    """Star graph (spokes <-> hub): the hub accumulates rank."""
    spokes = [2, 3, 4, 5]
    rows = [(1, s) for s in spokes] + [(s, 1) for s in spokes]
    edges = spark.createDataFrame(rows, "src bigint, dst bigint")
    out = {r["node"]: r["r"] for r in pagerank(edges, iters=2).collect()}
    assert out[1] > max(out[s] for s in spokes)
    # hand-rolled two iterations (N=5, d=0.85)
    n, d = 5, 0.85
    r_hub = (1 - d) / n + d * sum((1 / n) / 1 for _ in spokes)
    r_spoke = (1 - d) / n + d * ((1 / n) / 4)
    r_hub2 = (1 - d) / n + d * sum(r_spoke / 1 for _ in spokes)
    assert out[1] == pytest.approx(r_hub2)
    assert sum(out.values()) == pytest.approx(1.0)
    del r_hub


def test_supplier_pagerank_shape(spark):
    df = GQ.supplier_pagerank(spark, "/root/testdata/sf0.001").toPandas()
    assert set(df["node_type"]) == {"customer", "supplier"}
    # normalized: graph-wide mean is exactly 1 => total == row count
    assert df["pr_score"].sum() == pytest.approx(len(df), rel=1e-6)
    # suppliers serve many customers each -> structurally more central
    assert (
        df[df.node_type == "supplier"]["pr_score"].mean()
        > df[df.node_type == "customer"]["pr_score"].mean()
    )


def test_user_value_ewma_hand_computed(spark):
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (1, t0, 7, 10.0),
        (1, t0 + datetime.timedelta(minutes=1), 8, 20.0),
        (1, t0 + datetime.timedelta(minutes=2), 9, 30.0),
        (2, t0, 10, 5.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_id bigint, value double"
    )
    import data_pipelines_using_llm_spark.plans.statistics as ST

    arr = df.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("ts", "event_id", "value"))).alias(
            "seq"
        )
    )
    ewma = F.aggregate(
        F.expr("slice(seq, 2, size(seq) - 1)"),
        F.element_at(F.col("seq"), 1)["value"],
        lambda acc, s: F.lit(ST.EWMA_ALPHA) * s["value"]
        + F.lit(1 - ST.EWMA_ALPHA) * acc,
    )
    out = {
        r["user_id"]: r["e"]
        for r in arr.select("user_id", ewma.alias("e")).collect()
    }
    s = 10.0
    for v in (20.0, 30.0):
        s = EWMA_ALPHA * v + (1 - EWMA_ALPHA) * s
    assert out[1] == pytest.approx(s)
    assert out[2] == pytest.approx(5.0)  # single event: seed only


def test_user_value_ewma_pack_runs(spark):
    df = user_value_ewma(spark, "/root/testdata/sf0.001").toPandas()
    assert len(df) > 0
    assert (df["n_events"] >= 1).all()
