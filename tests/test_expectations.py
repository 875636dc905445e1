"""Expectation-engine operator tests (the oracle query covers the events
rule suite; these cover the rule semantics on crafted data)."""

from __future__ import annotations

from data_pipelines_using_llm_spark.operators import expectations as EX


def _report(df, rules, max_rate=0.0):
    return {
        r["rule"]: (r["n_rows"], r["n_violations"], r["passed"])
        for r in EX.expect(df, rules, max_violation_rate=max_rate).collect()
    }


def test_rule_semantics_on_crafted_rows(spark):
    df = spark.createDataFrame(
        [
            (1, 10.0, "click", '{"a":1}'),
            (2, None, "view", "not-json"),
            (3, 500.0, "weird", '{"b":2}'),
            (3, 20.0, "click", None),
        ],
        "id long, v double, t string, props string",
    )
    got = _report(
        df,
        [
            EX.not_null("v"),
            EX.in_range("v", 0, 100),
            EX.in_set("t", ("click", "view")),
            EX.matches("props", r"^\{.*\}$"),
            EX.unique("id"),
            EX.custom("v_pos_when_click", "t != 'click' OR v > 0"),
        ],
    )
    assert got["not_null_v"] == (4, 1, False)
    assert got["in_range_v"] == (4, 1, False)        # NULL doesn't violate range
    assert got["in_set_t"] == (4, 1, False)
    assert got["matches_props"] == (4, 1, False)     # NULL props doesn't violate
    assert got["unique_id"] == (4, 1, False)         # one extra row for id=3
    assert got["v_pos_when_click"] == (4, 0, True)


def test_threshold_tolerates_violation_rate(spark):
    df = spark.createDataFrame([(i, None if i == 0 else i) for i in range(100)], "id long, v long")
    strict = _report(df, [EX.not_null("v")], max_rate=0.0)
    loose = _report(df, [EX.not_null("v")], max_rate=0.05)
    assert strict["not_null_v"][2] is False
    assert loose["not_null_v"][2] is True


def test_custom_null_predicate_counts_as_violation(spark):
    df = spark.createDataFrame([(None,), (5,)], "v long")
    got = _report(df, [EX.custom("v_gt_3", "v > 3")])
    # NULL predicate is not-true => violated
    assert got["v_gt_3"] == (2, 1, False)


def test_quoted_rule_name_is_inert_data(spark):
    # rule names carry into the report as literal columns, never SQL text,
    # so quotes/metacharacters can't break (or inject into) the query
    df = spark.createDataFrame([(1,), (2,)], "v long")
    name = "it's a 100% \"weird\" -- name"
    got = _report(df, [EX.custom(name, "v > 0"), EX.not_null("v")])
    assert got[name] == (2, 0, True)


def test_empty_rules_raises(spark):
    import pytest

    df = spark.createDataFrame([(1,)], "v long")
    with pytest.raises(ValueError, match="at least one rule"):
        EX.expect(df, [])


def test_duplicate_rule_names_raise(spark):
    # two rules with the same name would make the per-rule report rows
    # indistinguishable, so expect() rejects them up front
    import pytest

    df = spark.createDataFrame([(1,)], "v long")
    with pytest.raises(ValueError, match="duplicate rule names.*v_gt"):
        EX.expect(df, [EX.custom("v_gt", "v > 0"), EX.custom("v_gt", "v > 1")])


def test_empty_table_passes_all_rules(spark):
    df = spark.createDataFrame([], "id long, v double")
    rep = EX.expect(df, [EX.not_null("v"), EX.unique("id")]).collect()
    assert len(rep) == 2
    for r in rep:
        assert (r["n_rows"], r["n_violations"], r["violation_rate"], r["passed"]) == (
            0,
            0,
            0.0,
            True,
        )


def test_single_scan_for_scalar_rules(spark):
    import contextlib
    import io

    df = spark.createDataFrame([(1, 2.0)], "id long, v double")
    rep = EX.expect(df, [EX.not_null("id"), EX.in_range("v", 0, 10)])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rep.explain("formatted")
    plan = buf.getvalue()
    assert plan.count("Scan ExistingRDD") + plan.count("FileScan") <= 2  # tree+detail


# --- quarantine split (flag-and-filter dead-letter routing, r8 task 7) ---


def test_quarantine_split_partitions_input_exactly(spark):
    """pass ∪ quarantine ≡ input, disjoint, with violated-rule names in
    declared rule order — and the whole flagged plan reads its source
    exactly ONCE (one scan + the unique rule's window, no joins)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            (1, 10.0, "click"),
            (2, None, "view"),       # clean: NULL doesn't violate range
            (3, 500.0, "weird"),     # in_range + in_set
            (3, 20.0, "click"),      # unique dup (id=3, second by v order)
            (4, -1.0, "view"),       # in_range
        ],
        "id long, v double, t string",
    )
    rules = [
        EX.in_range("v", 0, 100),
        EX.in_set("t", ("click", "view")),
        EX.unique("id"),
    ]
    passed, quarantined = EX.quarantine_split(df, rules, unique_order=["v"])
    p = [tuple(r) for r in passed.collect()]
    # id=3 rows ordered by v → (3, 20.0) is FIRST in its key group, so
    # it is NOT a unique violator and stays clean
    assert sorted(p) == [
        (1, 10.0, "click"),
        (2, None, "view"),
        (3, 20.0, "click"),
    ]
    flags = {(r["id"], r["v"]): r["violated_rules"] for r in quarantined.collect()}
    assert flags[(3, 500.0)] == "in_range_v,in_set_t,unique_id"
    assert flags[(4, -1.0)] == "in_range_v"
    assert (3, 20.0) not in flags  # first-by-order dup stays clean
    assert passed.count() + quarantined.count() == df.count()
    # one source scan in the flagged plan
    from data_pipelines_using_llm_spark.plans.audit import formatted_plan

    import re

    flagged = EX.flag_violations(df, rules, unique_order=["v"])
    text = formatted_plan(flagged)
    assert len(re.findall(r"\(\d+\) Scan ", text)) == 1, text


def test_quarantine_flags_agree_with_expect_counts(spark):
    """Per-rule quarantine flag counts must equal expect()'s
    n_violations on the same data — routing and reporting are two views
    of one rule semantics."""
    from pyspark.sql import functions as F

    from data_pipelines_using_llm_spark.sources.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    rules = [
        EX.not_null("user_id"),
        EX.in_range("value", 0, 100),
        EX.in_set("event_type", ("click", "view", "purchase", "signup")),
        EX.unique("event_id"),
    ]
    report = {
        r["rule"]: r["n_violations"]
        for r in EX.expect(ev, rules, max_violation_rate=1.0).collect()
    }
    _p, quarantined = EX.quarantine_split(
        ev, rules, unique_order=["ts", "user_id", "event_type", "value", "props"]
    )
    flag_counts = {
        r["rule"]: r["n"]
        for r in quarantined.select(
            F.explode(F.split("violated_rules", ",")).alias("rule")
        )
        .groupBy("rule")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for rule, n in report.items():
        assert flag_counts.get(rule, 0) == n, (rule, n, flag_counts)


def test_quarantine_unique_requires_order(spark):
    import pytest as _pt

    df = spark.createDataFrame([(1, 1.0)], "id long, v double")
    with _pt.raises(ValueError, match="unique_order"):
        EX.quarantine_split(df, [EX.unique("id")])


def test_write_audit_publish_split_routes_and_conserves(spark, tmp_path):
    """The WAP dead-letter sink: clean rows publish live, violators land
    in the quarantine table with rule names, published ∪ quarantined ≡
    staged input, and the report totals match."""
    from data_pipelines_using_llm_spark.sinks.writers import (
        write_audit_publish_split,
    )

    df = spark.createDataFrame(
        [
            (1, 10.0, "click"),
            (2, 500.0, "view"),
            (3, 20.0, "weird"),
            (4, 30.0, "view"),
        ],
        "id long, v double, t string",
    )
    live = str(tmp_path / "live")
    dead = str(tmp_path / "dead")
    rules = [EX.in_range("v", 0, 100), EX.in_set("t", ("click", "view"))]
    report = {
        r["rule"]: r["n_quarantined"]
        for r in write_audit_publish_split(df, live, dead, rules).collect()
    }
    assert report == {
        "in_range_v": 1,
        "in_set_t": 1,
        "__total__": 2,
    }
    pub = spark.read.parquet(live)
    quar = spark.read.parquet(dead)
    assert sorted(r["id"] for r in pub.collect()) == [1, 4]
    assert {
        (r["id"], r["violated_rules"]) for r in quar.collect()
    } == {(2, "in_range_v"), (3, "in_set_t")}
    assert pub.count() + quar.count() == df.count()
    assert "violated_rules" not in pub.columns


def test_write_audit_publish_split_retains_q_stage_on_partial_publish(
    spark, tmp_path, monkeypatch
):
    """A crash BETWEEN the two swaps (primary published, quarantine not)
    must leave the quarantine stage dir on disk so the freshly computed
    dead letters survive for recovery (r11 ADVICE) — while a pre-publish
    failure still cleans up every stage dir."""
    import os

    import pytest as _pt

    from data_pipelines_using_llm_spark.sinks import writers

    df = spark.createDataFrame(
        [(1, 10.0, "click"), (2, 500.0, "view"), (3, 30.0, "view")],
        "id long, v double, t string",
    )
    live = str(tmp_path / "live")
    dead = str(tmp_path / "dead")
    rules = [EX.in_range("v", 0, 100)]
    # first publish succeeds and creates both live tables
    writers.write_audit_publish_split(df, live, dead, rules)
    orig_swap = writers._swap_in

    def failing_swap(path, tmp):
        if path == dead:
            raise RuntimeError("simulated crash before quarantine swap")
        orig_swap(path, tmp)

    monkeypatch.setattr(writers, "_swap_in", failing_swap)
    df2 = spark.createDataFrame(
        [(4, 40.0, "click"), (5, -1.0, "view")], "id long, v double, t string"
    )
    with _pt.raises(RuntimeError, match="simulated crash"):
        writers.write_audit_publish_split(df2, live, dead, rules)
    # primary went live with the new generation
    assert sorted(
        r["id"] for r in spark.read.parquet(live).collect()
    ) == [4]
    # quarantine stage survives with the computed dead letters ...
    q_stage = dead + "__stage"
    assert {r["id"] for r in spark.read.parquet(q_stage).collect()} == {5}
    # ... while the other stage dirs are gone
    assert not os.path.exists(live + "__stage")
    assert not os.path.exists(live + "__stage_pass")
