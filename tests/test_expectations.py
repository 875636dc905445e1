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
