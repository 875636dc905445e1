"""Governance / association / hybrid-retrieval pack semantics.

The registry-wide oracle sweep (tests/test_oracle.py) proves cross-engine
agreement; these tests pin the SEMANTICS with hand-computed fixtures and
assert the gates are non-vacuous (the important_parts lesson: an empty or
trivially-zero result hashes green while verifying nothing).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from data_pipelines_using_llm_spark.plans.association import (
    event_type_mutual_info,
    part_affinity_lift,
)
from data_pipelines_using_llm_spark.plans.governance import (
    BENFORD_EXPECTED,
    K_THRESHOLDS,
    benford_digit_profile,
    k_anonymity_profile,
)
from data_pipelines_using_llm_spark.plans.retrieval_queries import (
    HYBRID_TOP,
    hybrid_rrf_search,
)
from data_pipelines_using_llm_spark.plans.statistics import (
    rolling_median_revenue,
)
from data_pipelines_using_llm_spark.plans.text_queries import vocab_oov_rate

SF = "/root/testdata/sf0.001"


def test_k_anonymity_monotone_in_k(spark):
    """rows_at_risk and classes_below_k are nondecreasing in k, and the
    risk_pct is consistent with rows_at_risk / corpus size."""
    rows = {r["k"]: r for r in k_anonymity_profile(spark, SF).collect()}
    assert set(rows) == set(K_THRESHOLDS)
    ks = sorted(rows)
    for a, b in zip(ks, ks[1:]):
        assert rows[a]["classes_below_k"] <= rows[b]["classes_below_k"]
        assert rows[a]["rows_at_risk"] <= rows[b]["rows_at_risk"]
    # non-vacuous: the top threshold must flag SOME risk in the fixture
    assert rows[ks[-1]]["rows_at_risk"] > 0


def test_benford_profile_shape(spark):
    out = {r["digit"]: r for r in benford_digit_profile(spark, SF).collect()}
    assert set(out) <= set(range(1, 10))
    # observed shares sum to 1 over the emitted digits
    assert sum(r["obs_pct"] for r in out.values()) == pytest.approx(1.0, abs=1e-4)
    for d, r in out.items():
        assert r["expected_pct"] == pytest.approx(
            round(BENFORD_EXPECTED[d], 6)
        )
        assert r["chi2_contrib"] >= 0


def test_part_affinity_lift_fixture(spark):
    """3 baskets {1,2} {1,2,3} {1,3}: pairs (1,2) and (1,3) co-occur
    twice, (2,3) once.  With n_baskets=3 and item counts 1:3, 2:2, 3:2:
    lift(1,2) = (2*3)/(3*2) = 1.0, lift(2,3) = (1*3)/(2*2) = 0.75; the
    count-2 pairs rank first with (part_a, part_b) tiebreak."""
    import data_pipelines_using_llm_spark.plans.association as A

    li = spark.createDataFrame(
        [
            (10, 1), (10, 2),
            (11, 1), (11, 2), (11, 3),
            (12, 1), (12, 3),
        ],
        "l_orderkey bigint, l_partkey bigint",
    )

    # exercise the operator body directly against the fixture
    from unittest import mock

    with mock.patch.object(
        A, "load_table", lambda spark_, sf_, name: li
    ):
        out = A.part_affinity_lift(spark, "unused").collect()
    by_pair = {(r["part_a"], r["part_b"]): r for r in out}
    assert by_pair[(1, 2)]["pair_cnt"] == 2
    assert by_pair[(1, 2)]["lift"] == pytest.approx((2 * 3) / (3 * 2))
    assert by_pair[(1, 3)]["pair_cnt"] == 2
    assert by_pair[(2, 3)]["pair_cnt"] == 1
    assert by_pair[(2, 3)]["lift"] == pytest.approx((1 * 3) / (2 * 2))
    assert out[0]["part_a"] == 1 and out[0]["part_b"] == 2  # tiebreak


def test_mutual_info_independent_is_zero(spark):
    """A perfectly independent 2x2 contingency (all cells equal) has
    PMI = 0 everywhere."""
    import data_pipelines_using_llm_spark.plans.association as A

    rows = []
    eid = 0
    for et in ("a", "b"):
        for h in (1, 2):
            for _ in range(5):
                rows.append((eid, f"2024-01-01 0{h}:00:00", et))
                eid += 1
    ev = spark.createDataFrame(
        rows, "event_id bigint, ts_s string, event_type string"
    ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"), "event_type")

    from unittest import mock

    with mock.patch.object(A, "load_table", lambda spark_, sf_, name: ev):
        out = A.event_type_mutual_info(spark, "unused").collect()
    assert len(out) == 4
    for r in out:
        assert r["pmi"] == pytest.approx(0.0)
        assert r["mi_contrib"] == pytest.approx(0.0)


def test_mutual_info_nonvacuous_on_fixture(spark):
    """The driver corpus must exercise the non-zero PMI path."""
    out = event_type_mutual_info(spark, SF).collect()
    assert any(abs(r["pmi"]) > 0 for r in out)


def test_rolling_median_resists_outlier(spark):
    """A 7-day frame with one huge day: the mean moves, the median must
    equal the middle daily value."""
    import data_pipelines_using_llm_spark.plans.statistics as S

    days = [
        ("2024-01-0%d 00:00:00" % (i + 1), float(v))
        for i, v in enumerate([100, 100, 100, 1_000_000, 100, 100, 100])
    ]
    o = spark.createDataFrame(
        [(i, d, v) for i, (d, v) in enumerate(days)],
        "o_orderkey bigint, ds string, o_totalprice double",
    ).select(
        "o_orderkey",
        F.col("ds").cast("timestamp").alias("o_orderdate"),
        "o_totalprice",
    )

    from unittest import mock

    with mock.patch.object(S, "load_table", lambda spark_, sf_, name: o):
        out = sorted(
            S.rolling_median_revenue(spark, "unused").collect(),
            key=lambda r: r["order_date"],
        )
    # day 7's frame covers all 7 days; median daily cents = 100.00 * 100
    assert out[-1]["median_7d_cents"] == pytest.approx(100 * 100)
    # day 4's frame is days 1-4 (even count): (100_00 + 100_00)/2... the
    # two middle of [10000, 10000, 10000, 100000000] are both 10000
    assert out[3]["median_7d_cents"] == pytest.approx(100 * 100)


def test_hybrid_rrf_rewards_dual_listed_docs(spark):
    """Each query emits exactly HYBRID_TOP rows, fused_rank is 1..k, and
    any doc present in BOTH lists outranks every single-list doc with
    equal-or-worse ranks (RRF dominance)."""
    out = hybrid_rrf_search(spark, SF).collect()
    by_q: dict[int, list] = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(len(v) for v in by_q.values()) == {HYBRID_TOP}
    for rows in by_q.values():
        rows = sorted(rows, key=lambda r: r["fused_rank"])
        assert [r["fused_rank"] for r in rows] == list(range(1, HYBRID_TOP + 1))
        for r in rows:
            expect = 0.0
            if r["lex_rank"]:
                expect += 1.0 / (60 + r["lex_rank"])
            if r["sem_rank"]:
                expect += 1.0 / (60 + r["sem_rank"])
            assert r["rrf"] == pytest.approx(expect, abs=1e-6)


def test_vocab_oov_gate_has_teeth(spark):
    """The top-N vocabulary must actually exclude tail terms at the test
    SF — otherwise the oracle gate compares all-zero OOV counts."""
    out = vocab_oov_rate(spark, SF).collect()
    assert sum(r["oov_tokens"] for r in out) > 0
    for r in out:
        assert 0.0 <= r["oov_rate"] <= 1.0
