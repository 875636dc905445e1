"""Physical-plan quality gates: the properties that make these queries
scale are asserted here so a regression (lost pushdown, lost broadcast, an
accidental cartesian product) fails CI, not a 100 TB run."""

from __future__ import annotations

import contextlib
import io

import pytest

from data_pipelines_using_llm_spark.registry import all_queries

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = all_queries()[name].fn(spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q1_filter_pushed_to_scan(spark):
    plan = _plan(spark, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_q1_scan_prunes_columns(spark):
    plan = _plan(spark, "q1_pricing_summary")
    # 7 needed columns of lineitem's 16 — comment must not scan the rest
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_orderkey" not in read_schema and "l_comment" not in read_schema


def test_dimension_joins_broadcast(spark):
    plan = _plan(spark, "region_revenue")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_aggregates_are_partial_before_exchange(spark):
    plan = _plan(spark, "q1_pricing_summary")
    assert "partial_sum" in plan  # map-side combine present


@pytest.mark.parametrize(
    "name",
    [
        "region_revenue",
        "merged_orders_silver",
        "dedup_ngram_jaccard",
        "dedup_simhash",
        "salted_nation_revenue",
        "purchase_click_attribution",
        "basket_triangles",
        "doc_collocations",
    ],
)
def test_no_cartesian_products(spark, name):
    assert "CartesianProduct" not in _plan(spark, name)


def test_peak_window_range_join_is_equi(spark):
    """The bin-and-filter range join must reach the optimizer as an
    EQUI-join on (event_type, hour_bucket) — an inequality-only join
    would fall back to BroadcastNestedLoopJoin and die at scale."""
    plan = _plan(spark, "peak_window_traffic")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_skew_profile_topk_never_globally_sorts(spark):
    """The heavy-hitter top-k must compile to TakeOrderedAndProject
    (per-partition heaps) — a global Sort over the per-key table would
    single-task at billion-key cardinality."""
    plan = _plan(spark, "events_skew_profile")
    assert "TakeOrderedAndProject" in plan


def test_domain_quota_uses_window_group_limit(spark):
    """row_number() <= k must compile to WindowGroupLimit so each map
    task pre-truncates to its local top-k per source before the
    exchange — the property that keeps the cap cheap at corpus scale."""
    plan = _plan(spark, "doc_domain_quota")
    assert "WindowGroupLimit" in plan


def test_knn_broadcasts_query_side(spark):
    plan = _plan(spark, "knn_brute_force")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_shipping_priority_pushdown_and_topk(spark):
    plan = _plan(spark, "shipping_priority")
    assert "GreaterThan(l_shipdate" in plan   # lineitem date filter at the scan
    assert "LessThan(o_orderdate" in plan     # orders date filter at the scan
    assert "TakeOrderedAndProject" in plan    # top-10 without a global sort
    assert "CartesianProduct" not in plan


def test_local_supplier_volume_range_pushdown(spark):
    plan = _plan(spark, "local_supplier_volume")
    # the 1997 filter must reach the orders scan as a range predicate
    assert "GreaterThanOrEqual(o_orderdate" in plan
    assert "CartesianProduct" not in plan


def test_sessionization_single_exchange(spark):
    """lag-window, running-sum window and final groupBy all share the
    user_id clustering: exactly one shuffle in the whole plan."""
    plan = _plan(spark, "user_sessions_batch")
    assert plan.count("Arguments: hashpartitioning") == 1


def test_sample_filter_pushed_to_scan(spark):
    plan = _plan(spark, "sampled_type_profile")
    read = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "props" not in read and "ts" not in read  # column pruning holds


def test_pivot_is_single_aggregation(spark):
    plan = _plan(spark, "user_activity_pivot")
    assert plan.count("Arguments: hashpartitioning") == 1
    assert "partial_count" in plan  # map-side combine per pivot cell


def test_nation_trade_matrix_broadcasts_all_dims(spark):
    """Q7 shape: supplier/customer/nation lookups broadcast; the only
    shuffle joins are lineitem⋈orders and the final aggregation — at
    100x the fact tables that is the plan you want."""
    plan = _plan(spark, "nation_trade_matrix")
    assert plan.count("BroadcastHashJoin") >= 4
    assert "CartesianProduct" not in plan
    assert "partial_sum" in plan  # map-side combine before the agg exchange


def test_signup_activation_is_equi_join(spark):
    """The interval predicate must ride on an EQUI-join on
    (user_id, bucket) — a plan with a nested-loop/cartesian range join
    would be |signups| x |clicks| at scale."""
    plan = _plan(spark, "signup_activation")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_no_cartesian_product_in_any_registered_query(spark):
    """Sweep EVERY oracle-backed query plan for the quadratic disaster:
    a non-broadcast CartesianProduct anywhere means some join lost its
    keys or its broadcast hint.  (Broadcast nested-loop joins against
    deliberately tiny sides — centroids, hyperplanes, query vectors —
    are fine and excluded by construction.)  Streaming queries execute
    their job on invocation, so they are covered by their own tests
    rather than re-run here."""
    from data_pipelines_using_llm_spark.operators.caching import release_barriers

    offenders = []
    for name, spec in all_queries().items():
        if name.startswith("stream_"):
            continue
        df = spec.fn(spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        if "CartesianProduct" in buf.getvalue():
            offenders.append(name)
        release_barriers()
    assert not offenders, offenders


def test_order_priority_returns_semi_join_prunes(spark):
    plan = _plan(spark, "order_priority_returns")
    assert "LeftSemi" in plan
    # the semi probe reads ONLY the join key from lineitem
    read_schemas = [l for l in plan.splitlines() if "ReadSchema" in l]
    probe = [l for l in read_schemas if "l_orderkey" in l]
    assert probe and all("l_quantity" not in l for l in probe)
    # quarter predicate reaches the orders scan
    assert "GreaterThanOrEqual(o_orderdate" in plan


def test_large_volume_customers_topk_and_broadcast(spark):
    plan = _plan(spark, "large_volume_customers")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_small_quantity_revenue_broadcast_only(spark):
    # both the brand slice and the per-part averages broadcast: the fact
    # table must never be the build side of a shuffle join
    plan = _plan(spark, "small_quantity_revenue")
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_disjunctive_promo_revenue_envelope_pushdown(spark):
    plan = _plan(spark, "disjunctive_promo_revenue")
    # the OR itself cannot push down, but its quantity envelope must
    assert "GreaterThanOrEqual(l_quantity,1" in plan
    assert "LessThanOrEqual(l_quantity,40" in plan


def test_idle_rich_customers_anti_join_no_shuffled_fact(spark):
    plan = _plan(spark, "idle_rich_customers")
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan or "BroadcastNestedLoopJoin" in plan


def test_returned_item_customers_pushdown_topk(spark):
    plan = _plan(spark, "returned_item_customers")
    assert "EqualTo(l_returnflag,R)" in plan      # flag filter at the lineitem scan
    assert "GreaterThanOrEqual(o_orderdate" in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_nation_market_share_broadcasts_dims(spark):
    plan = _plan(spark, "nation_market_share")
    assert plan.count("BroadcastHashJoin") >= 3   # part, supplier+nation, region-nation
    assert "CartesianProduct" not in plan


def test_statistics_single_pass_partials(spark):
    # one grouped aggregation, map-side partial sums, no joins
    for name in ("value_hour_correlation", "value_trend_slope", "value_skewness"):
        plan = _plan(spark, name)
        assert "partial_sum" in plan, name
        assert "Join" not in plan, name


def test_native_sessions_single_exchange(spark):
    # the merging-session aggregate sessionizes in ONE user_id shuffle
    plan = _plan(spark, "user_sessions_native")
    assert "MergingSessions" in plan
    assert plan.count("Arguments: hashpartitioning") == 1


def test_unpivot_no_extra_shuffle(spark):
    # unpivot is a projection (Expand): the aggregate's exchange must be
    # the only one in the plan
    plan = _plan(spark, "event_stats_long")
    assert "Expand" in plan
    assert plan.count("Arguments: hashpartitioning") == 1


def test_grouping_sets_single_aggregation(spark):
    plan = _plan(spark, "grouping_sets_revenue")
    assert "Expand" in plan
    assert "CartesianProduct" not in plan


def test_aqe_splits_skewed_join(spark):
    """SCALE.md's 'AQE covers moderate skew automatically' claim, executed:
    a join with one hot key must come out of AQE re-planning with the
    skewed partition split (SortMergeJoin(skew=true))."""
    from pyspark.sql import functions as F

    confs = {
        # enough input partitions that the hot key dwarfs the median
        "spark.sql.shuffle.partitions": "32",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        # ~86% of left rows land on key 0; the rest spread over 1000 keys
        left = (
            spark.range(0, 100_000)
            .withColumn("k", (F.col("id") % 1000) * (F.col("id") % 7 == 0).cast("int"))
            .withColumn("pad", F.lpad(F.lit("x"), 64, "y"))
        )
        right = spark.range(0, 2000).withColumn("k", F.col("id") % 1000)
        j = left.join(right, "k").select(F.count(F.lit(1)).alias("n"))
        assert j.collect()[0]["n"] == 200_000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_funnel_single_user_exchange(spark):
    """Three chained conditional-min funnel windows share ONE (user_id)
    exchange+sort; a regression that re-partitions per stage triples the
    shuffle at 100 TB."""
    plan = _plan(spark, "purchase_funnel")
    assert plan.count("Arguments: hashpartitioning(user_id") == 1
    assert "CartesianProduct" not in plan


def test_fuzzy_blocked_is_keyed_join(spark):
    """Blocking-key entity resolution must join on the exact prefix key —
    an all-pairs fallback (cartesian / nested-loop with no equi key) is
    the quadratic failure mode at corpus scale."""
    plan = _plan(spark, "dedup_fuzzy_blocked")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_anomalies_dense_series_reused(spark):
    """The dense hourly series fans out to the stats aggregate AND the
    z-score join; the persist barrier must keep the spine+counts subplan
    (and its fact-table aggregation) from being computed twice."""
    plan = _plan(spark, "hourly_anomalies")
    assert plan.count("InMemoryTableScan") >= 2


def test_nation_year_profit_broadcasts_dims_and_pushes_like(spark):
    """Q9 shape: the part-name filter must reach the part scan, all three
    dimensions broadcast, and the only fact-fact exchange is orderkey."""
    plan = _plan(spark, "nation_year_profit")
    assert "StringContains(p_name" in plan
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan


def test_top_revenue_supplier_reuses_aggregate(spark):
    """Q15 shape: the per-supplier revenue aggregate feeds the global max
    AND the argmax join-back — the barrier must stop a second
    fact-scan/aggregation; supplier names arrive by broadcast."""
    plan = _plan(spark, "top_revenue_supplier")
    assert plan.count("InMemoryTableScan") >= 2
    assert "BroadcastHashJoin" in plan


def test_runtime_bloom_filter_prunes_fact_scan(spark):
    """Scale feature: for a selective fact-fact SHUFFLE join, Catalyst
    injects a bloom-filter ``might_contain`` predicate on the big side's
    scan (InjectRuntimeFilter).  Self-gated by size estimates in
    production (>=10GB application side); forced open here so CI pins
    the 100TB plan shape."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    from data_pipelines_using_llm_spark.session import runtime_filters_forced
    from data_pipelines_using_llm_spark.sources.tables import load_table

    with runtime_filters_forced(spark):
        li = load_table(spark, SF_DIR, "lineitem")
        orders = load_table(spark, SF_DIR, "orders").filter(
            F.col("o_totalprice") > 400000
        )
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain("formatted")
        assert "might_contain" in buf.getvalue()


# --- warehouse pack (TPC-H Q6/Q11/Q12/Q14/Q16/Q20/Q21 shapes) ---


def test_forecast_revenue_delta_full_pushdown(spark):
    # Q6 is the pushdown floor case: every predicate reaches the parquet
    # scan, the ReadSchema is 4 columns, and nothing but one partial-
    # aggregate row per task crosses the (single-partition) exchange.
    plan = _plan(spark, "forecast_revenue_delta")
    for pushed in (
        "GreaterThanOrEqual(l_shipdate",
        "LessThan(l_shipdate",
        "GreaterThanOrEqual(l_discount,0.04)",
        "LessThanOrEqual(l_discount,0.06)",
        "LessThan(l_quantity,24.0)",
    ):
        assert pushed in plan, pushed
    assert "Join" not in plan
    scan_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" not in scan_schema and "l_tax" not in scan_schema


def test_important_parts_single_fact_aggregation(spark):
    # the global (total, n_parts) scalar must come from the SAME persisted
    # partkey aggregate (InMemoryTableScan), not a second parquet scan
    plan = _plan(spark, "important_parts")
    # unique scan sections (the tree header repeats cached subtrees):
    # lineitem appears in exactly ONE detail section + the part dim scan
    lineitem_scans = {
        l for l in plan.splitlines() if "Location" in l and "lineitem" in l
    }
    assert len(lineitem_scans) == 1, lineitem_scans
    assert "InMemoryTableScan" in plan
    assert "BroadcastNestedLoopJoin Cross" in plan  # one-row scalar join
    assert "CartesianProduct" not in plan


def test_late_shipment_priority_projects_before_join(spark):
    plan = _plan(spark, "late_shipment_priority")
    # lineitem side of the orderkey join reads only (orderkey, shipdate)
    li_schema = [
        l
        for l in plan.splitlines()
        if "ReadSchema" in l and "l_shipdate" in l
    ][0]
    assert "l_extendedprice" not in li_schema and "l_quantity" not in li_schema


def test_promo_revenue_share_broadcasts_part(spark):
    plan = _plan(spark, "promo_revenue_share")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "GreaterThanOrEqual(l_shipdate" in plan  # month prune at the scan


def test_supplier_diversity_anti_join_and_distinct(spark):
    plan = _plan(spark, "supplier_diversity")
    assert "LeftAnti" in plan
    # the blacklist filter reaches the supplier scan
    assert "LessThan(s_acctbal,0.0)" in plan
    # two-phase distinct: partial aggregate keyed by class+suppkey exists
    assert "partial_" in plan


def test_red_part_supply_semi_then_having(spark):
    plan = _plan(spark, "red_part_supply")
    assert "LeftSemi" in plan
    assert "StringStartsWith(p_name,red )" in plan  # LIKE 'red %' pushed
    assert "GreaterThanOrEqual(l_shipdate" in plan  # year prune at the scan
    assert "CartesianProduct" not in plan


def test_sole_late_shipper_two_level_aggregation(spark):
    plan = _plan(spark, "sole_late_shipper")
    # level 1: (orderkey, suppkey) grain with map-side partial max
    assert "partial_max(l_shipdate" in plan
    # the order-status probe projects to the key only
    probe = [
        l
        for l in plan.splitlines()
        if "ReadSchema" in l and "o_orderstatus" in l
    ][0]
    assert "o_totalprice" not in probe and "o_custkey" not in probe
    # both window passes share ONE orderkey sort (no second sort exchange)
    assert plan.count("Window") >= 2
    assert "CartesianProduct" not in plan


# --- round-5 LLM-pipeline additions ---


def test_knn_int8_broadcasts_queries_no_shuffle_corpus(spark):
    plan = _plan(spark, "knn_int8")
    assert "BroadcastNestedLoopJoin" in plan  # query side broadcast
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_doc_chunk_overlap_is_shuffle_free(spark):
    # chunking is a pure map stage: explode + per-row arrays, NO exchange
    plan = _plan(spark, "doc_chunk_overlap")
    assert "Exchange" not in plan
    assert "Generate" in plan and "explode" in plan


def test_doc_boilerplate_frequent_set_broadcasts(spark):
    plan = _plan(spark, "doc_boilerplate_ngrams")
    assert "LeftSemi" in plan
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


# --- plan-audit API (plans/audit.py) ---


def test_audit_flags_cartesian_and_row_udf(spark):
    from pyspark.sql import functions as F
    from pyspark.sql.functions import udf

    from data_pipelines_using_llm_spark.plans.audit import (
        assert_scalable,
        audit_plan,
    )

    a = spark.range(10)
    b = spark.range(10).withColumnRenamed("id", "id2")
    cart = a.crossJoin(b.hint("shuffle_replicate_nl"))
    codes = {f["code"] for f in audit_plan(cart)}
    assert "cartesian" in codes
    try:
        assert_scalable(cart)
        raise AssertionError("assert_scalable must raise on a cartesian plan")
    except ValueError:
        pass

    slow = spark.range(10).select(udf(lambda x: x + 1, "long")("id").alias("y"))
    assert {"row_udf"} <= {f["code"] for f in audit_plan(slow)}


def test_audit_passes_headline_queries(spark):
    """Every oracle-backed registered query must be fatal-finding-free —
    the library-API form of the explain-sweep this suite already runs."""
    from data_pipelines_using_llm_spark.operators.caching import release_barriers
    from data_pipelines_using_llm_spark.plans.audit import audit_plan

    offenders = {}
    for name, spec in all_queries().items():
        if name.startswith("stream_"):
            continue
        fatal = [
            f
            for f in audit_plan(spec.fn(spark, SF_DIR))
            if f["severity"] == "fatal"
        ]
        if fatal:
            offenders[name] = fatal
        release_barriers()
    assert not offenders, offenders


def test_audit_report_counts_scans_and_pushdown(spark):
    from data_pipelines_using_llm_spark.plans.audit import plan_report

    r = plan_report(all_queries()["forecast_revenue_delta"].fn(spark, SF_DIR))
    assert len(r.scans) == 1
    assert "GreaterThanOrEqual(l_shipdate" in r.scans[0]["pushed_filters"]
    assert r.partial_aggregates >= 1
    assert r.cartesian_products == 0 and r.python_row_udfs == 0


def test_audit_keys_only_distinct_counts_as_partial(spark):
    """A keys-only .distinct() compiles to partial->Exchange->final
    HashAggregate with NO partial_* function marker; the parser must
    still see the map-side combine (r7 plan-audit false-positive on
    dedup_ngram_jaccard) so no no_partial_agg warn is emitted."""
    from data_pipelines_using_llm_spark.plans.audit import (
        audit_plan,
        plan_report,
    )

    df = (
        spark.range(100)
        .selectExpr("id % 7 AS k", "id % 3 AS v")
        .repartition(4)
        .distinct()
    )
    r = plan_report(df)
    assert r.final_aggregates >= 2 and r.exchanges >= 1
    assert r.partial_aggregates >= 1
    assert not [f for f in audit_plan(df) if f["code"] == "no_partial_agg"]


def test_audit_final_agg_under_reshuffle_is_not_a_partial(spark):
    """A FINAL HashAggregate that sits under a LATER reshuffle Exchange
    (repartition after the agg) must not be miscounted as a map-side
    partial (r9 ADVICE): the structural matcher only accepts keys-only
    (Functions: []) aggregates, so the partial count here comes solely
    from the partial_count marker."""
    from pyspark.sql import functions as F

    from data_pipelines_using_llm_spark.plans.audit import (
        formatted_plan,
        plan_report,
    )

    df = (
        spark.range(100)
        .selectExpr("id % 7 AS k")
        .groupBy("k")
        .agg(F.count("*").alias("c"))
        .repartition(4)
    )
    text = formatted_plan(df)
    r = plan_report(df)
    # exactly the marker-based partials — the final agg under the
    # repartition Exchange contributes nothing structurally
    assert r.partial_aggregates == text.count("partial_") >= 1


def test_audit_tolerates_codegen_stars_in_tree(spark):
    """With AQE off the formatted tree prints `+- * HashAggregate (n)`
    (whole-stage-codegen star); the structural keys-only matcher must
    still see the distinct's map-side combine (r9 ADVICE: the old
    literal regex broke on the star)."""
    from data_pipelines_using_llm_spark.plans.audit import (
        audit_plan,
        formatted_plan,
        plan_report,
    )

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = (
            spark.range(100)
            .selectExpr("id % 7 AS k", "id % 3 AS v")
            .repartition(4)
            .distinct()
        )
        text = formatted_plan(df)
        assert "* HashAggregate" in text, "fixture lost its codegen star"
        r = plan_report(df)
        assert r.partial_aggregates >= 1
        assert not [
            f for f in audit_plan(df) if f["code"] == "no_partial_agg"
        ]
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_fuzzy_decontamination_eval_side_broadcasts(spark):
    """Candidate generation and verify must both broadcast the eval side
    (the benchmark corpus is tiny at any training scale); the corpus side
    must never appear under an Exchange for the candidate join, and no
    all-pairs product may exist anywhere in the plan."""
    plan = _plan(spark, "doc_decontamination_fuzzy")
    assert plan.count("BroadcastHashJoin") >= 2  # band join + grams verify
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_k_core_cuts_lineage_every_round(spark):
    """Each peel round references the previous edge list three times
    (degree + two semi-join probes); without a per-round persist the
    lineage grows 3^rounds and re-executes the peel (measured 43 s vs
    ~5 s at sf0.1).  Guard: the final plan must read the last round's
    edges from an InMemoryRelation, and the total number of persisted
    intermediates in the plan must cover base + every round."""
    from data_pipelines_using_llm_spark.plans.graph_queries import (
        KCORE_ROUNDS,
        trade_k_core,
    )

    df = trade_k_core(spark, SF_DIR)
    # cache substitution happens after analysis — read the plan the
    # CacheManager has rewritten
    cached = df._jdf.queryExecution().withCachedData().toString()
    # the nested cached plans carry one InMemoryRelation per earlier
    # round plus the base edge list
    assert cached.count("InMemoryRelation") >= KCORE_ROUNDS + 1


def test_dsir_pair_explosion_is_preaggregated(spark):
    """The DSIR scoring join must consume the (doc, bucket) PRE-AGGREGATED
    table (map-side combine before any exchange), never raw exploded
    tokens; and the plan must not contain a cartesian product."""
    plan = _plan(spark, "doc_dsir_select")
    assert "CartesianProduct" not in plan
    assert "partial_count" in plan or "partial_sum" in plan
    assert "TakeOrderedAndProject" in plan


def test_pca_projection_is_zero_shuffle_map(spark):
    """The projection's loadings/means enter as array literals, so the
    returned plan must be a pure narrow map over the embeddings scan:
    no Exchange, no Join, no explode — the property that makes it the
    right 100 TB projection (the stacks that PRODUCE the basis run at
    build time over d²-row tables, not in this plan)."""
    from data_pipelines_using_llm_spark.plans.similarity_queries import (
        embedding_pca_projection,
    )
    from data_pipelines_using_llm_spark.plans.audit import formatted_plan

    plan = formatted_plan(
        embedding_pca_projection(spark, "/root/testdata/sf0.001")
    )
    import re

    assert not re.search(r"\bExchange\b", plan)
    assert "Join" not in plan
    assert "Generate" not in plan  # no explode in the projection map


def test_pre_exchange_agg_regex_rejects_broadcast_and_reused():
    """The structural partial-aggregate detector must count aggregates
    feeding a plain shuffle Exchange, and must NOT count aggregates
    under BroadcastExchange/ReusedExchange (a broadcast result is not a
    map-side combine; counting it would suppress the no_partial_agg
    lint exactly where it matters)."""
    from data_pipelines_using_llm_spark.plans.audit import (
        _PRE_EXCHANGE_AGG_RE,
    )

    genuine = "   :  +- Exchange (26)\n   :     +- HashAggregate (25)\n"
    broadcast = (
        "   +- BroadcastExchange (22)\n      +- HashAggregate (21)\n"
    )
    reused = "   +- ReusedExchange (8)\n      +- HashAggregate (7)\n"
    assert len(_PRE_EXCHANGE_AGG_RE.findall(genuine)) == 1
    assert len(_PRE_EXCHANGE_AGG_RE.findall(broadcast)) == 0
    assert len(_PRE_EXCHANGE_AGG_RE.findall(reused)) == 0
    assert len(_PRE_EXCHANGE_AGG_RE.findall(genuine + broadcast + reused)) == 1
