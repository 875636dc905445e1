"""Physical-plan audit: the `.explain("formatted")` checks the test suite
applies to every query (tests/test_plans.py), packaged as a library API so
a pipeline can LINT ITS OWN PLAN before burning cluster hours.

At 100 TB the failure mode is rarely a wrong answer — it is a plan that
silently lost a pushdown, broadcast, or partial aggregate and now moves
10-1000x more data than intended.  ``plan_report`` extracts the
scale-relevant facts from the formatted plan; ``audit_plan`` turns them
into findings with severities, so CI (or an operator) can gate on
``findings(df, fatal_only=True)`` the way this repo's own tests do.
"""

from __future__ import annotations

import contextlib
import io
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class PlanReport:
    cartesian_products: int = 0
    broadcast_nested_loops: int = 0
    exchanges: int = 0
    single_partition_exchanges: int = 0
    broadcast_joins: int = 0
    shuffle_joins: int = 0  # SortMergeJoin + ShuffledHashJoin
    partial_aggregates: int = 0
    final_aggregates: int = 0
    scans: list[dict] = field(default_factory=list)  # location/pushed/schema
    unpartitioned_windows: int = 0
    python_row_udfs: int = 0  # BatchEvalPython (row-at-a-time)
    arrow_udfs: int = 0  # ArrowEvalPython / mapInPandas stages
    text: str = ""


#: keys-only distinct: partial->Exchange->final HashAggregate with no
#: partial_* function marker.  The lookbehind rejects Broadcast/Reused
#: exchanges (aggregates under those are shipped results, not combines);
#: the optional ``* `` tolerates whole-stage-codegen stars in the tree
#: (``+- * HashAggregate (5)``); the captured node id is cross-checked
#: against the detail sections so ONLY keys-only aggregates
#: (``Functions: []``) count structurally — a FINAL aggregate sitting
#: under a later reshuffle Exchange carries real function markers and
#: must NOT be mistaken for a map-side partial (r9 ADVICE: the old
#: regex did exactly that, silently suppressing the no_partial_agg
#: warn, and broke outright on codegen stars).
_PRE_EXCHANGE_AGG_RE = re.compile(
    r"(?<![A-Za-z])Exchange \(\d+\)\n[^\n]*\+- "
    r"(?:\* )?(?:Hash|Object\w*Hash|Sort)Aggregate \((\d+)\)"
)

#: detail-section header + body for each aggregate node, used to find
#: the keys-only ones (empty function list)
_AGG_DETAIL_RE = re.compile(
    r"\((\d+)\) (?:Hash|Object\w*Hash|Sort)Aggregate[^\n]*\n"
    r"(.*?)(?=\n\(\d+\)|\Z)",
    re.S,
)


def _keys_only_agg_ids(text: str) -> set[str]:
    """Node ids of aggregates whose detail section shows an EMPTY
    function list (``Functions: []``) — the keys-only distinct shape."""
    return {
        m.group(1)
        for m in _AGG_DETAIL_RE.finditer(text)
        if "Functions: []" in m.group(2)
    }


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def plan_report(df: DataFrame) -> PlanReport:
    """Parse the formatted physical plan into scale-relevant counters."""
    text = formatted_plan(df)
    r = PlanReport(text=text)
    r.cartesian_products = text.count("CartesianProduct")
    r.broadcast_nested_loops = text.count("BroadcastNestedLoopJoin")
    r.exchanges = len(re.findall(r"\bExchange\b", text))
    r.single_partition_exchanges = text.count("SinglePartition")
    r.broadcast_joins = text.count("BroadcastHashJoin")
    r.shuffle_joins = text.count("SortMergeJoin") + text.count("ShuffledHashJoin")
    # partial_* function markers cover count/sum/...; a keys-only
    # distinct compiles to partial->Exchange->final HashAggregate with
    # NO function marker (Functions: []), so ALSO count aggregates that
    # sit structurally under an Exchange in the plan tree — otherwise
    # every .distinct() reads as "no map-side combine" (the r7 plan-audit
    # false-positive on dedup_ngram_jaccard).  The structural count is
    # restricted to keys-only aggregates (detail cross-check): a FINAL
    # aggregate under a later reshuffle Exchange has real function
    # markers and is NOT a map-side partial.
    keys_only = _keys_only_agg_ids(text)
    r.partial_aggregates = text.count("partial_") + sum(
        1
        for m in _PRE_EXCHANGE_AGG_RE.finditer(text)
        if m.group(1) in keys_only
    )
    r.final_aggregates = text.count("HashAggregate")
    r.unpartitioned_windows = len(
        re.findall(r"Window.*\n(?:.*\n)*?.*Arguments:.*\[\], \[", text)
    )
    r.python_row_udfs = text.count("BatchEvalPython")
    r.arrow_udfs = text.count("ArrowEvalPython") + text.count("MapInPandas")

    # one scan record per detail section
    for m in re.finditer(r"\(\d+\) Scan parquet.*?(?=\n\(\d+\)|\Z)", text, re.S):
        sec = m.group(0)
        loc = re.search(r"Location.*?\[(.*?)\]", sec)
        pushed = re.search(r"PushedFilters: \[(.*?)\]", sec)
        schema = re.search(r"ReadSchema: (.*)", sec)
        r.scans.append(
            {
                "location": loc.group(1) if loc else "",
                "pushed_filters": pushed.group(1) if pushed else "",
                "read_schema": schema.group(1).strip() if schema else "",
            }
        )
    return r


#: finding code -> (severity, human description)
_RULES = {
    "cartesian": ("fatal", "non-broadcast CartesianProduct — quadratic at scale"),
    "row_udf": ("fatal", "row-at-a-time Python UDF in the plan — 10-100x vs Arrow"),
    "no_partial_agg": (
        "warn",
        "aggregation without map-side partials — full rows cross the exchange",
    ),
    "single_partition_sort": (
        "warn",
        "unpartitioned window/global sort — one task owns the whole dataset",
    ),
    "wide_scan": (
        "info",
        "a scan reads >12 columns — check the projection actually needs them",
    ),
}


def audit_plan(df: DataFrame) -> list[dict]:
    """Lint a DataFrame's physical plan; returns findings as
    ``{code, severity, detail}`` dicts (empty list = clean)."""
    r = plan_report(df)
    findings: list[dict] = []

    def add(code: str, detail: str) -> None:
        sev, desc = _RULES[code]
        findings.append({"code": code, "severity": sev, "detail": f"{desc}: {detail}"})

    if r.cartesian_products:
        add("cartesian", f"{r.cartesian_products} in plan")
    if r.python_row_udfs:
        add("row_udf", f"{r.python_row_udfs} BatchEvalPython stage(s)")
    if r.final_aggregates and not r.partial_aggregates and r.exchanges:
        add("no_partial_agg", f"{r.final_aggregates} aggregate(s), 0 partial")
    if r.unpartitioned_windows:
        add("single_partition_sort", f"{r.unpartitioned_windows} window(s)")
    for s in r.scans:
        n_cols = s["read_schema"].count(",") + 1 if s["read_schema"] else 0
        if n_cols > 12:
            add("wide_scan", f"{n_cols} columns from {s['location'][:80]}")
    return findings


def assert_scalable(df: DataFrame) -> None:
    """Raise ``ValueError`` listing fatal findings (the CI gate form)."""
    fatal = [f for f in audit_plan(df) if f["severity"] == "fatal"]
    if fatal:
        raise ValueError("; ".join(f["detail"] for f in fatal))
