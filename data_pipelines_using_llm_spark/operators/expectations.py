"""Declarative data-quality expectations, evaluated in ONE pass.

Generalizes the reference's ad-hoc quality checks (null counts, range
guards, health flags — ``Second Experiment/GPT 5.py:141-162``,
``First experiment/Claude Sonnet 4.py:229-233``) into a rule engine: the
caller declares rules, the engine compiles every rule into a conditional
aggregate over ONE scan and returns a per-rule report (violations, rate,
pass/fail against a threshold).

Scale: N rules cost one table scan regardless of N — each rule is a
``sum(case when violated then 1 end)`` running inside the same
whole-stage-codegen'd aggregation (the reference's loop of per-check
jobs re-scans per check).  ``unique`` rules are the exception (they need
a grouped count) and are evaluated together in one extra aggregation per
distinct key set.  The report is |rules| rows.

Rule types (all pure column expressions, so any engine with the same SQL
semantics produces the identical report — oracle-checkable):
- ``not_null(col)``
- ``in_range(col, lo, hi)``       NULLs don't violate (compose not_null)
- ``in_set(col, values)``
- ``matches(col, regex)``
- ``unique(cols)``                violations = rows beyond the first per key
- ``custom(name, predicate_sql)`` violated when the SQL predicate is FALSE
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    name: str
    kind: str
    column: str | None = None
    params: tuple = field(default=())


def not_null(col: str) -> Rule:
    return Rule(f"not_null_{col}", "not_null", col)


def in_range(col: str, lo, hi) -> Rule:
    return Rule(f"in_range_{col}", "in_range", col, (lo, hi))


def in_set(col: str, values: tuple) -> Rule:
    return Rule(f"in_set_{col}", "in_set", col, tuple(values))


def matches(col: str, regex: str) -> Rule:
    return Rule(f"matches_{col}", "matches", col, (regex,))


def unique(*cols: str) -> Rule:
    return Rule("unique_" + "_".join(cols), "unique", None, tuple(cols))


def custom(name: str, predicate_sql: str) -> Rule:
    """Violated where the predicate is NOT true (false or NULL)."""
    return Rule(name, "custom", None, (predicate_sql,))


def _violation_expr(rule: Rule):
    c = F.col(rule.column) if rule.column else None
    if rule.kind == "not_null":
        return c.isNull()
    if rule.kind == "in_range":
        lo, hi = rule.params
        return c.isNotNull() & ~c.between(lo, hi)
    if rule.kind == "in_set":
        return c.isNotNull() & ~c.isin(list(rule.params))
    if rule.kind == "matches":
        return c.isNotNull() & ~c.rlike(rule.params[0])
    if rule.kind == "custom":
        return ~F.coalesce(F.expr(rule.params[0]), F.lit(False))
    raise ValueError(f"unknown rule kind {rule.kind}")


def flag_violations(
    df: DataFrame,
    rules: list[Rule],
    unique_order: list[str] | None = None,
    out_col: str = "violated_rules",
) -> DataFrame:
    """Row-level flag-and-filter primitive (the reference's
    flag-then-filter cleaning, ``First experiment/Claude Opus 4.py:
    248-256``, generalized to the rule engine): every input row comes
    back with ``out_col`` = the comma-joined names of the rules it
    violates, in declared rule order ('' = clean row).

    ONE scan, no joins: each row-level rule is a column predicate fused
    into one projection (``concat_ws`` skips non-violated NULL slots,
    so the same expression is oracle-expressible verbatim in DuckDB).
    ``unique`` rules are the exception as always — keep-first needs a
    total order, so they cost one window shuffle over the SAME scan and
    require ``unique_order`` (the deterministic tiebreak columns;
    violators are rows ranked past the first in their key group, the
    exact rows :func:`expect` counts)."""
    row_rules = [r for r in rules if r.kind != "unique"]
    unique_rules = [r for r in rules if r.kind == "unique"]
    if unique_rules and not unique_order:
        raise ValueError(
            "flag_violations: unique rules need unique_order (a "
            "deterministic tiebreak) to decide which duplicate rows "
            "are the violators"
        )
    from pyspark.sql.window import Window

    out = df
    slots: list = []
    for r in rules:
        if r.kind == "unique":
            w = Window.partitionBy(*[F.col(c) for c in r.params]).orderBy(
                *[F.col(c) for c in unique_order]
            )
            rn_col = f"__rn_{r.name}"
            out = out.withColumn(rn_col, F.row_number().over(w))
            slots.append((r.name, F.col(rn_col) > 1))
        else:
            slots.append((r.name, _violation_expr(r)))
    flagged = out.withColumn(
        out_col,
        F.concat_ws(
            ",",
            *[F.when(cond, F.lit(name)) for name, cond in slots],
        ),
    )
    return flagged.drop(
        *[f"__rn_{r.name}" for r in unique_rules]
    )


def quarantine_split(
    df: DataFrame,
    rules: list[Rule],
    unique_order: list[str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Split ``df`` into (passed, quarantined) in one flagged pass:
    ``passed`` carries the input columns of every clean row;
    ``quarantined`` carries every violating row PLUS
    ``violated_rules`` naming what it broke — the dead-letter routing
    the report-only :func:`expect` cannot do.  By construction
    passed ∪ quarantined ≡ input (each row goes to exactly one side —
    proven in tests/test_expectations_quarantine.py).  Callers that
    write both sides should persist the flagged intermediate so the
    two filters share one materialization
    (:func:`sinks.writers.write_audit_publish_split` does)."""
    flagged = flag_violations(df, rules, unique_order)
    passed = flagged.filter(F.col("violated_rules") == "").drop(
        "violated_rules"
    )
    quarantined = flagged.filter(F.col("violated_rules") != "")
    return passed, quarantined


def expect(
    df: DataFrame,
    rules: list[Rule],
    max_violation_rate: float = 0.0,
) -> DataFrame:
    """Evaluate all rules; returns one row per rule:
    ``(rule, n_rows, n_violations, violation_rate, passed)``.

    ``passed`` compares the rate against ``max_violation_rate`` (0.0 =
    strict).  Row counts are exact; the rate is an exact-integer ratio
    computed in double, so the report is engine-portable.
    """
    if not rules:
        raise ValueError("expect() requires at least one rule")
    for r in rules:
        # names are F.lit data (never SQL text), so metacharacters are
        # inert; the empty/newline rejection just keeps report rows
        # printable and one-per-line
        if not r.name or "\n" in r.name:
            raise ValueError(f"invalid rule name: {r.name!r}")
    names = [r.name for r in rules]
    if len(set(names)) != len(names):
        dupes = sorted({n for n in names if names.count(n) > 1})
        raise ValueError(
            f"duplicate rule names make per-rule report rows ambiguous: {dupes}"
        )

    scan_rules = [r for r in rules if r.kind != "unique"]
    unique_rules = [r for r in rules if r.kind == "unique"]

    reports: list[DataFrame] = []
    if scan_rules:
        aggs = [F.count(F.lit(1)).alias("n_rows")] + [
            F.sum(F.when(_violation_expr(r), 1).otherwise(0)).alias(f"v_{i}")
            for i, r in enumerate(scan_rules)
        ]
        row = df.agg(*aggs)
        # rule names are injected as F.lit columns (never spliced into SQL
        # text), so quotes or other metacharacters in a custom() name are
        # inert data rather than a malformed stack() expression
        stack_args: list = [F.lit(len(scan_rules))]
        for i, r in enumerate(scan_rules):
            stack_args.append(F.lit(r.name))
            stack_args.append(F.col(f"v_{i}"))
        stacked = row.select(
            "n_rows",
            F.stack(*stack_args).alias("rule", "n_violations"),
        )
        reports.append(stacked.select("rule", "n_rows", "n_violations"))

    for r in unique_rules:
        # violations = rows beyond the first occurrence of each key
        per_key = df.groupBy(*[F.col(c) for c in r.params]).agg(
            F.count(F.lit(1)).alias("cnt")
        )
        agg = per_key.agg(
            F.sum("cnt").alias("n_rows"),
            (F.sum("cnt") - F.count(F.lit(1))).alias("n_violations"),
        )
        reports.append(agg.select(F.lit(r.name).alias("rule"), "n_rows", "n_violations"))

    out = reports[0]
    for extra in reports[1:]:
        out = out.unionByName(extra)
    # An empty table has zero violations by definition: rate 0.0, passed.
    # sum() over zero rows is NULL, so counts are coalesced to 0 first
    # (and 0/0 would otherwise yield NULL rate and NULL passed).
    n_rows = F.coalesce(F.col("n_rows"), F.lit(0))
    n_viol = F.coalesce(F.col("n_violations"), F.lit(0))
    rate = F.when(n_rows == 0, F.lit(0.0)).otherwise(
        n_viol.cast("double") / n_rows
    )
    return out.select(
        "rule",
        n_rows.cast("long").alias("n_rows"),
        n_viol.cast("long").alias("n_violations"),
        rate.alias("violation_rate"),
        (rate <= max_violation_rate).alias("passed"),
    )
