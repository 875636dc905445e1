"""Expectation-engine query pack: a declarative rule suite over the
``events`` table evaluated in one scan (operators/expectations.py), with
the per-rule report oracle-mirrored in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from data_pipelines_using_llm_spark.operators import expectations as EX
from data_pipelines_using_llm_spark.registry import QuerySpec
from data_pipelines_using_llm_spark.sources.tables import load_table

VALUE_LO, VALUE_HI = 0, 100
KNOWN_TYPES = ("click", "view", "purchase", "signup")
PROPS_REGEX = r"^\{.*\}$"
MAX_RATE = 0.05


def events_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-rule quality contract on events — null guard, range guard,
    enum guard, format regex, a custom freshness predicate, and a key
    uniqueness rule — all but ``unique`` fused into ONE conditional
    aggregation over one scan (|rules| never multiplies scan count).
    """
    ev = load_table(spark, sf_dir, "events")
    rules = [
        EX.not_null("user_id"),
        EX.in_range("value", VALUE_LO, VALUE_HI),
        EX.in_set("event_type", KNOWN_TYPES),
        EX.matches("props", PROPS_REGEX),
        EX.custom("fresh_2024", "ts IS NOT NULL AND year(ts) = 2024"),
        EX.unique("event_id"),
    ]
    return EX.expect(ev, rules, max_violation_rate=MAX_RATE)


_TYPES_SQL = ", ".join(f"'{t}'" for t in KNOWN_TYPES)

EVENTS_EXPECTATIONS_ORACLE = rf"""
WITH base AS (
    SELECT count(*) AS n_rows,
           sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS v0_raw,
           sum(CASE WHEN value IS NOT NULL
                     AND NOT (value BETWEEN {VALUE_LO} AND {VALUE_HI})
                    THEN 1 ELSE 0 END) AS v1_raw,
           sum(CASE WHEN event_type IS NOT NULL
                     AND event_type NOT IN ({_TYPES_SQL})
                    THEN 1 ELSE 0 END) AS v2_raw,
           sum(CASE WHEN props IS NOT NULL
                     AND NOT regexp_matches(props, '^\{{.*\}}$')
                    THEN 1 ELSE 0 END) AS v3_raw,
           sum(CASE WHEN NOT coalesce(ts IS NOT NULL AND year(ts) = 2024, FALSE)
                    THEN 1 ELSE 0 END) AS v4_raw
    FROM events
),
uniq AS (
    SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
           CAST(sum(cnt) - count(*) AS BIGINT) AS n_violations
    FROM (SELECT event_id, count(*) AS cnt FROM events GROUP BY event_id)
),
report AS (
    SELECT 'not_null_user_id' AS rule, n_rows, CAST(v0_raw AS BIGINT) AS n_violations FROM base
    UNION ALL SELECT 'in_range_value', n_rows, CAST(v1_raw AS BIGINT) FROM base
    UNION ALL SELECT 'in_set_event_type', n_rows, CAST(v2_raw AS BIGINT) FROM base
    UNION ALL SELECT 'matches_props', n_rows, CAST(v3_raw AS BIGINT) FROM base
    UNION ALL SELECT 'fresh_2024', n_rows, CAST(v4_raw AS BIGINT) FROM base
    UNION ALL SELECT 'unique_event_id', n_rows, n_violations FROM uniq
)
SELECT rule, n_rows, n_violations,
       CAST(n_violations AS DOUBLE) / n_rows AS violation_rate,
       CAST(n_violations AS DOUBLE) / n_rows <= {MAX_RATE} AS passed
FROM report
"""


QUARANTINE_ORDER = ["ts", "user_id", "event_type", "value", "props"]


def events_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-letter routing for the expectation suite (r8 task 7): the
    rows the rules reject, each carrying the comma-joined names of the
    rules it violates — the flag-and-filter primitive
    (operators/expectations.py::quarantine_split; reference ancestor:
    the flag-then-filter cleaning in ``First experiment/Claude Opus
    4.py:248-256``) whose pass-side complement publishes via
    sinks/writers.py::write_audit_publish_split.  One scan: every
    row-level rule is a fused column predicate; the ``unique`` rule
    adds its keep-first window over the same scan (deterministic
    tiebreak = the full remaining row)."""
    ev = load_table(spark, sf_dir, "events")
    rules = [
        EX.not_null("user_id"),
        EX.in_range("value", VALUE_LO, VALUE_HI),
        EX.in_set("event_type", KNOWN_TYPES),
        EX.unique("event_id"),
    ]
    _passed, quarantined = EX.quarantine_split(
        ev, rules, unique_order=QUARANTINE_ORDER
    )
    return quarantined.select(
        "event_id", "user_id", "event_type", "value", "violated_rules"
    )


EVENTS_QUARANTINE_ORACLE = f"""
WITH ranked AS (
    SELECT event_id, user_id, event_type, value,
           row_number() OVER (
               PARTITION BY event_id
               ORDER BY ts NULLS FIRST, user_id NULLS FIRST,
                        event_type NULLS FIRST, value NULLS FIRST,
                        props NULLS FIRST
           ) AS rn
    FROM events
),
flagged AS (
    SELECT event_id, user_id, event_type, value,
           concat_ws(',',
               CASE WHEN user_id IS NULL THEN 'not_null_user_id' END,
               CASE WHEN value IS NOT NULL
                     AND NOT (value BETWEEN {VALUE_LO} AND {VALUE_HI})
                    THEN 'in_range_value' END,
               CASE WHEN event_type IS NOT NULL
                     AND event_type NOT IN ({_TYPES_SQL})
                    THEN 'in_set_event_type' END,
               CASE WHEN rn > 1 THEN 'unique_event_id' END
           ) AS violated_rules
    FROM ranked
)
SELECT event_id, user_id, event_type, value, violated_rules
FROM flagged WHERE violated_rules <> ''
"""


QUERIES: dict[str, QuerySpec] = {
    "events_expectations": QuerySpec(
        events_expectations,
        EVENTS_EXPECTATIONS_ORACLE,
        "declarative expectations: N rules, one scan, per-rule report",
    ),
    "events_quarantine": QuerySpec(
        events_quarantine,
        EVENTS_QUARANTINE_ORACLE,
        "dead-letter split: violating rows with violated-rule names "
        "(flag-and-filter, one scan + keep-first window)",
    ),
}
