"""Declarative pipeline specs — the engine-native form of what the
reference's 21 generated scripts each reimplement by hand.

Every reference script is the same story (SURVEY.md §0): source →
project/derive → quality checks → dedup/clean → aggregate → sink, with
the steps wired slightly differently per LLM.  This module makes the
story DATA: a spec is a plain dict (JSON-serializable — the form an
LLM, a config file, or a UI would emit), and :func:`run_pipeline`
compiles it onto the operator library, so every step inherits the
library's scale discipline (deterministic dedup tiebreakers, expectation
gating, WAP publishing) instead of re-deriving it per script.

Design limits, on purpose: steps are a LINEAR chain over one primary
table (joins pull in secondary sources); expressions are SQL strings
evaluated by ``F.expr`` — fully visible to Catalyst, nothing
interpreted row-by-row; unknown ops fail loudly with the vocabulary in
the message.  This is a composition surface, not a new planner.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipelines_using_llm_spark.operators import cleaning, expectations as EX
from data_pipelines_using_llm_spark.sources.tables import load_table

_RULE_BUILDERS: dict[str, Callable[..., Any]] = {
    "not_null": lambda r: EX.not_null(r["col"]),
    "in_range": lambda r: EX.in_range(r["col"], r["lo"], r["hi"]),
    "in_set": lambda r: EX.in_set(r["col"], tuple(r["values"])),
    "matches": lambda r: EX.matches(r["col"], r["regex"]),
    "unique": lambda r: EX.unique(*r["cols"]),
    "custom": lambda r: EX.custom(r["name"], r["predicate"]),
}


def _rules(specs: list[dict]) -> list:
    out = []
    for r in specs:
        kind = r.get("kind")
        if kind not in _RULE_BUILDERS:
            raise ValueError(
                f"unknown rule kind {kind!r}; known: {sorted(_RULE_BUILDERS)}"
            )
        out.append(_RULE_BUILDERS[kind](r))
    return out


def _order_cols(specs: list[str]) -> list:
    cols = []
    for s in specs:
        parts = s.split()
        c = F.col(parts[0])
        if len(parts) == 2 and parts[1].lower() == "desc":
            c = c.desc()
        elif len(parts) > 1:
            raise ValueError(f"order_by entry must be 'col [desc]': {s!r}")
        cols.append(c)
    return cols


def _step_filter(df: DataFrame, step: dict, _: dict) -> DataFrame:
    return df.filter(F.expr(step["predicate"]))


def _step_select(df: DataFrame, step: dict, _: dict) -> DataFrame:
    return df.select(*step["cols"])


def _step_derive(df: DataFrame, step: dict, _: dict) -> DataFrame:
    for name, expr in step["cols"].items():
        df = df.withColumn(name, F.expr(expr))
    return df


def _step_rename(df: DataFrame, step: dict, _: dict) -> DataFrame:
    for old, new in step["map"].items():
        df = df.withColumnRenamed(old, new)
    return df


def _step_cast(df: DataFrame, step: dict, _: dict) -> DataFrame:
    for col, typ in step["map"].items():
        df = df.withColumn(col, F.col(col).cast(typ))
    return df


def _step_drop_nulls(df: DataFrame, step: dict, _: dict) -> DataFrame:
    return cleaning.drop_any_null(df, step["cols"])


def _step_dedup(df: DataFrame, step: dict, _: dict) -> DataFrame:
    order_by = step.get("order_by")
    if not order_by:
        raise ValueError(
            "dedup step requires order_by (a total order per key) — "
            "nondeterministic keep-any must be asked for explicitly via "
            "{'op': 'dedup_any'}"
        )
    return cleaning.dedup_deterministic(
        df, step["key"], _order_cols(order_by)
    )


def _step_dedup_any(df: DataFrame, step: dict, _: dict) -> DataFrame:
    return cleaning.dedup_keep_any(df, step["key"])


def _step_expect(df: DataFrame, step: dict, _: dict) -> DataFrame:
    report = EX.expect(
        df, _rules(step["rules"]), step.get("max_violation_rate", 0.0)
    )
    failed = [r for r in report.collect() if not r["passed"]]
    if failed and step.get("on_fail", "error") == "error":
        detail = "; ".join(
            f"{r['rule']}: {r['n_violations']}/{r['n_rows']}" for r in failed
        )
        raise ValueError(f"expectations failed — {detail}")
    return df


def _step_join(df: DataFrame, step: dict, sources: dict) -> DataFrame:
    other = sources[step["source"]]
    if step.get("select"):
        other = other.select(*step["select"])
    if step.get("broadcast", False):
        other = F.broadcast(other)
    return df.join(other, step["on"], step.get("how", "inner"))


def _step_aggregate(df: DataFrame, step: dict, _: dict) -> DataFrame:
    aggs = [
        F.expr(expr).alias(name) for name, expr in step["metrics"].items()
    ]
    keys = list(step.get("group_by", []))
    win = step.get("window")
    if win:
        # time-windowed grouping: F.window works identically on batch
        # and streaming DataFrames, which is what lets ONE spec run both
        # ways (see run_pipeline_streaming)
        wcol = F.window(win["col"], win["duration"]).alias("_w")
        out = df.groupBy(wcol, *keys).agg(*aggs)
        return out.select(
            F.col("_w.start").alias("window_start"),
            *keys,
            *step["metrics"].keys(),
        )
    return df.groupBy(*keys).agg(*aggs)


_STEPS: dict[str, Callable[[DataFrame, dict, dict], DataFrame]] = {
    "filter": _step_filter,
    "select": _step_select,
    "derive": _step_derive,
    "rename": _step_rename,
    "cast": _step_cast,
    "drop_nulls": _step_drop_nulls,
    "dedup": _step_dedup,
    "dedup_any": _step_dedup_any,
    "expect": _step_expect,
    "join": _step_join,
    "aggregate": _step_aggregate,
}


def run_pipeline(
    spark: SparkSession,
    spec: dict,
    sf_dir: str | None = None,
    sources: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Compile and run a pipeline spec; returns the final DataFrame.

    Sources resolve by name from ``sources`` first, then from the
    catalog tables under ``sf_dir`` (sources/tables.py::load_table).
    If the spec carries a ``sink``, the result is also published:
    ``mode`` "append"/"overwrite" use the plain writer, "wap" stages,
    audits with ``sink.rules`` and snapshot-swaps
    (sinks/writers.py::write_audit_publish), "versioned" lands an
    immutable time-travel snapshot (sinks/versioned.py).
    """
    sources = dict(sources or {})

    def resolve(name: str) -> DataFrame:
        if name not in sources:
            if sf_dir is None:
                raise ValueError(
                    f"unknown source {name!r} and no sf_dir to load from"
                )
            sources[name] = load_table(spark, sf_dir, name)
        return sources[name]

    src = spec["source"]
    df = resolve(src if isinstance(src, str) else src["table"])
    for i, step in enumerate(spec.get("steps", [])):
        op = step.get("op")
        if op not in _STEPS:
            raise ValueError(
                f"step {i}: unknown op {op!r}; known: {sorted(_STEPS)}"
            )
        if op == "join":
            resolve(step["source"])
        try:
            df = _STEPS[op](df, step, sources)
        except (KeyError, TypeError) as exc:
            raise ValueError(f"step {i} ({op}): bad spec — {exc}") from exc

    sink = spec.get("sink")
    if sink:
        mode = sink.get("mode", "append")
        if mode == "wap":
            from data_pipelines_using_llm_spark.sinks.writers import (
                write_audit_publish,
            )

            write_audit_publish(
                df,
                sink["path"],
                _rules(sink.get("rules", [])),
                sink.get("max_violation_rate", 0.0),
            )
        elif mode == "versioned":
            from data_pipelines_using_llm_spark.sinks.versioned import (
                versioned_write,
            )

            versioned_write(df, sink["path"], sink.get("keep", 3))
        elif mode in ("append", "overwrite"):
            from data_pipelines_using_llm_spark.sinks.writers import write_table

            write_table(
                df, sink["path"], mode, sink.get("partition_by")
            )
        else:
            raise ValueError(f"unknown sink mode {mode!r}")
    return df


# ---- the spec compiler itself under the driver's hash gate ----

from data_pipelines_using_llm_spark.registry import QuerySpec  # noqa: E402

#: The medallion archetype as data: clean -> deterministic dedup ->
#: monthly gold.  Registered so the COMPILER (not just the operators it
#: lowers to) is verified cross-engine every round.
MEDALLION_SPEC: dict = {
    "source": "events",
    "steps": [
        {"op": "drop_nulls", "cols": ["user_id", "ts", "value"]},
        {
            "op": "dedup",
            "key": ["event_id"],
            "order_by": ["ts desc", "user_id"],
        },
        {"op": "derive", "cols": {"month": "date_trunc('month', ts)"}},
        {
            "op": "aggregate",
            "group_by": ["event_type", "month"],
            "metrics": {
                "n_events": "count(1)",
                "sum_value": (
                    "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)"
                ),
            },
        },
    ],
}


def spec_monthly_gold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The declarative-spec medallion pipeline, end to end."""
    return run_pipeline(spark, MEDALLION_SPEC, sf_dir=sf_dir)


SPEC_MONTHLY_GOLD_ORACLE = """
WITH clean AS (
    SELECT * FROM events
    WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
),
d AS (
    SELECT *, row_number() OVER (
        PARTITION BY event_id ORDER BY ts DESC, user_id
    ) AS rn
    FROM clean
)
SELECT event_type, date_trunc('month', ts) AS month,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM d WHERE rn = 1
GROUP BY 1, 2
"""

QUERIES: dict[str, QuerySpec] = {
    "spec_monthly_gold": QuerySpec(
        spec_monthly_gold,
        SPEC_MONTHLY_GOLD_ORACLE,
        "declarative-spec medallion pipeline (compiler under the gate)",
    ),
}


#: steps whose semantics are identical on a streaming DataFrame — the
#: subset one spec can run in BOTH engines' modes (stateful streaming
#: ops with distinct semantics — join/dedup/expect — are refused so a
#: spec can't silently mean two different things)
_STREAMING_SAFE = frozenset(
    {"filter", "select", "derive", "rename", "cast", "drop_nulls",
     "aggregate"}
)


def run_pipeline_streaming(
    spark: SparkSession,
    spec: dict,
    sf_dir: str,
    sink_table: str,
    output_mode: str = "complete",
) -> DataFrame:
    """Execute the SAME spec as a Structured Streaming job: readStream
    source (+ watermark from ``spec['streaming']``), the streaming-safe
    step subset, AvailableNow to a memory sink — on bounded input the
    result equals :func:`run_pipeline`'s batch execution of the same
    spec, which is exactly what the registered query pair
    ``spec_batch_hourly`` / ``spec_stream_hourly`` proves under the
    driver's cross-engine gate (one spec, two execution modes, one
    oracle).

    Only the ``events`` source has a streaming adapter in this repo
    (streaming/ingest.py); non-stateless ops raise rather than silently
    changing meaning between modes.
    """
    from data_pipelines_using_llm_spark.streaming.ingest import (
        run_to_table,
        stream_events,
    )

    src = spec["source"]
    name = src if isinstance(src, str) else src["table"]
    if name != "events":
        raise ValueError(
            f"streaming source adapter exists only for 'events': {name!r}"
        )
    df = stream_events(spark, sf_dir)
    wm = spec.get("streaming", {}).get("watermark")
    if wm:
        df = df.withWatermark(wm["col"], wm["delay"])
    for i, step in enumerate(spec.get("steps", [])):
        op = step.get("op")
        if op not in _STREAMING_SAFE:
            raise ValueError(
                f"step {i}: op {op!r} is not streaming-safe "
                f"(allowed: {sorted(_STREAMING_SAFE)})"
            )
        df = _STEPS[op](df, step, {})
    return run_to_table(df, spark, sink_table, output_mode)


HOURLY_SPEC: dict = {
    "source": "events",
    "streaming": {"watermark": {"col": "ts", "delay": "10 minutes"}},
    "steps": [
        {"op": "filter", "predicate": "value IS NOT NULL"},
        {
            "op": "aggregate",
            "window": {"col": "ts", "duration": "1 hour"},
            "group_by": ["event_type"],
            "metrics": {
                "n_events": "count(1)",
                "sum_value": (
                    "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)"
                ),
            },
        },
    ],
}


def spec_batch_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOURLY_SPEC executed by the BATCH compiler."""
    return run_pipeline(spark, HOURLY_SPEC, sf_dir=sf_dir)


def spec_stream_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOURLY_SPEC executed as a Structured Streaming job — same spec,
    same oracle as ``spec_batch_hourly``."""
    return run_pipeline_streaming(
        spark, HOURLY_SPEC, sf_dir, "dpls_spec_stream_hourly"
    )


SPEC_HOURLY_ORACLE = """
SELECT date_trunc('hour', ts) AS window_start,
       event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
WHERE value IS NOT NULL
GROUP BY 1, 2
"""

QUERIES["spec_batch_hourly"] = QuerySpec(
    spec_batch_hourly,
    SPEC_HOURLY_ORACLE,
    "one spec, batch execution (windowed aggregate via F.window)",
)
QUERIES["spec_stream_hourly"] = QuerySpec(
    spec_stream_hourly,
    SPEC_HOURLY_ORACLE,
    "the SAME spec, streaming execution — one oracle gates both modes",
)


#: Third-experiment archetype as data: two sources, broadcast-joined,
#: filtered, derived — the "merge two feeds into a silver table" shape.
ENRICHED_ORDERS_SPEC: dict = {
    "source": "orders",
    "steps": [
        {"op": "filter", "predicate": "o_totalprice > 1000"},
        {"op": "rename", "map": {"o_custkey": "c_custkey"}},
        {
            "op": "join",
            "source": "customer",
            "select": ["c_custkey", "c_name", "c_nationkey"],
            "on": ["c_custkey"],
            "how": "inner",
            "broadcast": True,
        },
        {
            "op": "derive",
            "cols": {"order_year": "year(o_orderdate)"},
        },
        {
            "op": "select",
            "cols": [
                "o_orderkey",
                "c_custkey",
                "c_name",
                "c_nationkey",
                "order_year",
                "o_totalprice",
            ],
        },
    ],
}


def spec_enriched_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The two-source join archetype (Third experiment) as a spec."""
    return run_pipeline(spark, ENRICHED_ORDERS_SPEC, sf_dir=sf_dir)


SPEC_ENRICHED_ORDERS_ORACLE = """
SELECT o.o_orderkey, c.c_custkey, c.c_name, c.c_nationkey,
       CAST(year(o.o_orderdate) AS INT) AS order_year, o.o_totalprice
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
WHERE o.o_totalprice > 1000
"""

QUERIES["spec_enriched_orders"] = QuerySpec(
    spec_enriched_orders,
    SPEC_ENRICHED_ORDERS_ORACLE,
    "two-source broadcast-join archetype as a spec (Third experiment)",
)
