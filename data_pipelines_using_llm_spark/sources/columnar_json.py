"""Columnar-array JSON ingestion (SURVEY.md §2.1 S2–S4) — the engine's
replacement for the reference's driver-side row pivot.

The reference parses the struct-of-arrays payload (``hourly.time`` plus one
parallel array per metric) in a single-threaded Python loop on the driver
(``First experiment/Claude Opus 4.py:53-84``) — O(rows×cols) in driver
memory, the #1 scalability defect of the corpus (SURVEY.md §4.3.2).
Notably, three reference scripts import ``explode, arrays_zip`` and never
use them (``Second Experiment/Claude Opus 4.py:15``,
``Third Experiment/Claude Opus 4.py:14-15``) — this module is that missing
implementation: ``from_json`` → ``posexplode(arrays_zip(...))`` runs
distributed on executors, so a 100 TB landing zone of JSON payloads pivots
in parallel with no driver involvement.

Length-mismatch policies (the three reference behaviors):
- ``pad_null``  — align to ``len(time)``, missing metric values become NULL
  (``First experiment/GPT 5 MINI.py:49-55``);
- ``truncate_min`` — align to the shortest array
  (``Second Experiment/GPT 5 mini.py:83-86``);
- ``fail`` — raise on any mismatch (``Second Experiment/GPT 5 nano.py:76-78``).

Schema modes (SURVEY.md §1.3): ``declared`` (explicit metric list),
``payload_driven`` (keys discovered from one sampled payload, with
missing-key backfill as typed nulls per
``Third Experiment/Gpt 5 mini.py:98-106``).
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ISO_HOURLY_FORMAT = "yyyy-MM-dd'T'HH:mm"
LENGTH_POLICIES = ("pad_null", "truncate_min", "fail")


def payload_schema(metrics: list[str]) -> T.StructType:
    """Declared-schema mode: typed payload StructType for ``from_json``
    (the explicit-StructType discipline of
    ``First experiment/Claude Opus 4.py:93-104``)."""
    hourly = T.StructType(
        [T.StructField("time", T.ArrayType(T.StringType()), True)]
        + [T.StructField(m, T.ArrayType(T.DoubleType()), True) for m in metrics]
    )
    return T.StructType(
        [
            T.StructField("latitude", T.DoubleType(), True),
            T.StructField("longitude", T.DoubleType(), True),
            T.StructField("timezone", T.StringType(), True),
            T.StructField("hourly", hourly, True),
        ]
    )


def discover_metrics(payloads: DataFrame, payload_col: str = "payload") -> list[str]:
    """Payload-driven schema mode: discover the metric keys from ONE sampled
    payload (``Third Experiment/Claude Haiku 3.5.py:55-59`` builds its
    schema from ``data['hourly'].keys()``).

    Driver cost is a single row — safe at any table size.  Keys missing
    from *other* payloads simply parse as NULL arrays and flow through the
    ``pad_null`` policy (missing-column backfill for free).
    """
    row = payloads.select(payload_col).first()
    if row is None or row[0] is None:
        return []
    doc = json.loads(row[0])
    hourly = doc.get("hourly") or {}
    return [k for k in hourly.keys() if k != "time"]


def _aligned_length(metrics: list[str], policy: str) -> Column:
    sizes = [F.size(F.col("hourly.time"))] + [
        F.size(F.col(f"hourly.{m}")) for m in metrics
    ]
    if policy == "pad_null":
        return F.size(F.col("hourly.time"))
    if policy == "truncate_min":
        # size() is -1 for NULL arrays (missing key) — a fully-missing
        # metric must not truncate everything to zero, so ignore it.
        positive = [F.when(s >= 0, s) for s in sizes]
        return F.least(*positive) if len(positive) > 1 else positive[0]
    if policy == "fail":
        mismatch = None
        time_sz = F.size(F.col("hourly.time"))
        for m in metrics:
            bad = F.size(F.col(f"hourly.{m}")) != time_sz
            mismatch = bad if mismatch is None else (mismatch | bad)
        return F.when(
            mismatch if mismatch is not None else F.lit(False),
            F.raise_error(F.lit("hourly array length mismatch")),
        ).otherwise(time_sz)
    raise ValueError(f"unknown length policy {policy!r}; use one of {LENGTH_POLICIES}")


def flatten_hourly(
    payloads: DataFrame,
    metrics: list[str] | None = None,
    payload_col: str = "payload",
    length_policy: str = "pad_null",
    time_format: str = ISO_HOURLY_FORMAT,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """S2+S3+S4 fused: JSON string column → typed per-hour rows, distributed.

    One narrow (no-shuffle) stage per input partition:
    ``from_json`` → ``posexplode(arrays_zip(time, m1, …, mN))`` → typed
    projection.  NULL/short arrays surface as NULL metric values (the
    quality operators then profile them); the row count follows
    ``length_policy``.

    ``metrics=None`` triggers payload-driven discovery (one sampled row).
    """
    if metrics is None:
        metrics = discover_metrics(payloads, payload_col)

    parsed = payloads.withColumn(
        "_doc", F.from_json(F.col(payload_col), payload_schema(metrics))
    ).select(
        *(keep_cols or []),
        F.col("_doc.latitude").alias("latitude"),
        F.col("_doc.longitude").alias("longitude"),
        F.col("_doc.timezone").alias("timezone"),
        F.col("_doc.hourly").alias("hourly"),
    )

    n = _aligned_length(metrics, length_policy)
    # A missing metric key parses as a NULL array, and arrays_zip is
    # null-propagating — coalesce to an empty array so zip pads the metric
    # with NULLs instead of nulling the whole zip (missing-column backfill,
    # ``Third Experiment/Gpt 5 mini.py:98-106``).
    empty_d = F.array().cast("array<double>")
    empty_s = F.array().cast("array<string>")
    zipped = parsed.select(
        *(keep_cols or []),
        "latitude",
        "longitude",
        "timezone",
        n.alias("_n"),
        F.posexplode_outer(
            F.arrays_zip(
                F.coalesce(F.col("hourly.time"), empty_s).alias("time"),
                *[
                    F.coalesce(F.col(f"hourly.{m}"), empty_d).alias(m)
                    for m in metrics
                ],
            )
        ).alias("_pos", "_row"),
    ).filter(F.col("_pos") < F.col("_n"))

    return zipped.select(
        *(keep_cols or []),
        F.to_timestamp(F.col("_row.time"), time_format).alias("event_time"),
        *[F.col(f"_row.{m}").cast("double").alias(m) for m in metrics],
        "latitude",
        "longitude",
        "timezone",
    )


def with_ingestion_metadata(df: DataFrame, source: str | None = None) -> DataFrame:
    """P2 ingestion metadata (``First experiment/Claude Opus 4.py:110``,
    ``First experiment/Claude Sonnet 4.py:429-430``): partition date, exact
    timestamp, optional source tag (``Third Experiment/Claude Haiku
    3.5.py:85-88``)."""
    df = df.withColumn("ingestion_date", F.current_date()).withColumn(
        "ingestion_ts", F.current_timestamp()
    )
    if source is not None:
        df = df.withColumn("data_source", F.lit(source))
    return df
