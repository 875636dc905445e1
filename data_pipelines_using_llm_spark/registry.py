"""Query registry — the single source of truth wired into ``__spark_entry__``.

Each operator module contributes ``QUERIES: dict[str, QuerySpec]`` where the
Spark callable and its DuckDB oracle SQL live side-by-side (keeping the
column aliases in sync is the whole game — the driver's compare hashes
values after sorting columns by name).  ``oracle=None`` marks genuinely
non-SQL-expressible operators; the driver then records a rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    fn: QueryFn
    oracle: str | None
    doc: str = ""


def all_queries() -> dict[str, QuerySpec]:
    # Imported lazily so `import data_pipelines_using_llm_spark` stays cheap.
    from data_pipelines_using_llm_spark.plans import (
        analytics,
        dedup_queries,
        llm_queries,
        multimodal_queries,
        pipelines,
        quality_queries,
        relational,
        similarity_queries,
        skew_queries,
        text_queries,
    )
    from data_pipelines_using_llm_spark.streaming import stream_queries

    merged: dict[str, QuerySpec] = {}
    for mod in (
        relational,
        analytics,
        quality_queries,
        dedup_queries,
        similarity_queries,
        text_queries,
        multimodal_queries,
        llm_queries,
        skew_queries,
        pipelines,
        stream_queries,
    ):
        overlap = merged.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        merged.update(mod.QUERIES)
    return merged
