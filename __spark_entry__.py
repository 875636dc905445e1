"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship bronze→silver→gold pipeline at sf0.001.
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 with its DuckDB oracle; pairs live side-by-side in
``data_pipelines_using_llm_spark/plans/*`` and are merged by
``data_pipelines_using_llm_spark.registry.all_queries()``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_pipelines_using_llm_spark.registry import all_queries, rotate_for_verification

_SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: bronze events → quality-cleaned silver → monthly gold
    (all three reference archetype stages in one fused plan)."""
    from data_pipelines_using_llm_spark.plans.pipelines import monthly_event_gold

    return monthly_event_gold(spark, _SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Rotation (least-driver-verified first) is applied HERE, at the
    driver-facing surface, so the library's ``all_queries()`` ordering
    stays deterministic across checkouts while the driver's 50-query
    correctness window still cycles through the whole registry."""
    return {
        name: spec.fn
        for name, spec in rotate_for_verification(all_queries()).items()
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each query (omitted ⇒ rows-only check)."""
    return {
        name: spec.oracle
        for name, spec in rotate_for_verification(all_queries()).items()
        if spec.oracle is not None
    }
