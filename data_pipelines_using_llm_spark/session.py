"""SparkSession factory — one place for engine-wide config.

Replaces the reference's per-script ``SparkSession.builder.getOrCreate()``
(e.g. ``First experiment/Claude Sonnet 4.py:24``) with a single factory that
pins the settings the reference corpus is sloppy about (SURVEY.md §4.4):

- UTC session timezone (reference mixes naive/UTC/pytz timestamps);
- AQE on (runtime broadcast/skew re-planning instead of the reference's
  hard-coded ``spark.sql.shuffle.partitions=64`` at
  ``Third Experiment/GPT 5.py:9``);
- Arrow on for every pandas interchange.

At 100 TB these settings are what let the same declarative plans re-scale:
AQE coalesces the post-shuffle partitions to match actual data volume and
converts sort-merge joins to broadcast when the built side turns out small.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "data_pipelines_using_llm_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Local mode is a single JVM: ``spark.driver.memory`` is the only memory
    knob.  On a real cluster the same config block applies unchanged — the
    shuffle-partition count is only a *starting* parallelism because AQE
    coalesces at runtime.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


# Runtime bloom-filter join pruning (Catalyst InjectRuntimeFilter).
#
# For a selective SHUFFLE join (neither side broadcastable), Spark can
# build a bloom filter over the creation side's join keys and push a
# ``might_contain`` predicate into the application side's scan — at
# 100 TB this prunes most of the fact-table shuffle for selective
# fact-fact joins (the Q4/Q9-shape joins in plans/decision_support.py).
#
# The feature is ON by default (spark.sql.optimizer.runtime.bloomFilter
# .enabled) but self-gates on size estimates: the application side must
# scan >= applicationSideScanSizeThreshold (default 10 GB) and the
# creation side must be <= creationSideThreshold (default 10 MB) — so it
# activates exactly in the 100 TB regime this repo designs for and stays
# out of the way at test scale.  ``runtime_filters_forced`` drops the
# thresholds so CI can assert the plan shape the cluster would run
# (tests/test_plans.py::test_runtime_bloom_filter_prunes_fact_scan).

from contextlib import contextmanager

_RTF_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1KB",
}


@contextmanager
def runtime_filters_forced(spark: SparkSession):
    """Temporarily force the size gates open so runtime bloom-filter
    injection is observable on test-scale data; restores prior confs."""
    old: dict[str, str | None] = {}
    for k, v in _RTF_CONFS.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        yield spark
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
