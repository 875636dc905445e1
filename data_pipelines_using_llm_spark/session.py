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
