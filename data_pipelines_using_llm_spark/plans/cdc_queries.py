"""CDC query pack: snapshot diffing and SCD Type-2 maintenance as
oracle-paired queries (operators/cdc.py).

Snapshots are derived deterministically from the ``events`` /
``customer`` tables with modulus predicates, so both engines construct
bit-identical inputs and the diff/SCD outputs compare exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipelines_using_llm_spark.operators.cdc import (
    scd2_apply,
    scd2_init,
    snapshot_diff,
)
from data_pipelines_using_llm_spark.registry import QuerySpec
from data_pipelines_using_llm_spark.sources.tables import load_table

SCD_T0 = "2020-01-01 00:00:00"
SCD_T1 = "2021-06-01 00:00:00"
SCD_OPEN = "2262-01-01 00:00:00"
NEW_SEGMENT = "MACHINERY"


def events_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diff two simulated loads of the events table: the old snapshot
    misses every 7th event, the new snapshot misses every 5th and bumps
    the value of every 3rd — so the diff exercises all three change
    classes in one full-outer join.

    Scale: one key shuffle; the change classification is a projection
    over null-safe struct equality (no per-column rescans).
    """
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    old = ev.filter(F.col("event_id") % 7 != 0)
    new = ev.filter(F.col("event_id") % 5 != 0).withColumn(
        "value",
        F.when(F.col("event_id") % 3 == 0, F.col("value") + 1).otherwise(
            F.col("value")
        ),
    )
    return snapshot_diff(old, new, keys=["event_id"])


EVENTS_SNAPSHOT_DIFF_ORACLE = """
WITH old AS (
    SELECT event_id, event_type, value FROM events WHERE event_id % 7 != 0
),
new AS (
    SELECT event_id, event_type,
           CASE WHEN event_id % 3 = 0 THEN value + 1 ELSE value END AS value
    FROM events WHERE event_id % 5 != 0
)
SELECT coalesce(new.event_id, old.event_id) AS event_id,
       CASE WHEN old.event_id IS NULL THEN 'added'
            WHEN new.event_id IS NULL THEN 'removed'
            WHEN NOT (old.event_type IS NOT DISTINCT FROM new.event_type
                      AND old.value IS NOT DISTINCT FROM new.value)
                 THEN 'changed' END AS change
FROM old FULL OUTER JOIN new ON old.event_id = new.event_id
WHERE (CASE WHEN old.event_id IS NULL THEN 'added'
            WHEN new.event_id IS NULL THEN 'removed'
            WHEN NOT (old.event_type IS NOT DISTINCT FROM new.event_type
                      AND old.value IS NOT DISTINCT FROM new.value)
                 THEN 'changed' END) IS NOT NULL
"""


def customer_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 maintenance: bootstrap the customer dimension at T0,
    then apply a batch of segment changes (every 10th customer moves to
    MACHINERY at T1).  Output is the full versioned dimension: history
    rows closed at T1, new current rows open-ended.

    Scale: the anti/inner joins run against a BROADCAST update batch —
    the dimension shuffles zero times; write amplification is |touched
    keys| + |batch|, not |history| (operators/cdc.py).
    """
    cust = load_table(spark, sf_dir, "customer").withColumn(
        "eff", F.lit(SCD_T0).cast("timestamp")
    )
    dim = scd2_init(cust, "eff")
    updates = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 10 == 0)
        .withColumn("c_mktsegment", F.lit(NEW_SEGMENT))
        .withColumn("eff", F.lit(SCD_T1).cast("timestamp"))
    )
    return scd2_apply(dim, updates, keys=["c_custkey"], effective_col="eff")


CUSTOMER_SCD2_ORACLE = f"""
WITH untouched AS (
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
           TIMESTAMP '{SCD_T0}' AS valid_from,
           TIMESTAMP '{SCD_OPEN}' AS valid_to,
           TRUE AS is_current
    FROM customer WHERE c_custkey % 10 != 0
),
closed AS (
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
           TIMESTAMP '{SCD_T0}' AS valid_from,
           TIMESTAMP '{SCD_T1}' AS valid_to,
           FALSE AS is_current
    FROM customer WHERE c_custkey % 10 = 0
),
new_rows AS (
    SELECT c_custkey, c_name, c_nationkey, c_acctbal,
           '{NEW_SEGMENT}' AS c_mktsegment,
           TIMESTAMP '{SCD_T1}' AS valid_from,
           TIMESTAMP '{SCD_OPEN}' AS valid_to,
           TRUE AS is_current
    FROM customer WHERE c_custkey % 10 = 0
)
SELECT * FROM untouched
UNION ALL SELECT * FROM closed
UNION ALL SELECT * FROM new_rows
"""


QUERIES: dict[str, QuerySpec] = {
    "events_snapshot_diff": QuerySpec(
        events_snapshot_diff,
        EVENTS_SNAPSHOT_DIFF_ORACLE,
        "CDC diff of two loads: added/removed/changed in one outer join",
    ),
    "customer_scd2": QuerySpec(
        customer_scd2,
        CUSTOMER_SCD2_ORACLE,
        "SCD Type-2 dimension maintenance, broadcast update batch",
    ),
}
