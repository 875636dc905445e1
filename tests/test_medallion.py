"""End-to-end medallion pipeline over the events table (golden checks per
SURVEY.md §5.2.3: retention counts, gold values vs DuckDB)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from data_pipelines_using_llm_spark.plans.medallion import run_medallion
from data_pipelines_using_llm_spark.sources.tables import load_table
from tests.conftest import SF0001


def test_medallion_end_to_end(spark, tmp_path):
    bronze = load_table(spark, SF0001, "events")
    res = run_medallion(
        spark,
        bronze,
        str(tmp_path / "lake"),
        key=["user_id", "ts"],
        metric_cols=["value"],
        ts_col="ts",
        tiebreaker=[F.col("event_id").desc()],
    )
    assert res.bronze_rows == 1000
    assert res.silver_rows <= res.bronze_rows
    assert res.gold_rows >= 1
    assert res.quality["total_records"] == 1000
    assert set(res.timings) == {
        "bronze_write", "quality_gate", "silver_write", "gold_write",
    }

    # golden check against DuckDB on the MATERIALIZED silver
    silver = spark.read.parquet(str(tmp_path / "lake" / "silver"))
    got = {
        (r.year, r.month): (r.value_avg, r.total_records)
        for r in spark.read.parquet(str(tmp_path / "lake" / "gold")).collect()
    }
    want = duckdb.sql(
        f"""
        WITH silver AS (
            SELECT * FROM '{SF0001}/events.parquet'
            WHERE value IS NOT NULL
            QUALIFY row_number() OVER (PARTITION BY user_id, ts
                                       ORDER BY event_id DESC) = 1
        )
        SELECT CAST(year(ts) AS INT) y, CAST(month(ts) AS INT) m,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)/count(value) a,
               count(*) n
        FROM silver GROUP BY 1, 2
        """
    ).fetchall()
    assert silver.count() == sum(n for _, _, _, n in want)
    for y, m, a, n in want:
        ga, gn = got[(y, m)]
        assert gn == n
        assert abs(ga - a) < 1e-12
