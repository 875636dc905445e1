"""Every registry query must match its DuckDB oracle (driver-gate replica).

Default scale is sf0.001 for speed; set ``SPARK_GRAFT_TEST_SF_DIR`` to run
the exact driver scale (sf0.01).
"""

from __future__ import annotations

import os

import pytest

from data_pipelines_using_llm_spark.registry import all_queries
from tests.oracle_check import run_check

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.mark.parametrize("name", sorted(all_queries().keys()))
def test_query_matches_oracle(spark, name):
    problems = run_check(spark, SF_DIR, name)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.schema.fieldNames()


def test_contract_shape():
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert qs, "queries() must not be empty"
    assert set(os_) <= set(qs)
