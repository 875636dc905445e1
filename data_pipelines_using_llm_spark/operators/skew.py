"""Skew-mitigation operators: salted two-stage aggregation and salted
broadcast-free joins.

The reference never needed these (≤4,416 rows — SURVEY.md §6), but at
100 TB a hot key turns one reducer into the whole job's critical path.
AQE's skew-join handling covers sort-merge joins; these operators cover
the two cases AQE does not: (a) a grouped aggregation whose group count
is tiny (every row of a hot group still lands on one reducer *before*
AQE can split anything when the agg is not partial-friendly), and (b) a
shuffle join against a hot build side when broadcasting is impossible.

Salting is semantics-preserving by construction: stage 1 groups on
(key, salt) — ``salt = pmod(hash-ish of a uniform column, n_salts)`` —
stage 2 re-aggregates the partials on the key alone.  All aggregates used
here decompose exactly (counts and decimal sums), so results are
bit-identical to the unsalted plan and to the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 32


def with_salt(df: DataFrame, salt_from: str, n_salts: int = DEFAULT_SALTS) -> DataFrame:
    """Deterministic salt in [0, n_salts) derived from an existing
    (roughly uniform) column — deterministic so re-runs and retries place
    rows identically (`rand()` salts break spec determinism)."""
    return df.withColumn("_salt", F.pmod(F.col(salt_from), F.lit(n_salts)))


def salted_agg(
    df: DataFrame,
    key: str,
    salt_from: str,
    partial_aggs: list[Column],
    final_aggs: list[Column],
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Two-stage skew-proof aggregation: partials on (key, salt) spread a
    hot key over ``n_salts`` reducers; finals combine ≤ n_salts rows per
    key.  ``partial_aggs`` must alias columns that ``final_aggs`` combine
    (sum→sum, count→sum, min→min, max→max...)."""
    stage1 = with_salt(df, salt_from, n_salts).groupBy(key, "_salt").agg(*partial_aggs)
    return stage1.groupBy(key).agg(*final_aggs)


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    salt_from: str,
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Skew-proof equi-join without broadcast: facts get a deterministic
    salt, the (small-ish but not broadcastable) build side is replicated
    ``n_salts``× with every salt value, and the join key becomes
    (key, salt) — a hot fact key now spreads over n_salts partitions.

    Use when the build side exceeds the broadcast threshold but a hot
    probe key would overwhelm one task.  Replication cost: |dim| × n_salts.
    """
    salted_facts = with_salt(facts, salt_from, n_salts)
    exploded_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_facts.join(exploded_dim, [key, "_salt"]).drop("_salt")
