"""Deterministic dataset splitting and sampling for training pipelines.

Beyond-reference operators (the reference corpus has no train/val/test
machinery; SURVEY.md §2 extension family): a 100 TB corpus must be split
REPRODUCIBLY — ``df.randomSplit`` reshuffles membership whenever
partitioning changes, which silently leaks validation documents into
training.  The fix is content addressing: membership is a pure function of
a stable id, so any engine, any partitioning, any rerun produces the same
assignment — which also makes the operators exactly oracle-checkable.

The hash is two rounds of the Lehmer/Park–Miller LCG (multiplier 48271,
modulus 2^31-1), chosen over xxhash/sha because it is exact BIGINT
arithmetic both Spark and DuckDB evaluate identically (no engine-specific
hash builtin), mixes sequential ids well enough for split assignment, and
never overflows 64-bit for ids < ~1.9e14.  Production corpora with string
keys should first map them to ids via ``xxhash64``/``sha2`` — the split
logic is unchanged.

Scale: both operators are pure row-local column expressions (no shuffle,
no state, whole-stage codegen); a 100 TB split is exactly as parallel as
the scan that reads it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

LEHMER_A = 48271
LEHMER_M = 2147483647  # 2^31 - 1
DEFAULT_SALT = 17


def split_hash(id_col: str | Column, salt: int = DEFAULT_SALT) -> Column:
    """Two Lehmer rounds over ``id + salt`` — a BIGINT in [0, 2^31-1)
    that both Spark and DuckDB compute bit-identically."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = ((c + F.lit(salt)) % LEHMER_M) * LEHMER_A % LEHMER_M
    return (h * LEHMER_A) % LEHMER_M


def sql_split_hash(id_expr: str, salt: int = DEFAULT_SALT) -> str:
    """The DuckDB-side twin of :func:`split_hash` (same ops, same order)."""
    return (
        f"(((({id_expr} + {salt}) % {LEHMER_M}) * {LEHMER_A} % {LEHMER_M})"
        f" * {LEHMER_A}) % {LEHMER_M}"
    )


def _thresholds(weights: list[tuple[str, float]]) -> list[tuple[str, int]]:
    if not weights:
        raise ValueError("weights must be non-empty")
    total = sum(w for _, w in weights)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1.0, got {total}")
    out: list[tuple[str, int]] = []
    acc = 0.0
    for name, w in weights:
        if w <= 0:
            raise ValueError(f"split weight must be positive: {name}={w}")
        acc += w
        out.append((name, int(acc * LEHMER_M)))
    # guard against float accumulation leaving the last bucket short
    out[-1] = (out[-1][0], LEHMER_M)
    return out


DEFAULT_WEIGHTS: list[tuple[str, float]] = [
    ("train", 0.8),
    ("val", 0.1),
    ("test", 0.1),
]


def deterministic_split(
    df: DataFrame,
    id_col: str,
    weights: list[tuple[str, float]] | None = None,
    salt: int = DEFAULT_SALT,
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split by hashing its id — stable under
    reruns, repartitioning, and engine choice (unlike ``randomSplit``).
    Integer thresholds (``floor(cum_weight * (2^31-1))``) keep the
    comparison exact — no float equality at bucket edges."""
    ths = _thresholds(DEFAULT_WEIGHTS if weights is None else weights)
    h = split_hash(id_col, salt)
    expr = F.when(h < F.lit(ths[0][1]), ths[0][0])
    for name, t in ths[1:-1]:
        expr = expr.when(h < F.lit(t), name)
    expr = expr.otherwise(ths[-1][0])
    return df.withColumn(split_col, expr)


def sql_split_case(
    id_expr: str,
    weights: list[tuple[str, float]] | None = None,
    salt: int = DEFAULT_SALT,
) -> str:
    """DuckDB CASE expression mirroring :func:`deterministic_split`."""
    ths = _thresholds(DEFAULT_WEIGHTS if weights is None else weights)
    h = sql_split_hash(id_expr, salt)
    whens = "\n".join(
        f"WHEN {h} < {t} THEN '{name}'" for name, t in ths[:-1]
    )
    return f"CASE {whens} ELSE '{ths[-1][0]}' END"


def stratified_sample_exact(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    k: int,
    salt: int = DEFAULT_SALT,
) -> DataFrame:
    """Exactly ``min(k, |stratum|)`` rows per stratum, chosen by hash rank
    — the balanced-subset operator (eval sets, per-source quotas) where
    the hash-threshold sample can't guarantee exact counts.  Deterministic:
    rank orders by (hash, id), so reruns and repartitions return the same
    rows.  One shuffle on the stratum key; rank never looks past ``k``
    rows per group after the sort."""
    from pyspark.sql.window import Window

    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    w = Window.partitionBy(strata_col).orderBy(
        split_hash(id_col, salt), F.col(id_col)
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def deterministic_sample(
    df: DataFrame,
    id_col: str,
    fraction: float,
    salt: int = DEFAULT_SALT,
) -> DataFrame:
    """Keep ~``fraction`` of rows, membership a pure function of the id —
    the reproducible alternative to ``df.sample`` for audit/holdout sets.
    Same integer-threshold comparison as :func:`deterministic_split`."""
    if not 0.0 < fraction <= 1.0:
        raise ValueError(f"fraction must be in (0, 1], got {fraction}")
    return df.filter(split_hash(id_col, salt) < F.lit(int(fraction * LEHMER_M)))
