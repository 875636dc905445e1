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
    rows.

    Strata columns are typically LOW cardinality (sources, languages), so
    a ``Window.partitionBy(strata)`` would funnel |corpus|/|strata| rows
    through each sort task — the same skew wall the global-rank queries
    had.  The rank therefore comes from ``operators.ranking``'s
    range-partitioned exact rank (balanced |rows|/P tasks at any scale,
    bit-identical result, same plain-window oracle)."""
    from data_pipelines_using_llm_spark.operators.ranking import with_exact_rank

    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    ranked = with_exact_rank(
        df,
        [split_hash(id_col, salt).asc(), F.col(id_col).asc()],
        group_by=[strata_col],
        rank_col="_rk",
    )
    return ranked.filter(F.col("_rk") <= k).drop("_rk")


def sql_mixture_copies(
    strata_expr: str,
    id_expr: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    salt: int = DEFAULT_SALT,
) -> str:
    """DuckDB expression for the per-row copy count of
    :func:`mixture_sample` (same integer thresholds, same hash)."""

    def parts(rate: float) -> tuple[int, int]:
        n_full = int(rate)
        return n_full, int((rate - n_full) * LEHMER_M)

    d_full, d_thresh = parts(default_rate)
    full_whens = " ".join(
        f"WHEN {strata_expr} = '{s}' THEN {parts(r)[0]}"
        for s, r in sorted(rates.items())
    )
    th_whens = " ".join(
        f"WHEN {strata_expr} = '{s}' THEN {parts(r)[1]}"
        for s, r in sorted(rates.items())
    )
    full_case = f"CASE {full_whens} ELSE {d_full} END"
    th_case = f"CASE {th_whens} ELSE {d_thresh} END"
    return (
        f"({full_case} + CASE WHEN {sql_split_hash(id_expr, salt)} < {th_case} "
        f"THEN 1 ELSE 0 END)"
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


def mixture_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    salt: int = DEFAULT_SALT,
    epoch_col: str = "epoch",
) -> DataFrame:
    """Training-mixture resampling: each stratum is replicated at its
    ``rate`` — rate 2.5 means every row appears twice and a deterministic
    50% of rows a third time (``epoch`` numbers the copies); rate 0.2
    keeps a deterministic 20%.  This is the domain up-/down-weighting step
    of a pretraining data recipe, expressed so membership AND copy count
    are pure functions of (stratum, id) — rerun-stable, oracle-checkable.

    Scale: a when-chain on the (broadcast-small) rate table plus one
    ``explode(sequence(...))`` — no shuffle; output size is exactly
    ``sum(rate_s * |stratum_s|)`` rows.
    """
    for s, r in rates.items():
        if r < 0:
            raise ValueError(f"rate must be non-negative: {s}={r}")
    if default_rate < 0:
        raise ValueError(f"default_rate must be non-negative: {default_rate}")

    def parts(rate: float) -> tuple[int, int]:
        n_full = int(rate)
        return n_full, int((rate - n_full) * LEHMER_M)

    sc = F.col(strata_col)
    d_full, d_thresh = parts(default_rate)
    n_full: Column = F.lit(d_full)
    thresh: Column = F.lit(d_thresh)
    for s, r in sorted(rates.items()):
        nf, th = parts(r)
        n_full = F.when(sc == s, F.lit(nf)).otherwise(n_full)
        thresh = F.when(sc == s, F.lit(th)).otherwise(thresh)
    copies = (
        n_full + (split_hash(id_col, salt) < thresh).cast("int")
    ).alias("_copies")
    return (
        df.withColumn("_copies", copies)
        .filter(F.col("_copies") >= 1)  # sequence(1, 0) would DESCEND
        .withColumn(epoch_col, F.explode(F.sequence(F.lit(1), F.col("_copies"))))
        .withColumn(epoch_col, F.col(epoch_col).cast("int"))
        .drop("_copies")
    )


def temperature_mixture(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    alpha: float = 0.7,
    salt: int = DEFAULT_SALT,
    epoch_col: str = "epoch",
) -> DataFrame:
    """Temperature-scaled mixture resampling — the standard pretraining
    domain-balancing recipe: sampling probability per domain is
    ``p_s ∝ (n_s / N)^alpha`` (alpha < 1 flattens the distribution,
    upweighting rare domains; alpha = 1 is natural proportions), with
    the output corpus kept at N docs in expectation, so the per-doc
    replication rate is ``r_s = p_s * N / n_s``.

    Unlike :func:`mixture_sample`, the rates are DERIVED FROM THE DATA
    (per-domain counts), not caller constants — so the whole derivation
    stays in-plan: the domain census is a tiny aggregate that broadcasts
    back onto the docs, the normalizer ``Z = Σ (n_s/N)^alpha`` is a
    SORTED fold over the (few) domains so its double summation order is
    engine-independent, and copy membership reuses the Lehmer hash
    threshold.  The one libm call (``pow``) feeds an integer threshold
    via ``floor`` — a last-ulp divergence flips a doc's membership only
    if its hash equals the exact boundary integer (P ≈ |docs| / 2^31
    per domain).

    Scale: one tiny census aggregate + broadcast join + explode; the
    corpus itself never shuffles.
    """
    sc_ = F.col(strata_col)
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n_s"))
    tot = counts.agg(F.sum("n_s").alias("n_tot"))
    w = (
        counts.crossJoin(F.broadcast(tot))
        .select(
            strata_col,
            "n_s",
            "n_tot",
            F.pow(F.col("n_s").cast("double") / F.col("n_tot"), F.lit(alpha)).alias(
                "w_s"
            ),
        )
    )
    z = w.agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct(strata_col, "w_s"))),
            F.lit(0.0),
            lambda acc, s: acc + s["w_s"],
        ).alias("z")
    )
    rates = (
        w.crossJoin(F.broadcast(z))
        .select(
            strata_col,
            (F.col("w_s") * F.col("n_tot") / (F.col("z") * F.col("n_s"))).alias(
                "rate"
            ),
        )
    )
    n_full = F.floor(F.col("rate"))
    thresh = F.floor((F.col("rate") - F.floor(F.col("rate"))) * F.lit(LEHMER_M)).cast(
        "long"
    )
    copies = (n_full + (split_hash(id_col, salt) < thresh).cast("long")).alias(
        "_copies"
    )
    return (
        df.join(F.broadcast(rates), strata_col)
        .withColumn("_copies", copies)
        .filter(F.col("_copies") >= 1)
        .withColumn(epoch_col, F.explode(F.sequence(F.lit(1), F.col("_copies"))))
        .withColumn(epoch_col, F.col(epoch_col).cast("int"))
        .drop("_copies")
    )
