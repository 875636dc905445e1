"""Count-Min sketch: fixed-size mergeable frequency counting.

Beyond-reference (the reference corpus has no sketching at all); this
completes the mergeable-sketch family next to the HLL reach rollups
(plans/analytics.py::approx_user_reach, sinks/rollup.py): HLL answers
"how many distinct", CMS answers "how often does THIS key occur" when
the key dictionary itself no longer fits anywhere — the sketch is a
``depth x width`` integer grid regardless of corpus size, every cell is
a plain ``count`` (map-side partial, mergeable by addition across
batches/executors), and a point estimate is the MIN over depth rows
(one-sided error: never an undercount, overcount bounded by
``2N/width`` per row with probability 1 - 2^-depth).

Cross-engine exactness: everything is BIGINT — the row hashes are the
polynomial char hash (operators/text.py) mixed per-row with a
Lehmer-LCG step (operators/split.py discipline) and reduced mod width,
the cells are integer counts, the estimate is an integer min — so the
driver hash gate holds with no float caveat anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_pipelines_using_llm_spark.operators.split import LEHMER_A, LEHMER_M
from data_pipelines_using_llm_spark.operators.text import HASH_MOD, char_hash

CMS_DEPTH = 4
# width 16 against the testdata's 31-token vocabulary: small enough that
# per-row collisions genuinely occur (the driver gate then hashes rows
# where cms_est > exact_cnt — the one-sided error path is EXERCISED, not
# vacuously green), large enough that the depth-4 min keeps heavy-hitter
# estimates tight.  Production: width ~ e/epsilon for an epsilon*N error
# bound — 2^20 cells for 1e-6 relative error, still kilobytes per row.
CMS_WIDTH = 16
#: per-row salt spacing; any constant < (2^63 - HASH_MOD) / LEHMER_A works
CMS_SALT = 7919


def _mix(h: Column, row: int, width: int) -> Column:
    """Per-row Lehmer mix of an ALREADY-COMPUTED key hash — the hash fold
    itself is O(|key|) and must run once per key, not once per depth row
    (the unsplit form measured 2.2x slower on the 16x census probe)."""
    return (
        (h + F.lit(row * CMS_SALT)) * F.lit(LEHMER_A) % F.lit(LEHMER_M)
    ) % F.lit(width)


def cms_bucket(key: str | Column, row: int, width: int = CMS_WIDTH) -> Column:
    """Row ``row``'s bucket for ``key`` — integer-exact on both engines:
    ``((char_hash(key) + row*salt) * A mod M) mod width``."""
    c = F.col(key) if isinstance(key, str) else key
    return _mix(char_hash(c), row, width).alias("bucket")


def sql_cms_bucket(key_expr: str, row: int, width: int = CMS_WIDTH) -> str:
    """DuckDB twin of :func:`cms_bucket` (same ops, same order); the
    char-hash fold itself comes from plans/text_queries.py::SQL_CHAR_HASH
    at the call site."""
    from data_pipelines_using_llm_spark.plans.text_queries import SQL_CHAR_HASH

    h = SQL_CHAR_HASH.format(s=key_expr)
    return f"((({h}) + {row * CMS_SALT}) * {LEHMER_A} % {LEHMER_M}) % {width}"


def cms_build(
    keys: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Build the sketch from a (possibly repeated) key stream: one
    exploded (row, bucket) projection + one grouped count.  At 100 TB the
    count is a map-side partial over at most ``depth x width`` distinct
    cells — the shuffle carries the SKETCH, not the keys; sketches from
    disjoint batches merge by summing cells."""
    cells = (
        keys.select(char_hash(F.col(key_col)).alias("h"))
        .select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(r).alias("row"),
                            _mix(F.col("h"), r, width).alias("bucket"),
                        )
                        for r in range(depth)
                    ]
                )
            ).alias("c")
        )
        .select("c.row", "c.bucket")
    )
    return cells.groupBy("row", "bucket").agg(
        F.count(F.lit(1)).alias("counter")
    )


def cms_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-estimate each query key: min over the key's ``depth`` cells.
    The query side is small (broadcast); the sketch is depth×width rows.
    Returns (key_col, cms_est)."""
    probes = (
        queries.select(key_col, char_hash(F.col(key_col)).alias("h"))
        .select(
            key_col,
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(r).alias("row"),
                            _mix(F.col("h"), r, width).alias("bucket"),
                        )
                        for r in range(depth)
                    ]
                )
            ).alias("c"),
        )
        .select(key_col, "c.row", "c.bucket")
    )
    return (
        F.broadcast(probes)
        .join(sketch, ["row", "bucket"])
        .groupBy(key_col)
        .agg(F.min("counter").alias("cms_est"))
    )


# ---- Bloom filter (approximate set membership, mergeable) ----

#: sized against the testdata so false positives genuinely occur at the
#: driver's sf0.01 gate (the FP path is exercised, not vacuously green);
#: production sizing is bits ≈ -n·ln(p)/ln(2)² — still kilobytes for
#: millions of keys at p=1%.
BLOOM_BITS = 1024
BLOOM_K = 3
BLOOM_SALT = 104729
_WORD = 32  # bits per mask word; masks stay < 2^32, shift-safe on BIGINT


def bloom_pos(h: Column, probe: int, bits: int = BLOOM_BITS) -> Column:
    """Bit position of probe ``probe`` for an already-computed key hash —
    the CMS row-mix discipline (:func:`_mix`) with its own salt."""
    return (
        (h + F.lit(probe * BLOOM_SALT)) * F.lit(LEHMER_A) % F.lit(LEHMER_M)
    ) % F.lit(bits)


def sql_bloom_pos(h_expr: str, probe: int, bits: int = BLOOM_BITS) -> str:
    """DuckDB twin of :func:`bloom_pos` (same ops, same order)."""
    return (
        f"((({h_expr}) + {probe * BLOOM_SALT}) * {LEHMER_A} % {LEHMER_M})"
        f" % {bits}"
    )


def bloom_build(
    keys: DataFrame,
    key_col: str,
    k: int = BLOOM_K,
    bits: int = BLOOM_BITS,
) -> DataFrame:
    """Build the filter as (word, mask) rows: each key sets ``k`` bits;
    words are 32-bit lanes OR-merged by ``bit_or`` — a map-side partial
    over at most ``bits/32`` distinct words, so the shuffle carries the
    FILTER, not the keys, and filters from disjoint batches merge by
    OR-ing words (same mergeability contract as the CMS cells).

    Everything is BIGINT (hash fold, Lehmer mix, shifts below 2^32), so
    the filter is bit-identical cross-engine and hash-gates."""
    positions = keys.select(
        char_hash(F.col(key_col).cast("string")).alias("h")
    ).select(
        F.explode(
            F.array(
                *[bloom_pos(F.col("h"), r, bits).alias("p") for r in range(k)]
            )
        ).alias("pos")
    )
    return (
        positions.select(
            F.floor(F.col("pos") / _WORD).cast("long").alias("word"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {_WORD} AS INT))"
            ).alias("m"),
        )
        .groupBy("word")
        .agg(F.bit_or("m").alias("mask"))
    )


def bloom_probe(
    bloom: DataFrame,
    probes: DataFrame,
    key_col: str,
    k: int = BLOOM_K,
    bits: int = BLOOM_BITS,
) -> DataFrame:
    """Membership test: a key is a (possible) member iff ALL ``k`` of its
    bits are set.  The filter broadcasts (≤ bits/32 rows); the probe side
    explodes to k rows per key, left-joins its word lane, and a key is a
    member when its minimum per-probe hit is 1 — no false negatives by
    construction, false positives bounded by (1-e^{-kn/bits})^k.

    Returns (key_col, bloom_member: int)."""
    pr = probes.select(
        F.col(key_col),
        char_hash(F.col(key_col).cast("string")).alias("h"),
    ).select(
        key_col,
        F.explode(
            F.array(
                *[bloom_pos(F.col("h"), r, bits).alias("p") for r in range(k)]
            )
        ).alias("pos"),
    ).select(
        key_col,
        F.floor(F.col("pos") / _WORD).cast("long").alias("word"),
        F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {_WORD} AS INT))"
        ).alias("m"),
    )
    joined = pr.join(F.broadcast(bloom), "word", "left").select(
        key_col,
        F.when(
            F.col("mask").isNotNull()
            & (F.col("mask").bitwiseAND(F.col("m")) == F.col("m")),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("hit"),
    )
    return joined.groupBy(key_col).agg(F.min("hit").alias("bloom_member"))
