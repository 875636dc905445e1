"""Document deduplication operators for training-data pipelines:
exact (hash-groupBy), n-gram Jaccard, MinHash+LSH, SimHash.

No reference counterpart (the reference's dedup surface is keyed-row dedup,
SURVEY.md §2.4; these are the *corpus-level* near-dup operators a 100 TB
pretraining pipeline needs — BASELINE.json north star).  All expressions
are built-in Spark SQL functions (JVM-side, codegen'd): shingling with
``transform``/``slice``, signatures with ``aggregate``/``array_min``, LSH
banding with ``posexplode`` + equi-join.  The only shuffles are the LSH
band join and the final pair dedup — no O(n²) pass at scale.

Cross-engine determinism: shingle hashing uses the polynomial char hash of
``operators/text.py`` and a fixed linear hash family, so every operator has
an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_pipelines_using_llm_spark.operators.text import HASH_MOD, char_hash, tokens

# Fixed MinHash family h_i(x) = (a_i * x + b_i) mod HASH_MOD — constants from
# a documented LCG (seed 42, a/b drawn as odd offsets) shared verbatim with
# the DuckDB oracle so signatures are bit-identical across engines.
MINHASH_COEFFS: list[tuple[int, int]] = [
    (472882049, 126658243), (786995857, 255357313), (196612583, 912855103),
    (336465781, 541976489), (640041433, 82794721), (867973967, 694474549),
    (91297967, 333864397), (547556849, 718362241), (419418001, 469974809),
    (260500747, 590148817), (741996537, 147434239), (101483029, 850012393),
    (963502903, 27981751), (522734317, 648012343), (315767579, 770293199),
    (688117523, 430104727),
]
DEFAULT_BANDS = 4  # 16 hashes → 4 bands × 4 rows


def ngram_set(c: str | Column, n: int = 3) -> Column:
    """Distinct word n-gram strings (the shingle set).

    Word-level shingles: ``slice`` over the token array — all JVM-side.
    Docs with fewer than ``n`` tokens produce an EMPTY set (guarded
    explicitly: Spark's ``sequence(1, 0)`` counts DOWN, it isn't empty).
    """
    toks = tokens(c)
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def ngram_hashes(c: str | Column, n: int = 3) -> Column:
    """Distinct n-gram shingle hashes — input to MinHash/SimHash."""
    return F.array_distinct(F.transform(ngram_set(c, n), char_hash))


def jaccard(a: Column, b: Column) -> Column:
    """Set Jaccard over two array columns (arrays must be distinct-ified)."""
    inter = F.size(F.array_intersect(a, b))
    return inter.cast("double") / (F.size(a) + F.size(b) - inter)


def minhash_signature(hashes: Column, k: int | None = None) -> Column:
    """MinHash signature: per hash function, the min over the shingle set.

    ``array_min(transform(...))`` per coefficient — k narrow expressions,
    no shuffle.  Empty shingle sets get HASH_MOD sentinels (match nothing).
    """
    coeffs = MINHASH_COEFFS[: k or len(MINHASH_COEFFS)]

    # NB: factory closure, not default-arg lambdas — PySpark derives the
    # higher-order function's arity from the Python signature.
    def hash_fn(a: int, b: int):
        return lambda h: (h * a + b) % HASH_MOD

    return F.array(
        *[
            F.coalesce(
                F.array_min(F.transform(hashes, hash_fn(a, b))),
                F.lit(HASH_MOD),
            )
            for (a, b) in coeffs
        ]
    )


def lsh_bands(sig: Column, n_bands: int = DEFAULT_BANDS) -> Column:
    """Split a signature into band keys: array of (band_id, band_key)
    structs.  Docs sharing ANY band key become candidate pairs."""
    k = len(MINHASH_COEFFS)
    r = k // n_bands
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.concat_ws(
                    "-",
                    F.transform(F.slice(sig, b * r + 1, r), lambda x: x.cast("string")),
                ).alias("band_key"),
            )
            for b in range(n_bands)
        ]
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    n_bands: int = DEFAULT_BANDS,
    threshold: float = 0.8,
) -> DataFrame:
    """MinHash-LSH near-dup pairs: shingle → sign → band → bucket-join →
    verify with true Jaccard.

    Scale shape: the band explode is k/r rows per doc; the self-join on
    (band_id, band_key) only matches docs in the same bucket, so work is
    proportional to bucket collisions (linear-ish for real corpora), never
    all-pairs.  The verify join re-fetches the two shingle sets by id —
    two hash-shuffles on the id, each row tiny.
    """
    base = df.select(
        F.col(id_col).alias("doc_id"), ngram_hashes(text_col, n).alias("grams")
    ).filter(F.size("grams") > 0)
    sigs = base.select(
        "doc_id", "grams", lsh_bands(minhash_signature(F.col("grams")), n_bands).alias("bands")
    )
    banded = sigs.select(
        "doc_id", F.explode("bands").alias("band")
    ).select("doc_id", "band.band_id", "band.band_key")

    left = banded.alias("l")
    right = banded.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band_id") == F.col("r.band_id"))
            & (F.col("l.band_key") == F.col("r.band_key"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_id_a"), F.col("r.doc_id").alias("doc_id_b")
        )
        .distinct()
    )

    ga = sigs.select(F.col("doc_id").alias("doc_id_a"), F.col("grams").alias("grams_a"))
    gb = sigs.select(F.col("doc_id").alias("doc_id_b"), F.col("grams").alias("grams_b"))
    return (
        cand.join(ga, "doc_id_a")
        .join(gb, "doc_id_b")
        .select(
            "doc_id_a",
            "doc_id_b",
            F.round(jaccard(F.col("grams_a"), F.col("grams_b")), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    len_col: str,
    n: int = 3,
    threshold: float = 0.8,
    len_band: int = 60,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs with length-band blocking —
    the correctness baseline the LSH path approximates.

    Blocking on overlapping length buckets keeps the join equi-key (each
    doc lands in 2 buckets of width ``len_band``; pairs are checked once
    via the bucket-ownership rule), so this stays a hash join, not a
    cartesian product.  Still quadratic WITHIN a bucket — use the LSH
    variant when buckets are hot.
    """
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(len_col).alias("doc_len"),
        ngram_set(text_col, n).alias("grams"),
    ).filter(F.size("grams") > 0)

    # each doc joins buckets floor(len/band) and floor(len/band)+1 so any
    # pair within `len_band` of each other shares at least one bucket
    bucketed = base.select(
        "doc_id",
        "doc_len",
        "grams",
        F.explode(
            F.array(
                F.floor(F.col("doc_len") / len_band).cast("long"),
                F.floor(F.col("doc_len") / len_band).cast("long") + 1,
            )
        ).alias("bucket"),
    )
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            # bucket-ownership: count each pair once, in the lower doc's bucket
            & (F.col("a.bucket") == (F.col("a.doc_len") / len_band).cast("long")),
        )
        .filter(F.abs(F.col("a.doc_len") - F.col("b.doc_len")) <= len_band)
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            F.round(jaccard(F.col("a.grams"), F.col("b.grams")), 6).alias("jaccard"),
        )
        .distinct()
        .filter(F.col("jaccard") >= threshold)
    )
    return pairs


def simhash(c: str | Column, n: int = 3, bits: int = 20) -> Column:
    """SimHash over n-gram shingle hashes: bit j is set when more than half
    the shingles have bit j set.  ``bits`` kept small because the shingle
    hashes carry ~30 bits of entropy."""
    grams = ngram_hashes(c, n)
    n_grams = F.size(grams)

    def ones_fn(j: int):
        return lambda acc, h: acc + F.shiftright(h, j).bitwiseAND(F.lit(1))

    total = F.lit(0).cast("long")
    for j in range(bits):
        ones = F.aggregate(grams, F.lit(0).cast("long"), ones_fn(j))
        bit_j = (ones * 2 > n_grams).cast("long")
        total = total + F.shiftleft(bit_j, j)
    return total


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    len_col: str,
    n: int = 3,
    bits: int = 20,
    max_hamming: int = 4,
    len_band: int = 60,
) -> DataFrame:
    """SimHash near-dup pairs: hamming distance ≤ ``max_hamming`` within
    length-band blocks (same bucketing as :func:`ngram_jaccard_pairs`)."""
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(len_col).alias("doc_len"),
        simhash(text_col, n, bits).alias("sh"),
    )
    bucketed = base.select(
        "doc_id",
        "doc_len",
        "sh",
        F.explode(
            F.array(
                F.floor(F.col("doc_len") / len_band).cast("long"),
                F.floor(F.col("doc_len") / len_band).cast("long") + 1,
            )
        ).alias("bucket"),
    )
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("a.bucket") == (F.col("a.doc_len") / len_band).cast("long")),
        )
        .filter(F.abs(F.col("a.doc_len") - F.col("b.doc_len")) <= len_band)
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
