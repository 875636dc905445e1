"""Deduplication query pack over ``documents`` — exact, n-gram Jaccard,
MinHash+LSH, SimHash — each with a DuckDB oracle GENERATED from the same
constants as the Spark operators (operators/dedup.py), so hash family,
shingle construction, banding, and thresholds cannot drift between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipelines_using_llm_spark.operators import dedup as DD
from data_pipelines_using_llm_spark.operators.text import HASH_MOD
from data_pipelines_using_llm_spark.registry import QuerySpec
from data_pipelines_using_llm_spark.sources.tables import load_table

NGRAM_N = 3
JACCARD_THRESHOLD = 0.8
SIMHASH_BITS = 20
SIMHASH_MAX_HAMMING = 4
LEN_BAND = 60


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``documents`` spread across the session's cores: the local table is
    one small parquet file (one scan partition), and the shingle/signature
    stage is CPU-bound, so the near-dup queries would otherwise run
    single-threaded.  At 100 TB the source arrives in thousands of
    partitions and no such repartition belongs in the operators."""
    d = load_table(spark, sf_dir, "documents")
    return d.repartition(spark.sparkContext.defaultParallelism)

# ---- DuckDB snippet builders mirroring operators/dedup.py ----

_SQL_TOKS = "list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x != '')"
_SQL_CHAR_HASH_W = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(string_split(w, ''), c -> CAST(ascii(c) AS BIGINT))), "
    f"(acc, x) -> (acc * 31 + x) % {HASH_MOD})"
)
#: token-hash array (computed once per document in a CTE — mirrors the
#: materialized ``th`` column of operators/dedup.py::gram_hash_df)
SQL_TOKEN_HASHES = f"list_transform({_SQL_TOKS}, w -> {_SQL_CHAR_HASH_W})"


def _sql_gram_fold(n: int = NGRAM_N, distinct: bool = True) -> str:
    """Shingle hash = 31-polynomial fold of ``n`` consecutive token hashes
    (identical to operators/dedup.py::_gram_fold); expects a CTE column
    ``th`` holding the token-hash array."""
    g = "th[i]"
    for j in range(1, n):
        g = f"(({g}) * 31 + th[i + {j}]) % {HASH_MOD}"
    body = f"list_transform(range(1, len(th) - {n - 2}), i -> {g})"
    if distinct:
        body = f"list_distinct({body})"
    return (
        f"CASE WHEN len(th) >= {n} THEN "
        f"{body} "
        f"ELSE [] END"
    )


def _sql_minhash_el(i: int) -> str:
    a, b = DD.MINHASH_COEFFS[i]
    return (
        f"coalesce(list_min(list_transform(grams, h -> (h * {a} + {b}) % {HASH_MOD})), "
        f"{HASH_MOD})"
    )


def _sql_band_keys(n_bands: int = DD.DEFAULT_BANDS) -> list[str]:
    k = len(DD.MINHASH_COEFFS)
    r = k // n_bands
    keys = []
    for band in range(n_bands):
        parts = ", ".join(
            f"CAST({_sql_minhash_el(band * r + j)} AS VARCHAR)" for j in range(r)
        )
        keys.append(f"array_to_string([{parts}], '-')")
    return keys


def _sql_grams_cte(extra: str = "") -> str:
    """Shared CTE prefix: token hashes once per doc, then the gram fold."""
    return f"""tok AS (
    SELECT doc_id{extra}, {SQL_TOKEN_HASHES} AS th FROM documents
), base AS (
    SELECT * EXCLUDE (th), {_sql_gram_fold()} AS grams FROM tok
)"""


_SQL_JACCARD = (
    "round(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) / "
    "(len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))), 6)"
)
_SQL_BUCKET = f"CAST(floor(doc_len / {LEN_BAND}.0) AS BIGINT)"


def dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via content-hash groupBy: one representative (min id)
    per digest + copy count.  One shuffle on the digest; at 100 TB the
    map-side partial agg means only distinct digests move."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5(F.col("text")).alias("digest"))
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


DEDUP_EXACT_ORACLE = """
SELECT md5(text) AS digest,
       min(doc_id) AS keep_doc_id,
       count(*) AS n_copies
FROM documents
GROUP BY 1
"""


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs (prefix-filtered, lossless)."""
    d = _docs(spark, sf_dir)
    return DD.ngram_jaccard_pairs(
        d, "doc_id", "text", n=NGRAM_N, threshold=JACCARD_THRESHOLD
    )


DEDUP_NGRAM_JACCARD_ORACLE = f"""
WITH {_sql_grams_cte()}, nonempty AS (
    SELECT doc_id, list_sort(grams) AS grams FROM base WHERE len(grams) > 0
), pref AS (
    SELECT doc_id, u.g
    FROM nonempty,
         UNNEST(grams[1 : CAST(floor((1 - {JACCARD_THRESHOLD}) * len(grams)) AS INT) + 1])
             AS u(g)
), cand AS (
    SELECT DISTINCT l.doc_id AS doc_id_a, r.doc_id AS doc_id_b
    FROM pref l JOIN pref r ON l.g = r.g AND l.doc_id < r.doc_id
)
SELECT doc_id_a, doc_id_b, {_SQL_JACCARD} AS jaccard
FROM cand
JOIN nonempty a ON a.doc_id = cand.doc_id_a
JOIN nonempty b ON b.doc_id = cand.doc_id_b
WHERE {_SQL_JACCARD} >= {JACCARD_THRESHOLD}
"""


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs (16 hashes, 4 bands × 4 rows), verified
    with true Jaccard — the linear-ish scale path for corpus dedup."""
    d = _docs(spark, sf_dir)
    return DD.minhash_lsh_pairs(
        d, "doc_id", "text", n=NGRAM_N, threshold=JACCARD_THRESHOLD
    )


def _minhash_parts() -> tuple[str, str]:
    """(CTE list, final SELECT) of the MinHash-LSH oracle — split so other
    oracles (connected components) can embed the pair query as a CTE."""
    band_selects = "\nUNION ALL\n".join(
        f"SELECT doc_id, {b} AS band_id, {key} AS band_key FROM sigs"
        for b, key in enumerate(_sql_band_keys())
    )
    ctes = f"""{_sql_grams_cte()}, sigs AS (
    SELECT * FROM base WHERE len(grams) > 0
), banded AS (
{band_selects}
), cand AS (
    SELECT DISTINCT l.doc_id AS doc_id_a, r.doc_id AS doc_id_b
    FROM banded l JOIN banded r
      ON l.band_id = r.band_id AND l.band_key = r.band_key
     AND l.doc_id < r.doc_id
)"""
    select = f"""SELECT doc_id_a, doc_id_b, {_SQL_JACCARD} AS jaccard
FROM cand
JOIN sigs a ON a.doc_id = cand.doc_id_a
JOIN sigs b ON b.doc_id = cand.doc_id_b
WHERE {_SQL_JACCARD} >= {JACCARD_THRESHOLD}"""
    return ctes, select


def _minhash_oracle() -> str:
    ctes, select = _minhash_parts()
    return f"\nWITH {ctes}\n{select}\n"


def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document SimHash signature (20-bit, over 3-gram shingles)."""
    d = _docs(spark, sf_dir)
    return DD.simhash_df(d, "doc_id", "text", NGRAM_N, SIMHASH_BITS).select(
        "doc_id", F.col("sh").alias("simhash")
    )


def _sql_simhash(bits: int = SIMHASH_BITS) -> str:
    terms = []
    for j in range(bits):
        ones = f"list_sum(list_transform(grams, h -> (h >> {j}) & 1))"
        terms.append(
            f"(CAST(CASE WHEN {ones} * 2 > len(grams) THEN 1 ELSE 0 END AS BIGINT) << {j})"
        )
    return " + ".join(terms)


SIMHASH_SIGNATURES_ORACLE = f"""
WITH {_sql_grams_cte()}
SELECT doc_id,
       CASE WHEN len(grams) = 0 THEN 0 ELSE {_sql_simhash()} END AS simhash
FROM base
"""


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: hamming ≤ 4 and length delta ≤ 60.  The
    Spark side blocks with pigeonhole bit-banding; the oracle below is
    deliberately blocking-free (all-pairs), so the cross-engine gate
    verifies the blocking is lossless instead of enshrining it."""
    d = _docs(spark, sf_dir)
    return DD.simhash_pairs(
        d, "doc_id", "text", "n_chars",
        n=NGRAM_N, bits=SIMHASH_BITS,
        max_hamming=SIMHASH_MAX_HAMMING, len_band=LEN_BAND,
    )


DEDUP_SIMHASH_ORACLE = f"""
WITH {_sql_grams_cte(", n_chars AS doc_len")}, sh AS (
    SELECT doc_id, doc_len,
           CASE WHEN len(grams) = 0 THEN 0 ELSE {_sql_simhash()} END AS sh
    FROM base
)
SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
       CAST(bit_count(xor(a.sh, b.sh)) AS INT) AS hamming
FROM sh a
JOIN sh b ON a.doc_id < b.doc_id
WHERE abs(a.doc_len - b.doc_len) <= {LEN_BAND}
  AND bit_count(xor(a.sh, b.sh)) <= {SIMHASH_MAX_HAMMING}
"""


def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster assignment: connected components over the
    MinHash-LSH pair graph (min-label propagation, 4 rounds) — every doc
    in a duplicate cluster maps to the cluster's minimum doc_id."""
    d = _docs(spark, sf_dir)
    pairs = DD.minhash_lsh_pairs(
        d, "doc_id", "text", n=NGRAM_N, threshold=JACCARD_THRESHOLD
    )
    return DD.connected_components(pairs)


def _components_parts() -> tuple[str, str]:
    """(CTE list incl. RECURSIVE reach, final SELECT) of the
    connected-components oracle — split so the survivors oracle can embed
    the assignment as a CTE."""
    ctes, select = _minhash_parts()
    full_ctes = f"""{ctes},
pairs AS ({select}),
und AS (
    SELECT doc_id_a AS a, doc_id_b AS b FROM pairs
    UNION
    SELECT doc_id_b, doc_id_a FROM pairs
),
reach(a, b) AS (
    SELECT a, b FROM und
    UNION
    SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a
),
verts AS (SELECT DISTINCT a AS v FROM und)"""
    final = """SELECT verts.v AS doc_id,
       least(verts.v, coalesce(min(reach.b), verts.v)) AS component_id
FROM verts LEFT JOIN reach ON reach.a = verts.v
GROUP BY verts.v"""
    return full_ctes, final


def _components_oracle() -> str:
    ctes, select = _components_parts()
    return f"\nWITH RECURSIVE {ctes}\n{select}\n"


def dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup endgame: the curated corpus after near-dup clustering —
    every document that is either untouched by the pair graph or its
    cluster's minimum-id representative.  One anti-ish left join against
    the (tiny relative to the corpus) component assignment."""
    d = _docs(spark, sf_dir)
    pairs = DD.minhash_lsh_pairs(
        d, "doc_id", "text", n=NGRAM_N, threshold=JACCARD_THRESHOLD
    )
    comp = DD.connected_components(pairs)
    return (
        d.join(comp, "doc_id", "left")
        .filter(
            F.col("component_id").isNull()
            | (F.col("component_id") == F.col("doc_id"))
        )
        .select("doc_id", "n_chars")
    )


def _survivors_oracle() -> str:
    ctes, select = _components_parts()
    return f"""
WITH RECURSIVE {ctes},
comp AS ({select})
SELECT d.doc_id, d.n_chars
FROM documents d
LEFT JOIN comp ON comp.doc_id = d.doc_id
WHERE comp.component_id IS NULL OR comp.component_id = d.doc_id
"""


FUZZY_BLOCK_LEN = 16
FUZZY_MAX_DIST_PCT = 20
FUZZY_MIN_LEN = 32


def dedup_fuzzy_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking-key entity resolution over documents: exact-prefix block,
    Levenshtein comparator, relative threshold in integer math
    (operators/dedup.py::fuzzy_blocked_pairs)."""
    return DD.fuzzy_blocked_pairs(
        _docs(spark, sf_dir),
        "doc_id",
        "text",
        block_len=FUZZY_BLOCK_LEN,
        max_dist_pct=FUZZY_MAX_DIST_PCT,
        min_len=FUZZY_MIN_LEN,
    )


DEDUP_FUZZY_BLOCKED_ORACLE = f"""
WITH k AS (
    SELECT doc_id, text, substr(text, 1, {FUZZY_BLOCK_LEN}) AS bk,
           length(text) AS tlen
    FROM documents WHERE length(text) >= {FUZZY_MIN_LEN}
),
cand AS (
    SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
           levenshtein(a.text, b.text) AS edit_dist,
           greatest(a.tlen, b.tlen) AS maxlen
    FROM k a JOIN k b
      ON a.bk = b.bk AND a.doc_id < b.doc_id
    WHERE abs(a.tlen - b.tlen) * 100 <= {FUZZY_MAX_DIST_PCT} * greatest(a.tlen, b.tlen)
)
SELECT doc_id_a, doc_id_b, edit_dist,
       round(1.0 - CAST(edit_dist AS DOUBLE) / CAST(maxlen AS DOUBLE), 6) AS similarity
FROM cand
WHERE edit_dist * 100 <= {FUZZY_MAX_DIST_PCT} * maxlen
"""


INCR_BATCH_MOD = 10  # doc_id % 10 == 0 plays "today's ingest batch"


def dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup of a NEW ingest batch against corpus history —
    the shape production dedup actually runs (nobody re-deduplicates
    100 TB per day; you dedup the daily batch against a maintained
    fingerprint index).  Each batch document is classified:
    ``dup_of_history`` (digest already in the historical corpus),
    ``dup_in_batch`` (first seen in this batch under an earlier id), or
    ``new`` (keep).

    The corpus has NO exact duplicates (every text is unique), so the
    batch is a deterministic re-ingest simulation built inside the
    query: genuinely-new docs (``doc_id % 10 == 0``), replays of
    history docs under fresh ids (+1e6 — re-crawls/retries, the case
    the history index catches), and second submissions of batch docs
    (+2e6 — the within-batch case).  Both engines build the identical
    batch, so statuses hash-match.

    Scale: the history side reduces to DISTINCT digests before the join
    — at 100 TB that is the compact fingerprint index you'd maintain as
    a bucketed table on digest, making this a co-located equi-join (or
    bloom-pruned scan) rather than a corpus scan per batch; the batch
    side is one groupBy for first-in-batch plus one digest join.
    """
    d = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    is_batch = did % INCR_BATCH_MOD == 0
    fresh = d.filter(is_batch).select("doc_id", "text")
    replayed = (
        d.filter((did % INCR_BATCH_MOD == 1) & (did % 3 == 0))
        .select((did + 1_000_000).alias("doc_id"), "text")
    )
    resubmitted = (
        d.filter(is_batch & (did % 4 == 0))
        .select((did + 2_000_000).alias("doc_id"), "text")
    )
    batch = (
        fresh.unionByName(replayed)
        .unionByName(resubmitted)
        .select("doc_id", F.md5(F.col("text")).alias("digest"))
    )
    hist = (
        d.filter(~is_batch)
        .select(F.md5(F.col("text")).alias("digest"))
        .distinct()
        .withColumn("in_hist", F.lit(1))
    )
    first = batch.groupBy("digest").agg(F.min("doc_id").alias("first_id"))
    j = batch.join(first, "digest").join(hist, "digest", "left")
    status = (
        F.when(F.col("in_hist") == 1, F.lit("dup_of_history"))
        .when(F.col("doc_id") != F.col("first_id"), F.lit("dup_in_batch"))
        .otherwise(F.lit("new"))
    )
    return j.select(
        "doc_id",
        "digest",
        status.alias("status"),
        F.when(status == "new", 1).otherwise(0).cast("int").alias("keep"),
    )


DEDUP_INCREMENTAL_ORACLE = f"""
WITH batch AS (
    SELECT doc_id, md5(text) AS digest FROM documents
    WHERE doc_id % {INCR_BATCH_MOD} = 0
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id, md5(text) AS digest FROM documents
    WHERE doc_id % {INCR_BATCH_MOD} = 1 AND doc_id % 3 = 0
    UNION ALL
    SELECT doc_id + 2000000 AS doc_id, md5(text) AS digest FROM documents
    WHERE doc_id % {INCR_BATCH_MOD} = 0 AND doc_id % 4 = 0
),
hist AS (
    SELECT DISTINCT md5(text) AS digest FROM documents
    WHERE doc_id % {INCR_BATCH_MOD} != 0
),
first AS (SELECT digest, min(doc_id) AS first_id FROM batch GROUP BY 1)
SELECT b.doc_id, b.digest,
       CASE WHEN h.digest IS NOT NULL THEN 'dup_of_history'
            WHEN b.doc_id != f.first_id THEN 'dup_in_batch'
            ELSE 'new' END AS status,
       CAST(CASE WHEN h.digest IS NULL AND b.doc_id = f.first_id
                 THEN 1 ELSE 0 END AS INT) AS keep
FROM batch b
JOIN first f USING (digest)
LEFT JOIN hist h USING (digest)
"""


# ---- Normalized exact dedup (canonicalize, then hash-group) ----

# The corpus has no raw exact duplicates (see dedup_incremental_batch's
# docstring), so — same discipline as doc_pii_redaction's seeded PII —
# the query splices in deterministic case/punctuation variants of every
# 7th document.  Normalization MUST merge each variant with its source
# (n_copies = 2 groups), so the merge branch of the gate has teeth at
# every SF instead of comparing 100% singleton groups.
NORM_SEED_MOD = 7
NORM_SEED_OFFSET = 10_000_000


def dedup_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup MODULO text normalization (lowercase, punctuation →
    space, whitespace collapse, trim) — the canonicalize-then-dedup pass
    corpus pipelines run before byte-exact hashing, so trivially
    reformatted copies (case, punctuation, spacing) collapse into one
    group that raw ``md5(text)`` would keep apart.

    Scale: the normalization is a per-row JVM expression chain fused
    into the scan; the groupBy shuffles 16-byte digests with map-side
    partial aggregation — identical shape to ``dedup_exact_docs``.
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # Seed perturbation must be NORMALIZATION-INVARIANT for any input:
    # ASCII-only translate-uppercase (not upper(), whose Unicode case
    # folding is not an involution — 'ß' -> 'SS' -> 'ss' survives the
    # [^a-z0-9 ] strip while 'ß' itself is stripped, so an upper()-seeded
    # variant would fail to merge with its source on non-ASCII text).
    ascii_upper = F.translate(
        F.col("text"),
        "abcdefghijklmnopqrstuvwxyz",
        "ABCDEFGHIJKLMNOPQRSTUVWXYZ",
    )
    variants = d.filter(F.col("doc_id") % NORM_SEED_MOD == 0).select(
        (F.col("doc_id") + NORM_SEED_OFFSET).alias("doc_id"),
        F.concat(ascii_upper, F.lit("!!")).alias("text"),
    )
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )
    n = d.unionByName(variants).select("doc_id", norm.alias("norm_text"))
    return n.groupBy(F.md5("norm_text").alias("norm_digest")).agg(
        F.min("doc_id").alias("keep_doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
        F.max(F.length("norm_text")).cast("long").alias("n_norm_chars"),
    )


DEDUP_NORMALIZED_ORACLE = f"""
WITH spliced AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + {NORM_SEED_OFFSET},
           translate(text, 'abcdefghijklmnopqrstuvwxyz',
                     'ABCDEFGHIJKLMNOPQRSTUVWXYZ') || '!!'
    FROM documents WHERE doc_id % {NORM_SEED_MOD} = 0
), n AS (
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(lower(text),
               '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm_text
    FROM spliced
)
SELECT md5(norm_text) AS norm_digest,
       min(doc_id) AS keep_doc_id,
       count(*) AS n_copies,
       max(length(norm_text)) AS n_norm_chars
FROM n GROUP BY 1
"""


def doc_novelty_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram NOVELTY: the fraction of a document's distinct
    shingles whose corpus-wide first occurrence (minimum doc_id) is this
    document — the ingestion-order "how much does this doc add"
    signal curation pipelines use to down-rank recombinations of
    already-seen text that clear every pairwise dedup bar.

    Plan: shingle once (persisted), explode to a posting list, ONE
    groupBy(gram) for the min-owner, join back on gram, ONE
    groupBy(doc).  Both shuffles are on the gram hash — the same
    inverted-index shape as containment/prefix dedup; nothing is
    all-pairs.  Novelty is an unrounded exact division of identical
    integers (bit-identical cross-engine).
    """
    from data_pipelines_using_llm_spark.operators.caching import barrier

    d = _docs(spark, sf_dir)
    base = barrier(
        DD.gram_hash_df(d, "doc_id", "text", NGRAM_N).filter(
            F.size("grams") > 0
        )
    )
    posting = base.select("doc_id", F.explode("grams").alias("g"))
    owner = posting.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    return (
        posting.join(owner, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            ).alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_novel",
            (F.col("n_novel").cast("double") / F.col("n_grams")).alias(
                "novelty"
            ),
        )
    )


DOC_NOVELTY_ORACLE = f"""
WITH {_sql_grams_cte()}, ne AS (
    SELECT doc_id, grams FROM base WHERE len(grams) > 0
), posting AS (
    SELECT doc_id, u.g FROM ne, UNNEST(grams) AS u(g)
), owner AS (
    SELECT g, min(doc_id) AS first_doc FROM posting GROUP BY g
)
SELECT p.doc_id,
       count(*) AS n_grams,
       CAST(sum(CASE WHEN o.first_doc = p.doc_id THEN 1 ELSE 0 END)
           AS BIGINT) AS n_novel,
       CAST(sum(CASE WHEN o.first_doc = p.doc_id THEN 1 ELSE 0 END)
           AS DOUBLE) / count(*) AS novelty
FROM posting p JOIN owner o ON o.g = p.g
GROUP BY p.doc_id
"""


# Containment dedup: threshold, and the seeded prefix-slice variants that
# make the check non-vacuous at every SF (a 40%-prefix slice of a document
# is CONTAINED in it with near-1.0 containment but low Jaccard — exactly
# the subset-duplicate class the symmetric measures miss).
CONTAIN_THRESHOLD = 0.9
CONTAIN_SEED_MOD = 11
CONTAIN_SEED_OFFSET = 20_000_000
CONTAIN_SLICE_FRAC = 0.4


def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment (subset-duplicate) pairs over ``documents`` plus
    seeded 40%-prefix slices — ``|A∩B|/min(|A|,|B|)`` ≥ 0.9 via the
    prefix-vs-posting-list filter (operators/dedup.py::containment_pairs).
    """
    d = _docs(spark, sf_dir).select("doc_id", "text")
    variants = d.filter(F.col("doc_id") % CONTAIN_SEED_MOD == 0).select(
        (F.col("doc_id") + CONTAIN_SEED_OFFSET).alias("doc_id"),
        F.expr(
            f"substring(text, 1, CAST(ceil({CONTAIN_SLICE_FRAC} * length(text)) AS INT))"
        ).alias("text"),
    )
    return DD.containment_pairs(
        d.unionByName(variants),
        "doc_id",
        "text",
        n=NGRAM_N,
        threshold=CONTAIN_THRESHOLD,
    )


DEDUP_CONTAINMENT_ORACLE = f"""
WITH spliced AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + {CONTAIN_SEED_OFFSET},
           substr(text, 1, CAST(ceil({CONTAIN_SLICE_FRAC} * length(text)) AS INT))
    FROM documents WHERE doc_id % {CONTAIN_SEED_MOD} = 0
), tok AS (
    SELECT doc_id, {SQL_TOKEN_HASHES} AS th FROM spliced
), base AS (
    SELECT doc_id, {_sql_gram_fold()} AS grams FROM tok
), ne AS (
    SELECT doc_id, list_sort(grams) AS grams FROM base WHERE len(grams) > 0
), pref AS (
    SELECT doc_id, u.g
    FROM ne,
         UNNEST(grams[1 : CAST(floor((1 - {CONTAIN_THRESHOLD}) * len(grams)) AS INT) + 1])
             AS u(g)
), posting AS (
    SELECT doc_id, u.g FROM ne, UNNEST(grams) AS u(g)
), cand AS (
    SELECT DISTINCT least(p.doc_id, q.doc_id) AS doc_id_a,
                    greatest(p.doc_id, q.doc_id) AS doc_id_b
    FROM pref p JOIN posting q ON p.g = q.g AND p.doc_id != q.doc_id
)
SELECT doc_id_a, doc_id_b,
       CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
           / least(len(a.grams), len(b.grams)) AS containment,
       len(a.grams) AS n_grams_a,
       len(b.grams) AS n_grams_b
FROM cand
JOIN ne a ON a.doc_id = cand.doc_id_a
JOIN ne b ON b.doc_id = cand.doc_id_b
WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
          / least(len(a.grams), len(b.grams)) >= {CONTAIN_THRESHOLD}
"""


# Repeated-passage (exact substring) dedup: window width / stride / report
# size.  W=40 chars catches boilerplate sentences; stride W/2 guarantees
# any repeated run of >= 1.5*W chars contains at least one aligned window
# on both copies of the run's lattice (a stride-S window grid offset by
# any amount still overlaps a length-1.5W run in a full window).
PASSAGE_W = 40
PASSAGE_STRIDE = 20
PASSAGE_TOP = 100


def doc_repeated_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact repeated-passage detection — the substring complement of
    document-level dedup (Lee et al. 2022, "Deduplicating Training Data
    Makes Language Models Better", trains on ExactSubstr-deduped text):
    document-granular dedup misses boilerplate passages (license
    headers, templated paragraphs) embedded in otherwise-distinct
    documents, which LMs then memorize.

    Spark-first reduction of the suffix-array approach: slide
    ``PASSAGE_W``-char windows at ``PASSAGE_STRIDE`` over each document
    (``sequence`` + ``transform(substring)`` + ``explode`` — a JVM
    expression chain, no UDF), then ONE groupBy on the window text:
    passages occurring >= 2 times across the corpus, with distinct-doc
    and occurrence counts.  Top ``PASSAGE_TOP`` by occurrence
    (deterministic passage tie-break) via TakeOrderedAndProject.

    Scale: window volume is (doc_chars / stride) rows — ~2 small rows
    per 40 input bytes; the groupBy shuffles with map-side partial
    aggregation and most groups die there (count 1 dominates).  At
    100 TB, group on ``xxhash64(passage)`` carrying ``min(passage)`` as
    the exemplar so the shuffle moves 8-byte keys; the string key here
    keeps the oracle textual.
    """
    d = load_table(spark, sf_dir, "documents").filter(
        F.length("text") >= PASSAGE_W
    )
    win = d.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(1),
                    F.length("text") - PASSAGE_W + 1,
                    F.lit(PASSAGE_STRIDE),
                ),
                lambda s: F.substring(F.col("text"), s, PASSAGE_W),
            )
        ).alias("passage"),
    )
    return (
        win.groupBy("passage")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .filter(F.col("n_occurrences") >= 2)
        .orderBy(F.col("n_occurrences").desc(), "passage")
        .limit(PASSAGE_TOP)
    )


DOC_REPEATED_PASSAGES_ORACLE = f"""
WITH win AS (
    SELECT doc_id,
           unnest(generate_series(1, length(text) - {PASSAGE_W} + 1,
                                  {PASSAGE_STRIDE})) AS s
    FROM documents WHERE length(text) >= {PASSAGE_W}
)
SELECT substr(d.text, w.s, {PASSAGE_W}) AS passage,
       count(DISTINCT w.doc_id) AS n_docs,
       count(*) AS n_occurrences
FROM win w JOIN documents d USING (doc_id)
GROUP BY 1 HAVING count(*) >= 2
ORDER BY n_occurrences DESC, passage
LIMIT {PASSAGE_TOP}
"""


QUERIES = {
    "dedup_exact_docs": QuerySpec(dedup_exact_docs, DEDUP_EXACT_ORACLE, "exact hash-groupBy dedup"),
    "dedup_normalized": QuerySpec(
        dedup_normalized,
        DEDUP_NORMALIZED_ORACLE,
        "canonicalize-then-dedup (normalization-modulo exact dedup)",
    ),
    "dedup_incremental_batch": QuerySpec(
        dedup_incremental_batch,
        DEDUP_INCREMENTAL_ORACLE,
        "new-batch vs corpus-history incremental dedup classification",
    ),
    "dedup_fuzzy_blocked": QuerySpec(
        dedup_fuzzy_blocked,
        DEDUP_FUZZY_BLOCKED_ORACLE,
        "blocking-key Levenshtein entity resolution",
    ),
    "dedup_components": QuerySpec(dedup_components, _components_oracle(), "near-dup connected components"),
    "dedup_survivors": QuerySpec(dedup_survivors, _survivors_oracle(), "keep-one-per-cluster curated corpus"),
    "dedup_ngram_jaccard": QuerySpec(dedup_ngram_jaccard, DEDUP_NGRAM_JACCARD_ORACLE, "3-gram Jaccard near-dup"),
    "dedup_minhash_lsh": QuerySpec(dedup_minhash_lsh, _minhash_oracle(), "MinHash+LSH near-dup"),
    "simhash_signatures": QuerySpec(simhash_signatures, SIMHASH_SIGNATURES_ORACLE, "SimHash signatures"),
    "dedup_simhash": QuerySpec(dedup_simhash, DEDUP_SIMHASH_ORACLE, "SimHash near-dup pairs"),
    "doc_repeated_passages": QuerySpec(
        doc_repeated_passages,
        DOC_REPEATED_PASSAGES_ORACLE,
        "exact repeated-passage (substring) dedup via strided windows",
    ),
    "dedup_containment_pairs": QuerySpec(
        dedup_containment_pairs,
        DEDUP_CONTAINMENT_ORACLE,
        "subset-duplicate pairs by n-gram set containment (prefix filter)",
    ),
    "doc_novelty_scores": QuerySpec(
        doc_novelty_scores,
        DOC_NOVELTY_ORACLE,
        "per-doc shingle novelty vs corpus first occurrences",
    ),
}
