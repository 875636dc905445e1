"""Text-analysis query pack over the ``documents`` table (task: the
training-data-pipeline text operators, each with a DuckDB oracle).

The oracle SQL mirrors operators/text.py expression-for-expression; shared
constants (stopword lists, hash modulus, token regex) are injected from the
same Python definitions so the two sides cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipelines_using_llm_spark.operators import text as TX
from data_pipelines_using_llm_spark.registry import QuerySpec
from data_pipelines_using_llm_spark.sources.tables import load_table

# ---- DuckDB SQL snippet builders (kept next to the Spark expressions they
# mirror; see operators/text.py) ----

SQL_TOKENS = (
    "list_filter(regexp_split_to_array(trim({col}), '\\s+'), x -> x != '')"
)
SQL_CHAR_HASH = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(string_split({s}, ''), c -> CAST(ascii(c) AS BIGINT))), "
    f"(acc, x) -> (acc * 31 + x) % {TX.HASH_MOD})"
)
SQL_BPE_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def sql_stop_hits(col: str, lang: str) -> str:
    stops = ", ".join(f"'{w}'" for w in TX.STOPWORDS[lang])
    toks = SQL_TOKENS.format(col=col)
    return f"len(list_filter({toks}, x -> list_contains([{stops}], x)))"


def sql_language_id(col: str) -> str:
    langs = list(TX.STOPWORDS.keys())
    hits = {lang: sql_stop_hits(col, lang) for lang in langs}
    expr = "'und'"
    for lang in reversed(langs):
        conds = [f"{hits[lang]} > 0"]
        for other in langs:
            if langs.index(other) < langs.index(lang):
                conds.append(f"{hits[lang]} > {hits[other]}")
            elif other != lang:
                conds.append(f"{hits[lang]} >= {hits[other]}")
        expr = f"CASE WHEN {' AND '.join(conds)} THEN '{lang}' ELSE {expr} END"
    return expr


def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish regex tokens + chars."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        TX.token_count("text").alias("n_tokens"),
        TX.regex_token_count("text").alias("n_bpe_tokens"),
    )


DOC_TOKEN_STATS_ORACLE = f"""
SELECT doc_id,
       length(text)                                  AS n_chars,
       CAST(len({SQL_TOKENS.format(col='text')}) AS INT)       AS n_tokens,
       CAST(len(regexp_extract_all(text, '{SQL_BPE_REGEX}')) AS INT) AS n_bpe_tokens
FROM documents
"""


def doc_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length/punct/stopword ratios + composite score."""
    d = load_table(spark, sf_dir, "documents")
    f = TX.quality_features("text")
    return d.select(
        "doc_id",
        f["n_tokens"].alias("n_tokens"),
        f["punct_ratio"].alias("punct_ratio"),
        f["stopword_ratio"].alias("stopword_ratio"),
        f["avg_token_len"].alias("avg_token_len"),
        TX.quality_score("text").alias("quality_score"),
    )


_SQL_NTOK = f"len({SQL_TOKENS.format(col='text')})"
_SQL_NPUNCT = r"len(regexp_extract_all(text, '[^A-Za-z0-9\s]'))"
DOC_QUALITY_ORACLE = f"""
WITH feats AS (
    SELECT doc_id,
           length(text) AS n_chars,
           {_SQL_NTOK} AS n_tokens,
           {_SQL_NPUNCT} AS n_punct,
           {sql_stop_hits('text', 'en')} AS n_stop
    FROM documents
)
SELECT doc_id,
       CAST(n_tokens AS INT) AS n_tokens,
       CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE) / n_chars ELSE 0.0 END
           AS punct_ratio,
       CASE WHEN n_tokens > 0 THEN CAST(n_stop AS DOUBLE) / n_tokens ELSE 0.0 END
           AS stopword_ratio,
       CASE WHEN n_tokens > 0 THEN CAST(n_chars AS DOUBLE) / n_tokens ELSE 0.0 END
           AS avg_token_len,
       0.4 * (CASE WHEN n_tokens BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.0 END)
       + 0.3 * (CASE WHEN n_tokens > 0
                      AND CAST(n_chars AS DOUBLE) / n_tokens BETWEEN 2.0 AND 12.0
                     THEN 1.0 ELSE 0.0 END)
       + 0.3 * (CASE WHEN n_chars = 0
                      OR CAST(n_punct AS DOUBLE) / n_chars <= 0.2
                     THEN 1.0 ELSE 0.0 END) AS quality_score
FROM feats
"""


def doc_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document heuristic language ID (stopword-hit argmax)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        TX.language_id("text").alias("detected_lang"),
    )


DOC_LANGUAGE_ID_ORACLE = f"""
SELECT doc_id, lang AS labeled_lang, {sql_language_id('text')} AS detected_lang
FROM documents
"""


def lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Labeled-vs-detected language confusion counts (aggregate shape)."""
    return (
        doc_language_id(spark, sf_dir)
        .groupBy("labeled_lang", "detected_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


LANG_CONFUSION_ORACLE = f"""
SELECT lang AS labeled_lang, {sql_language_id('text')} AS detected_lang,
       count(*) AS n_docs
FROM documents
GROUP BY 1, 2
"""


def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash fingerprint of normalized text (exact-dup key)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", TX.fingerprint("text").alias("fingerprint"))


_SQL_NORM = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
DOC_FINGERPRINTS_ORACLE = f"""
SELECT doc_id, {SQL_CHAR_HASH.format(s=_SQL_NORM)} AS fingerprint
FROM documents
"""


BIGRAM_TOP_K = 20


def doc_bigram_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level n-gram frequency table: the top-20 word bigrams by
    document frequency — the vocabulary/boilerplate census a corpus
    pipeline runs before dedup threshold tuning.

    Scale: one explode + one groupBy (map-side partial counts — only
    distinct bigrams shuffle); top-k via orderBy+limit compiles to
    TakeOrderedAndProject.  Ties break on the bigram string, so the
    LIMIT is deterministic across engines.  Per-document de-duplication
    (``array_distinct``) makes the count a document frequency, which is
    boilerplate-robust (a bigram repeated 1000x in one doc counts once).
    """
    d = load_table(spark, sf_dir, "documents")
    toks = TX.tokens("text")
    bigrams = F.array_distinct(
        F.when(
            F.size(toks) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at(toks, i), F.element_at(toks, i + 1)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
    )
    return (
        d.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .orderBy(F.col("doc_freq").desc(), F.col("bigram"))
        .limit(BIGRAM_TOP_K)
    )


def _bigram_oracle() -> str:
    toks = SQL_TOKENS.format(col="text")
    return f"""
WITH tok AS (SELECT doc_id, {toks} AS t FROM documents),
bg AS (
    SELECT doc_id,
           list_distinct(CASE WHEN len(t) >= 2
                THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1])
                ELSE [] END) AS bigrams
    FROM tok
)
SELECT u.bigram, count(*) AS doc_freq
FROM bg, UNNEST(bigrams) AS u(bigram)
GROUP BY u.bigram
ORDER BY doc_freq DESC, u.bigram
LIMIT {BIGRAM_TOP_K}
"""


PREP_MIN_QUALITY = 0.7
PREP_LANG = "en"


def training_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship training-data prep pipeline as ONE declarative plan:
    quality-score filter → heuristic language filter → exact dedup on the
    normalized-text fingerprint (deterministic keep-lowest-doc_id) →
    per-source corpus accounting (docs kept, total whitespace + BPE-ish
    tokens, mean quality).

    This is the composition every stage was built for; expressing it as
    one DataFrame lets Catalyst fuse all per-document expressions
    (quality features, language argmax, rolling-hash fingerprint) into a
    single scan stage — the only exchanges are the dedup window's hash
    partition by fingerprint and the final per-source aggregation.

    Scale: per-doc expressions are embarrassingly parallel; dedup
    shuffles (fingerprint, doc_id) pairs — at 100 TB that is the same
    bucketed shape as ``dedup_exact_docs``.  The mean quality is summed
    as DECIMAL (per-row scores are bit-identical doubles on both
    engines, so their decimal(5,2) images agree; the decimal sum is then
    order-independent — SURVEY.md §7.3.2).
    """
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        "source",
        "text",
        TX.quality_score("text").alias("q"),
        TX.language_id("text").alias("detected_lang"),
    ).filter(
        (F.col("q") >= PREP_MIN_QUALITY) & (F.col("detected_lang") == PREP_LANG)
    )
    deduped = (
        scored.withColumn("fp", TX.fingerprint("text"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("fp").orderBy(F.col("doc_id"))
            ),
        )
        .filter(F.col("rn") == 1)
    )
    return deduped.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(TX.token_count("text").cast("long")).alias("total_tokens"),
        F.sum(TX.regex_token_count("text").cast("long")).alias("total_bpe_tokens"),
        (
            F.sum(F.col("q").cast("decimal(5,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mean_quality"),
    )


def _prep_oracle() -> str:
    ntok = f"len({SQL_TOKENS.format(col='text')})"
    npunct = r"len(regexp_extract_all(text, '[^A-Za-z0-9\s]'))"
    quality = f"""
        0.4 * (CASE WHEN {ntok} BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.0 END)
      + 0.3 * (CASE WHEN {ntok} > 0
                     AND CAST(length(text) AS DOUBLE) / {ntok} BETWEEN 2.0 AND 12.0
                    THEN 1.0 ELSE 0.0 END)
      + 0.3 * (CASE WHEN length(text) = 0
                     OR CAST({npunct} AS DOUBLE) / length(text) <= 0.2
                    THEN 1.0 ELSE 0.0 END)"""
    return f"""
WITH scored AS (
    SELECT doc_id, source, text,
           ({quality}) AS q,
           {sql_language_id('text')} AS detected_lang
    FROM documents
),
kept AS (
    SELECT doc_id, source, text, q,
           {SQL_CHAR_HASH.format(s=_SQL_NORM)} AS fp
    FROM scored
    WHERE q >= {PREP_MIN_QUALITY} AND detected_lang = '{PREP_LANG}'
),
deduped AS (
    SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
    FROM kept
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(CAST(len({SQL_TOKENS.format(col='text')}) AS BIGINT)) AS BIGINT)
           AS total_tokens,
       CAST(sum(CAST(len(regexp_extract_all(text, '{SQL_BPE_REGEX}')) AS BIGINT)) AS BIGINT)
           AS total_bpe_tokens,
       CAST(sum(CAST(q AS DECIMAL(5,2))) AS DOUBLE) / count(*) AS mean_quality
FROM deduped
WHERE rn = 1
GROUP BY source
"""


SQL_LINES = (
    "list_filter(list_transform(string_split({col}, chr(10)), x -> trim(x)), "
    "x -> x != '')"
)


def sql_ngrams(col: str, n: int) -> str:
    """Token n-grams, mirroring operators/text.py::ngram_array."""
    toks = SQL_TOKENS.format(col=col)
    return (
        f"CASE WHEN len({toks}) >= {n} THEN "
        f"list_transform(range(1, len({toks}) - {n} + 2), "
        f"i -> array_to_string(list_slice({toks}, i, i + {n - 1}), ' ')) "
        f"ELSE [] END"
    )


def sql_dup_fraction(arr: str) -> str:
    """``1 - distinct/total`` over a list expression (0.0 when empty)."""
    return (
        f"CASE WHEN len({arr}) > 0 THEN "
        f"1.0 - CAST(len(list_distinct({arr})) AS DOUBLE) / len({arr}) "
        f"ELSE 0.0 END"
    )


def doc_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters: fraction of duplicate lines and
    duplicate 2-/3-grams per document, plus the boilerplate flag a
    training pipeline would filter on.  Pure column expressions — the
    100 TB cost is the scan itself."""
    d = load_table(spark, sf_dir, "documents")
    sig = TX.repetition_signals("text")
    return d.select(
        "doc_id",
        sig["n_lines"].alias("n_lines"),
        sig["dup_line_ratio"].alias("dup_line_ratio"),
        sig["dup_2gram_ratio"].alias("dup_2gram_ratio"),
        sig["dup_3gram_ratio"].alias("dup_3gram_ratio"),
        ((sig["dup_line_ratio"] > 0.3) | (sig["dup_3gram_ratio"] > 0.2))
        .cast("int")
        .alias("is_repetitive"),
    )


_REP_LINES = SQL_LINES.format(col="text")
DOC_REPETITION_ORACLE = f"""
SELECT doc_id,
       CAST(len({_REP_LINES}) AS INT) AS n_lines,
       {sql_dup_fraction(_REP_LINES)} AS dup_line_ratio,
       {sql_dup_fraction(sql_ngrams('text', 2))} AS dup_2gram_ratio,
       {sql_dup_fraction(sql_ngrams('text', 3))} AS dup_3gram_ratio,
       CAST(CASE WHEN {sql_dup_fraction(_REP_LINES)} > 0.3
                   OR {sql_dup_fraction(sql_ngrams('text', 3))} > 0.2
                 THEN 1 ELSE 0 END AS INT) AS is_repetitive
FROM documents
"""


QUERIES = {
    "training_corpus_prep": QuerySpec(
        training_corpus_prep,
        _prep_oracle(),
        "flagship prep pipeline: quality→lang→dedup→corpus accounting",
    ),
    "doc_bigram_freq": QuerySpec(
        doc_bigram_freq, _bigram_oracle(), "corpus bigram document-frequency census"
    ),
    "doc_token_stats": QuerySpec(doc_token_stats, DOC_TOKEN_STATS_ORACLE, "token counting"),
    "doc_quality_scores": QuerySpec(doc_quality_scores, DOC_QUALITY_ORACLE, "quality scoring"),
    "doc_language_id": QuerySpec(doc_language_id, DOC_LANGUAGE_ID_ORACLE, "language ID"),
    "lang_confusion": QuerySpec(lang_confusion, LANG_CONFUSION_ORACLE, "lang ID aggregate"),
    "doc_fingerprints": QuerySpec(doc_fingerprints, DOC_FINGERPRINTS_ORACLE, "rolling-hash fingerprint"),
    "doc_repetition_signals": QuerySpec(
        doc_repetition_signals,
        DOC_REPETITION_ORACLE,
        "Gopher-style repeated-line / repeated-n-gram boilerplate signals",
    ),
}
