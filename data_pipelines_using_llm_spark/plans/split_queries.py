"""Dataset-split query pack over ``documents`` (SURVEY.md §2 extension:
reproducible train/val/test machinery for training-data pipelines).

Both queries are pure row-local expressions plus one small aggregation —
the oracle SQL is generated from the same constants as the Spark
operators (operators/split.py), so bucket membership is bit-identical
across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipelines_using_llm_spark.operators.split import (
    DEFAULT_SALT,
    LEHMER_M,
    deterministic_sample,
    deterministic_split,
    mixture_sample,
    split_hash,
    sql_mixture_copies,
    temperature_mixture,
    sql_split_case,
    sql_split_hash,
    stratified_sample_exact,
)
from data_pipelines_using_llm_spark.registry import QuerySpec
from data_pipelines_using_llm_spark.sources.tables import load_table

HOLDOUT_FRACTION = 0.05


def doc_split_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, split) membership report for the default 80/10/10
    split: counts plus the within-source share — the balance check a
    training pipeline runs before shipping a split.  One narrow
    aggregation; the assignment itself never shuffles."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    assigned = deterministic_split(docs, "doc_id")
    per = assigned.groupBy("source", "split").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    # per-source totals via a window over the (tiny) aggregate, not a
    # second scan+join of the corpus — one pass over documents total
    w = Window.partitionBy("source")
    return per.select(
        "source",
        "split",
        "n_docs",
        F.round(F.col("n_docs") / F.sum("n_docs").over(w), 6).alias("share"),
    )


DOC_SPLIT_REPORT_ORACLE = f"""
WITH assigned AS (
    SELECT source, {sql_split_case('doc_id')} AS split
    FROM documents
),
per AS (
    SELECT source, split, count(*) AS n_docs
    FROM assigned GROUP BY source, split
)
SELECT source, split, n_docs,
       round(CAST(n_docs AS DOUBLE)
             / CAST(sum(n_docs) OVER (PARTITION BY source) AS BIGINT), 6) AS share
FROM per
"""


def doc_holdout_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic 5% holdout set as rows — membership is a
    pure function of doc_id, so the same documents come back on every
    rerun, any partitioning, any engine (vs ``df.sample``, which does not
    survive a repartition)."""
    docs = load_table(spark, sf_dir, "documents")
    return deterministic_sample(docs, "doc_id", HOLDOUT_FRACTION).select(
        "doc_id", "source", "lang", "n_chars"
    )


DOC_HOLDOUT_SAMPLE_ORACLE = f"""
SELECT doc_id, source, lang, n_chars
FROM documents
WHERE {sql_split_hash('doc_id')} < {int(HOLDOUT_FRACTION * LEHMER_M)}
"""


STRATUM_K = 10


def doc_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly 10 documents per source, picked by hash rank — the
    balanced eval-subset quota the threshold sample can't guarantee."""
    docs = load_table(spark, sf_dir, "documents")
    return stratified_sample_exact(docs, "source", "doc_id", STRATUM_K).select(
        "doc_id", "source", "lang", "n_chars"
    )


DOC_STRATIFIED_SAMPLE_ORACLE = f"""
SELECT doc_id, source, lang, n_chars FROM (
    SELECT doc_id, source, lang, n_chars,
           row_number() OVER (
               PARTITION BY source
               ORDER BY {sql_split_hash('doc_id')}, doc_id
           ) AS rk
    FROM documents
) WHERE rk <= {STRATUM_K}
"""


# Pretraining-recipe rates: upsample the three "curated" sources to 2.5
# epochs, keep the mid sources at 1 epoch, downsample the tail to 20%.
MIXTURE_RATES: dict[str, float] = {
    **{f"src{i}": 2.5 for i in range(3)},
    **{f"src{i}": 0.2 for i in range(10, 20)},
}
MIXTURE_DEFAULT = 1.0


def doc_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain up-/down-weighting for a training mixture: per-source
    replication rates (2.5 epochs for curated sources, 0.2 for the tail),
    copy membership a pure hash function so the recipe is rerun-stable."""
    docs = load_table(spark, sf_dir, "documents")
    return mixture_sample(
        docs, "source", "doc_id", MIXTURE_RATES, MIXTURE_DEFAULT
    ).select("doc_id", "source", "epoch")


DOC_MIXTURE_SAMPLE_ORACLE = f"""
SELECT doc_id, source, CAST(epoch AS INT) AS epoch FROM (
    SELECT doc_id, source, unnest(range(1, copies + 1)) AS epoch
    FROM (
        SELECT doc_id, source,
               {sql_mixture_copies('source', 'doc_id', MIXTURE_RATES, MIXTURE_DEFAULT)}
                   AS copies
        FROM documents
    )
)
"""


MIXTURE_ALPHA = 0.7


def doc_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled (alpha=0.7) LANGUAGE rebalancing with rates
    derived from the per-language census in-plan — see
    operators/split.py::temperature_mixture.  Strata are ``lang``, not
    ``source``: the generated sources are uniform (rate would be exactly
    1.0 everywhere — a vacuous gate), while languages are skewed (en is
    ~40% of docs), so English downsamples below rate 1 and the tail
    languages replicate above it — both the fractional-membership hash
    and the multi-epoch explode actually fire."""
    docs = load_table(spark, sf_dir, "documents")
    return temperature_mixture(docs, "lang", "doc_id", MIXTURE_ALPHA).select(
        "doc_id", "lang", "epoch", F.round("rate", 6).alias("rate")
    )


DOC_TEMPERATURE_MIXTURE_ORACLE = f"""
WITH counts AS (SELECT lang, count(*) AS n_s FROM documents GROUP BY 1),
tot AS (SELECT sum(n_s) AS n_tot FROM counts),
w AS (
    SELECT lang, n_s, n_tot,
           pow(CAST(n_s AS DOUBLE) / n_tot, {MIXTURE_ALPHA}) AS w_s
    FROM counts, tot
),
z AS (
    SELECT list_reduce(list_prepend(0.0, array_agg(w_s ORDER BY lang)),
                       (acc, x) -> acc + x) AS z
    FROM w
),
r AS (SELECT lang, w_s * n_tot / (z * n_s) AS rate FROM w, z),
c AS (
    SELECT d.doc_id, d.lang, r.rate,
           CAST(floor(r.rate) AS BIGINT)
           + CASE WHEN {sql_split_hash('d.doc_id')}
                       < CAST(floor((r.rate - floor(r.rate))
                                    * {LEHMER_M}) AS BIGINT)
                  THEN 1 ELSE 0 END AS copies
    FROM documents d JOIN r USING (lang)
)
SELECT doc_id, lang, CAST(epoch AS INT) AS epoch, round(rate, 6) AS rate
FROM (
    SELECT doc_id, lang, rate, unnest(range(1, copies + 1)) AS epoch
    FROM c WHERE copies >= 1
)
"""


CTX_LEN = 512


def doc_context_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concatenate-and-chunk context packing: documents laid end-to-end
    per source shard and cut into 512-token windows — each doc's window
    id, intra-window offset, and boundary-straddle flag.  One sort per
    shard; see operators/packing.py for the 100 TB sharding argument."""
    from data_pipelines_using_llm_spark.operators import text as TX
    from data_pipelines_using_llm_spark.operators.packing import pack_contexts

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        TX.token_count("text").cast("long").alias("n_tokens"),
    )
    return pack_contexts(docs, "doc_id", "n_tokens", CTX_LEN, shard_col="source")


def _packing_oracle() -> str:
    from data_pipelines_using_llm_spark.operators.packing import sql_pack_contexts
    from data_pipelines_using_llm_spark.plans.text_queries import SQL_TOKENS

    return f"""
WITH toks AS (
    SELECT doc_id, source,
           CAST(len({SQL_TOKENS.format(col='text')}) AS BIGINT) AS n_tokens
    FROM documents
)
SELECT doc_id, source, n_tokens,
       {sql_pack_contexts('doc_id', 'n_tokens', CTX_LEN, 'source')}
FROM toks
"""


N_SHARDS = 8


def doc_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle + sharding — the last layout step of
    a training-data pipeline: documents are ordered by a pure Lehmer-hash
    permutation of their id (engine- and rerun-stable where
    ``df.orderBy(rand())`` is not) and cut into ``N_SHARDS`` contiguous
    near-equal shards; the output carries each doc's global shuffle
    position and shard id, which is exactly the information a sharded
    token-writer consumes.

    Scale: the global position comes from ``operators.ranking``'s
    range-partitioned exact rank — no single-task global sort — and the
    shard id is ntile over that rank, derived as a pure integer
    expression.  The oracle is the plain window form.
    """
    from data_pipelines_using_llm_spark.operators.ranking import (
        ntile_from_rank,
        with_exact_rank,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    ranked = with_exact_rank(
        docs,
        [split_hash("doc_id").asc(), F.col("doc_id").asc()],
        rank_col="pos",
        group_n_col="_n",
    )
    return ranked.select(
        "doc_id",
        "source",
        F.col("pos").cast("long").alias("pos"),
        ntile_from_rank(F.col("pos"), F.col("_n"), N_SHARDS).alias("shard"),
    )


DOC_SHUFFLE_SHARDS_ORACLE = f"""
SELECT doc_id, source,
       CAST(row_number() OVER w AS BIGINT) AS pos,
       CAST(ntile({N_SHARDS}) OVER w AS INT) AS shard
FROM documents
WINDOW w AS (ORDER BY {sql_split_hash('doc_id')}, doc_id)
"""


TOKEN_BUDGET = 800  # per-source token quota (production sets real budgets)


def doc_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-budget fill: walk each source's documents in
    deterministic hash order and keep them while the INCLUSIVE running
    token sum stays within the budget — how a mixture pipeline fills
    per-domain token quotas reproducibly (a fractional-epoch rate can't
    hit an exact token budget; this does, to the granularity of one
    document).

    Scale: the running sum comes from ``operators.ranking``'s
    distributed prefix sum (range repartition + per-partition local
    cumsum + broadcast offsets) — sources are low-cardinality, so a
    ``Window.partitionBy(source)`` cumsum would be the usual skew wall.
    The oracle is the plain window form.
    """
    from data_pipelines_using_llm_spark.operators import text as TX
    from data_pipelines_using_llm_spark.operators.ranking import (
        with_exact_running_sum,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        TX.token_count("text").cast("long").alias("n_tokens"),
    )
    summed = with_exact_running_sum(
        docs,
        "n_tokens",
        [split_hash("doc_id").asc(), F.col("doc_id").asc()],
        group_by=["source"],
        sum_col="cum_tokens",
    )
    return summed.filter(F.col("cum_tokens") <= TOKEN_BUDGET).select(
        "doc_id", "source", "n_tokens", "cum_tokens"
    )


def _token_budget_oracle() -> str:
    from data_pipelines_using_llm_spark.plans.text_queries import SQL_TOKENS

    toks = SQL_TOKENS.format(col="text")
    return f"""
WITH t AS (
    SELECT doc_id, source, CAST(len({toks}) AS BIGINT) AS n_tokens,
           {sql_split_hash('doc_id')} AS h
    FROM documents
),
c AS (
    SELECT doc_id, source, n_tokens,
           CAST(sum(n_tokens) OVER (
               PARTITION BY source ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cum_tokens
    FROM t
)
SELECT doc_id, source, n_tokens, cum_tokens
FROM c WHERE cum_tokens <= {TOKEN_BUDGET}
"""


DOMAIN_QUOTA = 15


def doc_domain_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document cap — keep at most ``DOMAIN_QUOTA`` docs per
    source, best-first (longest text wins, doc_id tiebreak): the
    domain-balancing pass web-corpus curation runs so that no single
    crawl domain dominates the training mixture.

    Scale: ``row_number() <= k`` after a partitioned window compiles to
    Spark's ``WindowGroupLimit`` — each map task keeps only its local
    top-k per source BEFORE the shuffle, so the exchange carries
    O(sources x k) rows per task, not the corpus (plan-gated in
    tests/test_plans.py).  No global sort anywhere.
    """
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    return docs.select(
        "*", F.row_number().over(w).alias("quota_rank")
    ).filter(F.col("quota_rank") <= DOMAIN_QUOTA)


DOC_DOMAIN_QUOTA_ORACLE = f"""
WITH r AS (
    SELECT doc_id, source, n_chars,
           row_number() OVER (
               PARTITION BY source ORDER BY n_chars DESC, doc_id
           ) AS quota_rank
    FROM documents
)
SELECT doc_id, source, n_chars, quota_rank
FROM r WHERE quota_rank <= {DOMAIN_QUOTA}
"""


QUERIES = {
    "doc_split_report": QuerySpec(
        doc_split_report,
        DOC_SPLIT_REPORT_ORACLE,
        "deterministic 80/10/10 train/val/test split balance report",
    ),
    "doc_stratified_sample": QuerySpec(
        doc_stratified_sample,
        DOC_STRATIFIED_SAMPLE_ORACLE,
        "hash-rank exact k-per-stratum sample",
    ),
    "doc_holdout_sample": QuerySpec(
        doc_holdout_sample,
        DOC_HOLDOUT_SAMPLE_ORACLE,
        "content-addressed 5% holdout sample",
    ),
    "doc_mixture_sample": QuerySpec(
        doc_mixture_sample,
        DOC_MIXTURE_SAMPLE_ORACLE,
        "training-mixture per-source epoch resampling",
    ),
    "doc_temperature_mixture": QuerySpec(
        doc_temperature_mixture,
        DOC_TEMPERATURE_MIXTURE_ORACLE,
        "alpha=0.7 temperature rebalancing, rates derived in-plan",
    ),
    "doc_context_packing": QuerySpec(
        doc_context_packing,
        _packing_oracle(),
        "concatenate-and-chunk context-window packing (512 tokens/shard)",
    ),
    "doc_shuffle_shards": QuerySpec(
        doc_shuffle_shards,
        DOC_SHUFFLE_SHARDS_ORACLE,
        "deterministic global shuffle + contiguous shard assignment",
    ),
    "doc_token_budget": QuerySpec(
        doc_token_budget,
        _token_budget_oracle(),
        "per-source token-quota fill via distributed prefix sum",
    ),
    "doc_domain_quota": QuerySpec(
        doc_domain_quota,
        DOC_DOMAIN_QUOTA_ORACLE,
        "per-domain doc cap, best-first (WindowGroupLimit top-k per source)",
    ),
}

# keep the import surface documented for the curious reader
__all__ = [
    "QUERIES",
    "doc_split_report",
    "doc_holdout_sample",
    "DEFAULT_SALT",
]
