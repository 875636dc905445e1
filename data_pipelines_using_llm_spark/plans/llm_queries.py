"""LLM-transform query pack: the batched mapInPandas LLM operator over
``documents``, with the deterministic StubBackend so the full machinery
(micro-batching, rate limiting, retries, Arrow plumbing) stays inside the
DuckDB oracle gate.  The oracle mirrors StubBackend's extractive summary
token-for-token.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from data_pipelines_using_llm_spark.operators import llm as LLM
from data_pipelines_using_llm_spark.plans.text_queries import SQL_TOKENS
from data_pipelines_using_llm_spark.registry import QuerySpec
from data_pipelines_using_llm_spark.sources.tables import load_table


def llm_summarize_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched 'summarization' of every document (StubBackend: first
    SUMMARY_TOKENS tokens), 32-prompt micro-batches per partition."""
    d = load_table(spark, sf_dir, "documents")
    return LLM.llm_transform(d, "doc_id", "text", batch_size=32)


LLM_SUMMARIZE_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, {SQL_TOKENS.format(col='text')} AS t FROM documents
)
SELECT doc_id,
       array_to_string(t[1:{LLM.SUMMARY_TOKENS}], ' ') AS response,
       CAST(len(t) AS INT) AS n_prompt_tokens,
       CAST(least(len(t), {LLM.SUMMARY_TOKENS}) AS INT) AS n_response_tokens,
       1 AS n_api_calls
FROM toks
"""


def llm_summarize_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Request-deduplicated variant: one model call per DISTINCT text,
    responses joined back by prompt digest.  Identical oracle — the stub
    response is a pure function of the prompt, so caching must not change
    any value (which is exactly what makes the gate meaningful)."""
    d = load_table(spark, sf_dir, "documents")
    return LLM.llm_transform_cached(d, "doc_id", "text", batch_size=32)


QUERIES = {
    "llm_summarize_docs": QuerySpec(
        llm_summarize_docs, LLM_SUMMARIZE_ORACLE, "batched LLM transform (stub)"
    ),
    "llm_summarize_cached": QuerySpec(
        llm_summarize_cached,
        LLM_SUMMARIZE_ORACLE,
        "prompt-dedup cached LLM transform",
    ),
}
