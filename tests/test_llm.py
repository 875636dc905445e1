"""LLM-transform machinery: retries, rate limiting, batching, backend gate.
(Stub-output correctness vs DuckDB is covered by test_oracle.py.)"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipelines_using_llm_spark.operators import llm as LLM
from data_pipelines_using_llm_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_backend_gate_raises():
    with pytest.raises(NotImplementedError, match="credentials"):
        LLM.require_llm_backend()


def test_retry_recovers_and_counts_attempts():
    backend = LLM.FlakyBackend(fail_times=2)
    responses, attempts = LLM.call_with_retry(
        backend, ["a b c"], sleep=lambda s: None
    )
    assert responses == ["a b c"]
    assert attempts == 3


def test_retry_exhaustion_raises():
    backend = LLM.FlakyBackend(fail_times=10)
    with pytest.raises(TimeoutError):
        LLM.call_with_retry(backend, ["x"], max_retries=2, sleep=lambda s: None)


def test_rate_limiter_spaces_calls_with_fake_clock():
    now = [0.0]
    slept: list[float] = []

    def clock():
        return now[0]

    def sleep(s):
        slept.append(s)
        now[0] += s

    rl = LLM.RateLimiter(rate=2.0, clock=clock, sleep=sleep)
    for _ in range(3):
        rl.acquire()
    # calls at t=0, 0.5, 1.0 -> two sleeps of 0.5s
    assert slept == [0.5, 0.5]


def test_transform_retries_surface_in_api_calls(spark):
    d = load_table(spark, SF_DIR, "documents").limit(10)
    out = LLM.llm_transform(
        d,
        "doc_id",
        "text",
        backend_factory=lambda: LLM.FlakyBackend(fail_times=1),
        batch_size=100,
    )
    rows = out.collect()
    assert len(rows) == 10
    # first micro-batch of the partition needed 2 attempts
    assert all(r["n_api_calls"] == 2 for r in rows)


def test_transform_micro_batching(spark):
    d = load_table(spark, SF_DIR, "documents").limit(10).coalesce(1)
    out = LLM.llm_transform(d, "doc_id", "text", batch_size=3)
    assert out.count() == 10
    assert out.filter(F.col("n_response_tokens") > LLM.SUMMARY_TOKENS).count() == 0


def test_cached_transform_one_call_per_distinct_prompt(spark):
    """Each of 3 distinct prompts is duplicated 4x; with batch_size=1 the
    uncached path would mint 12 nonces, the cached path must mint exactly
    one nonce per distinct prompt."""
    rows = [(i, f"prompt number {i % 3} words here") for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = LLM.llm_transform_cached(
        df, "doc_id", "text", backend_factory=LLM.NonceBackend, batch_size=1
    ).collect()
    assert len(out) == 12
    by_prompt: dict[int, set[str]] = {}
    for r in out:
        by_prompt.setdefault(r["doc_id"] % 3, set()).add(r["response"])
    assert all(len(v) == 1 for v in by_prompt.values())
    assert len({next(iter(v)) for v in by_prompt.values()}) == 3


def test_cached_transform_with_duplicate_ids(spark):
    """A non-unique id_col must not multiply rows or cross-wire responses:
    the response joins back on the prompt digest, not a representative id
    (ADVICE r1: min(doc_id) representatives collided when ids repeat)."""
    rows = [
        (1, "alpha bravo charlie delta"),
        (1, "echo foxtrot golf hotel"),  # same id, DIFFERENT prompt
        (2, "alpha bravo charlie delta"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = LLM.llm_transform_cached(df, "doc_id", "text").collect()
    assert len(out) == 3  # no row multiplication
    got = {(r["doc_id"], r["response"]) for r in out}
    assert got == {
        (1, "alpha bravo charlie delta"),
        (1, "echo foxtrot golf hotel"),
        (2, "alpha bravo charlie delta"),
    }


def test_cached_transform_matches_uncached_values(spark):
    d = load_table(spark, SF_DIR, "documents").limit(50)
    a = {
        r["doc_id"]: (r["response"], r["n_prompt_tokens"], r["n_response_tokens"])
        for r in LLM.llm_transform(d, "doc_id", "text").collect()
    }
    b = {
        r["doc_id"]: (r["response"], r["n_prompt_tokens"], r["n_response_tokens"])
        for r in LLM.llm_transform_cached(d, "doc_id", "text").collect()
    }
    assert a == b
